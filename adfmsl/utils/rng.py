"""Seed / PRNG-key discipline.

The reference seeds torch/cuda/numpy/random with seed 1234 and toggles cuDNN
determinism (``maze2.py:308-317``, ``main_fmsl_standardized.py:34-45``). JAX PRNG is
counter-based and explicit, so reproducibility is structural: one root key per run,
folded deterministically per (purpose, step).
"""
from __future__ import annotations

import random

import jax
import numpy as np

# Stable, documented purpose tags so fold_in streams never collide.
_PURPOSES = {
    "init": 0,
    "dropout": 1,
    "specaugment": 2,
    "lsa": 3,
    "shuffle": 4,
    "episode": 5,
    "augment": 6,
}


def set_global_seed(seed: int) -> jax.Array:
    """Seed host-side RNGs (numpy/random, used only for data shuffling fallback)
    and return the root JAX key for the run."""
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)


def key_for_step(root: jax.Array, purpose: str, step: int) -> jax.Array:
    """Derive a per-purpose, per-step key. Deterministic in (seed, purpose, step)."""
    k = jax.random.fold_in(root, _PURPOSES[purpose])
    return jax.random.fold_in(k, step)
