"""Jitted train/eval steps.

TPU-native replacements for the per-file torch loops (maze2.py:345-374 and variants):
- one traced, compiled ``train_step`` — forward, loss (model-internal for FMSL modes
  B/C, LossConfig-dispatched otherwise), backward, clip (in the optax chain), update;
- the reference's NaN failure-tolerance ported as branchless device code: non-finite
  gradient leaves are zeroed (maze2_fmsl_standardized.py:528-532) and a non-finite
  loss skips the whole update (``:519-521``) via lax.select on the state tree;
- written against the GLOBAL batch: under a Mesh with NamedSharding'd inputs and
  replicated params, XLA inserts the gradient/metric collectives (psum over ICI)
  automatically — the pjit idiom replacing torch's single-device autograd
  (SURVEY.md 2.10).

Donated state => in-place buffer reuse on device.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from adfmsl.config.base import ExperimentConfig
from adfmsl.heads.losses import compute_loss, masked_mean
from adfmsl.train.state import TrainState


def _zero_nonfinite(tree):
    return jax.tree_util.tree_map(
        lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), tree)


def fast_bits_key(key):
    """Re-wrap a threefry key as an 'rbg' key (same 128-bit key material).

    Dropout draws one random word per activation element; with the default
    threefry generator that ALU work dominated the maze5 train step (measured
    14.2 ms of 53 ms at b16 — round-4 profile). 'rbg' lowers to the TPU's
    hardware RngBitGenerator: step 52.6 -> 42.2 ms. Splits/fold_ins on rbg
    keys still derive streams via threefry, so stream separation semantics are
    unchanged; only the per-element bit generation differs."""
    kd = jax.random.key_data(key)
    return jax.random.wrap_key_data(
        jnp.concatenate([kd, kd]).astype(jnp.uint32), impl="rbg")


def make_train_step(exp: ExperimentConfig, donate: bool = True,
                    noise_bank=None, rir_bank=None):
    lcfg = exp.train.loss
    use_remat = exp.train.remat
    dcfg = exp.data
    augment = (dcfg.augment_enabled
               and (noise_bank is not None or rir_bank is not None))

    def step(state: TrainState, audio, labels, mask, rng) -> Tuple[TrainState, Dict]:
        rngs = {
            # hardware bit generation for the per-element streams (see
            # fast_bits_key); specaugment/lsa draw only tiny tensors but ride
            # the same generator for uniformity
            "dropout": fast_bits_key(jax.random.fold_in(rng, 0)),
            "specaugment": fast_bits_key(jax.random.fold_in(rng, 1)),
            "lsa": fast_bits_key(jax.random.fold_in(rng, 2)),
        }
        if augment:
            from adfmsl.data.augment import augment_waveform

            audio = augment_waveform(
                audio, jax.random.fold_in(rng, 3), noise_bank, rir_bank,
                dcfg.augment_noise_prob, dcfg.augment_reverb_prob,
                dcfg.augment_snr_db_min, dcfg.augment_snr_db_max)

        def loss_fn(params):
            def fwd(params, audio):
                variables = {"params": params}
                if state.batch_stats is not None:
                    variables["batch_stats"] = state.batch_stats
                return state.apply_fn(variables, audio, labels=labels,
                                      train=True, mask=mask, rngs=rngs,
                                      mutable=["batch_stats"])

            if use_remat:
                # jax.checkpoint must see ONLY jax types as arguments — the
                # static kwargs (mutable=[...] strings, train flag) stay in the
                # closure; labels/mask/rngs close over as small saved constants
                fwd = jax.checkpoint(fwd)
            out, mut = fwd(params, audio)
            if "loss" in out:
                loss = out["loss"]
            else:
                loss = compute_loss(
                    lcfg.name, out["logits"], labels,
                    class_weights=lcfg.class_weights,
                    focal_alpha=lcfg.focal_alpha, focal_gamma=lcfg.focal_gamma,
                    mask=mask)
            return loss, (out, mut.get("batch_stats", state.batch_stats))

        (loss, (out, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        grads = _zero_nonfinite(grads)
        good = jnp.isfinite(loss)

        updated = state.apply_gradients(grads).replace(batch_stats=new_bs)
        # non-finite loss => keep old state entirely (batch skip, maze2_fmsl:519-521)
        new_state = jax.tree_util.tree_map(
            lambda new, old: jax.lax.select(good, new, old)
            if hasattr(new, "dtype") else new,
            updated, state.replace(step=state.step + 1))

        pred = jnp.argmax(out["logits"], axis=-1)
        acc = masked_mean((pred == labels).astype(jnp.float32), mask)
        metrics = {
            "loss": jnp.where(good, loss, 0.0),
            "acc": acc,
            "skipped": (~good).astype(jnp.float32),
            "grad_norm": optax_global_norm(grads),
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))


def make_eval_step(exp: ExperimentConfig):
    """Batched inference: scores + accuracy counts under the validity mask."""

    def step(state: TrainState, audio, labels, mask):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        out = state.apply_fn(variables, audio, train=False)
        pred = jnp.argmax(out["logits"], axis=-1)
        correct = jnp.sum((pred == labels) * mask)
        return {
            "scores": out["scores"],
            "logits": out["logits"],
            "correct": correct,
            "count": jnp.sum(mask),
        }

    return jax.jit(step)
