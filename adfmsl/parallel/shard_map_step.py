"""Explicit-collective data-parallel train step via shard_map.

The default train step (train/steps.py) is written against the global batch and lets
GSPMD place collectives. This module provides the explicit alternative — the direct
TPU analog of the NCCL all-reduce training loop the reference never had (SURVEY.md
2.10): shard_map splits the batch over the mesh's data axis, each shard computes
local gradients/metrics, and ``jax.lax.pmean`` reduces them over ICI before an
identical replicated update.

Useful when you want visible, auditable collectives (e.g. to interleave custom
Pallas ring ops) or exact control over reduction semantics. Semantics note:
BatchNorm draws batch statistics from the LOCAL shard during the forward pass
(torch-DDP-style local BN) and the updated running stats are pmean'd, whereas the
GSPMD step normalises over the GLOBAL batch (sync-BN); losses therefore differ at
the sub-percent level on small batches (validated in tests/test_shard_map.py).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from adfmsl.config.base import ExperimentConfig
from adfmsl.heads.losses import loss_parts
from adfmsl.train.state import TrainState
from adfmsl.train.steps import _zero_nonfinite


def make_shard_map_train_step(exp: ExperimentConfig, mesh: Mesh):
    """Returns step(state, audio, labels, mask, rng) with explicit pmean."""
    lcfg = exp.train.loss
    data_axis = mesh.axis_names[0]

    def local_grads(params, batch_stats, apply_fn, audio, labels, mask, rng):
        from adfmsl.train.steps import fast_bits_key

        rngs = {
            "dropout": jax.random.fold_in(rng, 0),
            "specaugment": jax.random.fold_in(rng, 1),
            "lsa": jax.random.fold_in(rng, 2),
        }
        # decorrelate per-shard stochastic ops, then switch the per-element
        # bit generation to the hardware generator (train/steps.py)
        shard_idx = jax.lax.axis_index(data_axis)
        rngs = {k: fast_bits_key(jax.random.fold_in(v, shard_idx))
                for k, v in rngs.items()}

        def loss_fn(p):
            variables = {"params": p}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            out, mut = apply_fn(variables, audio, labels=labels, train=True,
                                mask=mask, rngs=rngs, mutable=["batch_stats"])
            if "loss" in out:
                # model-internal loss (FMSL modes): a per-shard mean; averaged
                # across shards below (equal shard sizes => exact for its CE
                # term; the proto term keeps DDP loss-averaging semantics)
                return out["loss"], (None, out, mut.get("batch_stats", batch_stats))
            # external loss: differentiate the NUMERATOR sum and psum num/denom
            # separately so the global loss/grads equal the single-device values
            # EXACTLY even when shards carry different label mixes (weighted CE
            # divides by the shard's target-weight sum — losses.loss_parts)
            num, denom = loss_parts(lcfg.name, out["logits"], labels,
                                    class_weights=lcfg.class_weights,
                                    focal_alpha=lcfg.focal_alpha,
                                    focal_gamma=lcfg.focal_gamma, mask=mask)
            return num, (denom, out, mut.get("batch_stats", batch_stats))

        (val, (denom, out, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)

        # ---- the explicit collectives: psum/pmean over the data axis (ICI) ----
        if denom is None:
            grads = jax.lax.pmean(grads, axis_name=data_axis)
            loss = jax.lax.pmean(val, axis_name=data_axis)
        else:
            gdenom = jnp.maximum(
                jax.lax.psum(denom, axis_name=data_axis), 1e-8)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, axis_name=data_axis) / gdenom, grads)
            loss = jax.lax.psum(val, axis_name=data_axis) / gdenom
        pred = jnp.argmax(out["logits"], axis=-1)
        correct = jnp.sum((pred == labels) * mask)
        count = jnp.sum(mask)
        correct = jax.lax.psum(correct, axis_name=data_axis)
        count = jax.lax.psum(count, axis_name=data_axis)
        new_bs = (jax.lax.pmean(new_bs, axis_name=data_axis)
                  if new_bs is not None else None)
        return grads, loss, correct, count, new_bs

    @jax.jit
    def step(state: TrainState, audio, labels, mask, rng
             ) -> Tuple[TrainState, Dict]:
        fn = shard_map(
            partial(local_grads, state.params, state.batch_stats, state.apply_fn),
            mesh=mesh,
            in_specs=(P(data_axis), P(data_axis), P(data_axis), P()),
            out_specs=P(),        # everything reduced -> replicated
            check_vma=False,
        )
        grads, loss, correct, count, new_bs = fn(audio, labels, mask, rng)
        grads = _zero_nonfinite(grads)
        good = jnp.isfinite(loss)
        updated = state.apply_gradients(grads).replace(batch_stats=new_bs)
        new_state = jax.tree_util.tree_map(
            lambda new, old: jax.lax.select(good, new, old)
            if hasattr(new, "dtype") else new,
            updated, state.replace(step=state.step + 1))
        metrics = {
            "loss": jnp.where(good, loss, 0.0),
            "acc": correct / jnp.maximum(count, 1.0),
            "skipped": (~good).astype(jnp.float32),
        }
        return new_state, metrics

    return step
