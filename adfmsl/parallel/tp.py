"""Tensor-parallel sharding rules (Megatron-style) for the Wav2Vec2 encoder.

SURVEY.md 2.9 lists tensor-parallel sharding of the Wav2Vec2-large encoder across
chips as the stretch scaling goal (the reference runs it single-device). The rules
below shard, over the mesh's model axis:
  - attention q/k/v kernels (H, nH, hd) and biases on the HEADS axis (column-parallel)
  - attention out kernel (nH, hd, H) on heads (row-parallel; XLA inserts the psum)
  - FFN intermediate kernel (H, I) on I (column-parallel), output kernel (I, H) on I
    (row-parallel)
Everything else (LayerNorms, conv feature extractor, embeddings) replicates. Applied
as NamedShardings to the param tree + GSPMD under jit: no hand-written collectives —
XLA lays the all-reduces onto ICI.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _w2v2_leaf_spec(path, leaf, model_axis: str) -> P:
    keys = [getattr(p, "key", "") for p in path]
    if "wav2vec2" not in keys:
        return P()
    name = keys[-1]                      # 'kernel' | 'bias' | 'scale'
    if "attention" in keys:
        if any(k in keys for k in ("query", "key", "value")):
            # kernel (H, nH, hd) / bias (nH, hd): shard heads
            return P(None, model_axis) if name == "kernel" else P(model_axis)
        if "out" in keys:
            # kernel (nH, hd, H): shard heads (row-parallel); bias replicated
            return P(model_axis) if name == "kernel" else P()
    if "intermediate_dense" in keys:
        return P(None, model_axis) if name == "kernel" else P(model_axis)
    if "output_dense" in keys:
        return P(model_axis) if name == "kernel" else P()
    return P()


def w2v2_param_specs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpec tree for a model whose params contain a 'wav2vec2' subtree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _w2v2_leaf_spec(path, leaf, model_axis), params)


def shard_params_tp(mesh: Mesh, params: Any, model_axis: str = "model") -> Any:
    """Place params on the mesh under the TP specs (non-w2v2 params replicate)."""
    specs = w2v2_param_specs(params, model_axis)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs,
        is_leaf=lambda x: isinstance(x, P))
