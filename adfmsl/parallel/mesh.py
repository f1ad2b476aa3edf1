"""Device mesh construction and sharding rules.

The reference is strictly single-device (SURVEY.md 2.9/2.10 — no torch.distributed,
no collectives). This module is the net-new TPU-native scaling layer: a
(data, model) ``jax.sharding.Mesh`` over all devices, NamedShardings for batches
(sharded on the data axis) and parameters (replicated by default; model-axis rules
reserved for tensor-parallel Wav2Vec2-large), and helpers to place host batches onto
the mesh. Under jit, XLA inserts the psum/all-gather collectives over ICI.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adfmsl.config.base import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(cfg.model_parallel, 1)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard along the data axis on dim 0."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place host arrays onto the mesh, dim-0-sharded over the data axis."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def pad_batch_to_devices(audio: np.ndarray, label: np.ndarray, mask: np.ndarray,
                         n_devices: int):
    """Round the batch up to a multiple of the data-axis size (padding rows carry
    mask=False so metrics/scores ignore them)."""
    b = audio.shape[0]
    rem = (-b) % n_devices
    if rem == 0:
        return audio, label, mask
    pad = [(0, rem)] + [(0, 0)] * (audio.ndim - 1)
    return (np.pad(audio, pad), np.pad(label, [(0, rem)]),
            np.pad(mask, [(0, rem)]))
