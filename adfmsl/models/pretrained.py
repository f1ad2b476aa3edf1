"""Pretrained Wav2Vec2 weight injection.

The reference downloads ``facebook/wav2vec2-base-960h`` from the hub at model
construction (maze2.py:89-90). This environment has no egress, so pretrained weights
arrive as LOCAL files (HF torch .bin/.pt, .safetensors, or an adfmsl-exported
.msgpack) referenced by ``Wav2Vec2Config.pretrained_path`` and injected into a built
model's 'wav2vec2' subtree. ``adfmsl-convert-w2v2`` pre-converts a torch checkpoint to
the native msgpack for fast startup.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict

import numpy as np

from adfmsl.config.base import Wav2Vec2Config
from adfmsl.models.w2v2 import W2V2Arch, load_pretrained, port_hf_state_dict

log = logging.getLogger(__name__)


def arch_for(cfg: Wav2Vec2Config) -> W2V2Arch:
    if cfg.model_name == "tiny":
        return W2V2Arch.tiny()
    if cfg.output_dim >= 1024:
        return W2V2Arch.large_960h()
    return W2V2Arch.base()


def save_native(params: Dict[str, Any], path: str) -> None:
    """Serialize a w2v2 param tree to msgpack (flax serialization)."""
    import flax.serialization

    with open(path, "wb") as fh:
        fh.write(flax.serialization.msgpack_serialize(params))


def load_native(path: str,
                template: Dict[str, Any] | None = None) -> Dict[str, Any]:
    """Restore a msgpack param tree; with ``template``, restore INTO its
    structure (flax from_bytes validates leaf shapes/structure against it)."""
    import flax.serialization

    with open(path, "rb") as fh:
        raw = fh.read()
    if template:
        return flax.serialization.from_bytes(template, raw)
    return flax.serialization.msgpack_restore(raw)


def load_w2v2_params(path: str, cfg: Wav2Vec2Config,
                     template: Dict[str, Any] | None = None) -> Dict[str, Any]:
    """Load a w2v2 param tree from any supported local format."""
    if path.endswith(".msgpack"):
        return load_native(path, template)
    return load_pretrained(path, arch_for(cfg))


def _tree_shapes(tree) -> Dict[str, tuple]:
    import jax

    return {jax.tree_util.keystr(k): np.asarray(v).shape
            for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def inject_pretrained_w2v2(params: Dict[str, Any], cfg: Wav2Vec2Config
                           ) -> Dict[str, Any]:
    """Replace params['wav2vec2'] with weights from cfg.pretrained_path.

    Shape-checked against the randomly-initialised tree; mismatches raise (or the
    whole injection is skipped with a warning when require_pretrained is False and
    the file is absent)."""
    path = cfg.pretrained_path
    if not path:
        if cfg.require_pretrained:
            raise FileNotFoundError(
                "wav2vec2.require_pretrained=True but no pretrained_path set")
        return params
    if not os.path.exists(path):
        if cfg.require_pretrained:
            raise FileNotFoundError(f"pretrained checkpoint not found: {path}")
        log.warning("pretrained_path %s missing; using random wav2vec2 init", path)
        return params
    if "wav2vec2" not in params:
        log.warning("model has no wav2vec2 subtree; pretrained_path ignored")
        return params
    loaded = load_w2v2_params(path, cfg, params["wav2vec2"])
    want = _tree_shapes(params["wav2vec2"])
    got = _tree_shapes(loaded)
    if want != got:
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        mism = sorted(k for k in set(want) & set(got) if want[k] != got[k])
        raise ValueError(
            f"pretrained wav2vec2 tree mismatch: missing={missing[:5]} "
            f"extra={extra[:5]} shape_mismatch={mism[:5]}")
    import jax
    import jax.numpy as jnp

    new = dict(params)
    new["wav2vec2"] = jax.tree_util.tree_map(lambda leaf: jnp.asarray(leaf), loaded)
    log.info("loaded pretrained wav2vec2 from %s", path)
    return new
