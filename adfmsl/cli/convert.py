"""adfmsl-convert-w2v2: convert a local HF torch Wav2Vec2 checkpoint to the native
msgpack param format for fast, torch-free startup (zero-egress analog of the
reference's hub download at model construction, maze2.py:89-90)."""
from __future__ import annotations

import argparse
import sys


def build_parser():
    p = argparse.ArgumentParser("adfmsl-convert-w2v2")
    p.add_argument("--torch_ckpt", required=True,
                   help="local pytorch_model.bin / .pt / .safetensors")
    p.add_argument("--arch", default="base", choices=["base", "large", "tiny"])
    p.add_argument("--out", required=True, help="output .msgpack path")
    p.add_argument("--verify", action="store_true",
                   help="round-trip load and compare a forward pass")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from adfmsl.models.pretrained import save_native
    from adfmsl.models.w2v2 import W2V2Arch, load_pretrained

    arch = {"base": W2V2Arch.base(), "large": W2V2Arch.large_960h(),
            "tiny": W2V2Arch.tiny()}[args.arch]
    params = load_pretrained(args.torch_ckpt, arch)
    save_native(params, args.out)
    print(f"converted {args.torch_ckpt} -> {args.out}")

    if args.verify:
        import numpy as np

        import jax.numpy as jnp

        from adfmsl.models.pretrained import load_native
        from adfmsl.models.w2v2 import Wav2Vec2Encoder

        back = load_native(args.out, params)
        enc = Wav2Vec2Encoder(arch=arch, normalize_input=False)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 3200)).astype(np.float32))
        a = enc.apply({"params": params}, x)
        b = enc.apply({"params": back}, x)
        err = float(jnp.abs(a - b).max())
        print(f"round-trip max abs err: {err:.2e}")
        return 0 if err < 1e-6 else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
