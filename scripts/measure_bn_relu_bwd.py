"""Measure the Pallas BN+ReLU train-backward vs XLA's lowering (VERDICT r4 #3).

Block0 shapes, bf16 trunk widths. Methodology per docs/PERF.md round-4
corrections: jax.vjp with an epsilon-perturbed random cotangent inside a
serial-carry scan (constant cotangents let XLA algebraically collapse part of
the conv backward; sliced consumers get DCE'd).

Programs, each fwd+vjp:
  A  plain:  BN(train)->relu           (flax-equivalent explicit math)
  B  pallas: bn_relu_train             (custom-VJP two-pass Pallas backward)
  A+ / B+:   same with a k3 conv consumer attached (the real downstream —
             sum-consumed micro-benchmarks hide layout costs, CLAUDE.md r4)

Run on the real TPU: `python scripts/measure_bn_relu_bwd.py [b16|b128|both]`.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

ITERS = 64


def plain_bn_relu(x, gamma, beta, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(0, 1))
    var = jnp.mean(jnp.square(xf), axis=(0, 1)) - jnp.square(mu)
    y = gamma * (xf - mu) * jax.lax.rsqrt(var + eps) + beta
    return jnp.maximum(y, 0.0).astype(x.dtype)


def time_vjp(f, args, ct, iters=ITERS):
    @jax.jit
    def run(args, ct):
        def body(c, _):
            # keep each arg's dtype: c is an f32 carry and would promote bf16
            perturbed = tuple(a + (c * 1e-9).astype(a.dtype) for a in args)
            y, vjp = jax.vjp(f, *perturbed)
            grads = vjp((ct + (c * 1e-9).astype(ct.dtype)).astype(y.dtype))
            s = sum(jnp.sum(g.astype(jnp.float32)) for g in grads)
            s = s + jnp.sum(y.astype(jnp.float32))
            return c + s * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run(args, ct))                  # compile + warm
    t0 = time.perf_counter()
    float(run(args, ct))
    return (time.perf_counter() - t0) / iters * 1e3


def measure(B, T, C, dtype=jnp.bfloat16):
    from adfmsl.ops.pallas.bn_relu_bwd import bn_relu_train

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)), dtype=dtype)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    beta = jnp.asarray(rng.uniform(-0.3, 0.3, C).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((B, T, C)), dtype=dtype)
    w = jnp.asarray(rng.standard_normal((3, C, C)) * 0.05, dtype=dtype)
    ctc = ct

    out = {}
    out["A_plain"] = time_vjp(lambda x, g, b: plain_bn_relu(x, g, b),
                              (x, gamma, beta), ct)
    out["B_pallas"] = time_vjp(
        lambda x, g, b: bn_relu_train(x, g, b, 1e-5, False),
        (x, gamma, beta), ct)

    # no preferred_element_type: its transpose rule feeds an f32 cotangent to
    # a bf16-weight conv and trips the dtype check; native bf16 output is fine
    # for a timing probe (MXU still accumulates f32 internally)
    def plain_conv(x, g, b):
        h = plain_bn_relu(x, g, b)
        return jax.lax.conv_general_dilated(
            h, w, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"))

    def pallas_conv(x, g, b):
        h = bn_relu_train(x, g, b, 1e-5, False)
        return jax.lax.conv_general_dilated(
            h, w, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"))

    out["A_plain_conv"] = time_vjp(plain_conv, (x, gamma, beta), ctc)
    out["B_pallas_conv"] = time_vjp(pallas_conv, (x, gamma, beta), ctc)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    results = {}
    if which in ("b16", "both"):
        results["b16_block0_(16,64350,128)"] = measure(16, 64350, 128)
    if which in ("b128", "both"):
        results["b128_block0_(128,21450,128)"] = measure(128, 21450, 128)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
