"""Per-stage attribution of the headline LFCC+LCNN1D eval step (VERDICT r4 #4).

The round-4 roofline (docs/PERF.md) left ~0.9 ms of the 2.6 ms b384 step
unattributed: the 3-pass 'high' DFT caps effective compute at ~66 TFLOP/s and
the measured step sits at ~63% of that tier ceiling. This script measures the
CUMULATIVE chain — s2d reshape -> DFT conv -> |.|^2 -> filterbank -> log ->
DCT -> LCNN trunk — so each increment attributes one op, using the bench.py
serial-carry scan with a FULL-REDUCTION consumer (sliced consumers get DCE'd
into nonsense; sum-consumed probes can still hide layout costs, so the full
chain cross-checks the sum of parts).

Run on the real TPU: `python scripts/profile_headline.py`. One JSON line per
stage. Uses the persistent XLA cache; a cold run compiles ~7 small programs.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 384
CUT = 64600
ITERS = 128


def time_fn(fn, x, iters=ITERS):
    """Serial-carry scan timing: one final host read, per CLAUDE.md tunnel
    rules (block_until_ready does not wait on axon)."""

    @jax.jit
    def run(x0):
        def body(c, _):
            out = fn(x0 + c * 1e-9)
            return c + jnp.sum(out) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run(x))                                   # compile + warm
    t0 = time.perf_counter()
    float(run(x))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3                         # ms per call


def main():
    from adfmsl.ops.lfcc import dct_matrix, lfcc
    from adfmsl.ops.mel import (apply_filterbank, linear_filterbank,
                                log_compress)
    from adfmsl.ops.stft import stft_s2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, CUT)).astype(np.float32))
    fb = jnp.asarray(linear_filterbank(16000, 512, 70))
    dct = jnp.asarray(dct_matrix(70, 60))

    stages = {}

    # raw=True returns the pre-square (frames, 2K) conv output
    stages["1_dft_conv_raw"] = time_fn(
        lambda v: stft_s2d(v, 512, 160, 400, precision="high", raw=True), x)
    stages["2_power"] = time_fn(
        lambda v: stft_s2d(v, 512, 160, 400, precision="high"), x)
    stages["3_filterbank"] = time_fn(
        lambda v: apply_filterbank(
            stft_s2d(v, 512, 160, 400, precision="high"), fb), x)
    stages["4_log"] = time_fn(
        lambda v: log_compress(apply_filterbank(
            stft_s2d(v, 512, 160, 400, precision="high"), fb), 1e-6), x)
    stages["5_lfcc_full"] = time_fn(
        lambda v: lfcc(v, precision="high"), x)

    # the full headline forward (bench.py tpu_eval_rate's model) for the
    # trunk residual
    from adfmsl.config import make_experiment
    from adfmsl.models import build_model

    exp = make_experiment("lcnn1d_lfcc")
    model = build_model(exp.model)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    stages["6_full_pipeline"] = time_fn(
        lambda v: model.apply(variables, v, train=False)["scores"], x)

    increments = {}
    keys = [k for k, v in stages.items() if v is not None]
    for prev, cur in zip([None] + keys[:-1], keys):
        increments[cur] = (stages[cur] if prev is None
                           else stages[cur] - stages[prev])
    print(json.dumps({"batch": BATCH, "stages_ms": stages,
                      "increments_ms": increments}))


if __name__ == "__main__":
    main()
