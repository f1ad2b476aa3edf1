"""Benchmark: fused LFCC + LCNN1D throughput on TPU vs the matched CPU reference.

The BASELINE north-star metric: utterances/sec/chip for the fused front-end +
classifier pipeline on 4-second 16 kHz clips, vs the reference's CPU-bound
librosa-front-end + torch-classifier stack (target >= 20x, BASELINE.json).

TPU paths (one jit-compiled program each, serially chained via lax.scan so a
single host sync times N batches — block_until_ready does not wait on the
tunneled 'axon' platform):
- eval:  on-device LFCC (frame/window/DFT/filterbank/DCT as MXU matmuls) +
         LCNN1D forward (adfmsl.models.lcnn).
- train: full train step (forward, CE, backward, adam update, BN stats) scanned
         with the TrainState as carry.
- front end: Pallas fused sinc+|.|+pool3 kernel vs the XLA composition
         (adfmsl.ops.pallas.sinc_fused), the RawNet eval front end.

CPU reference: float32 numpy/scipy LFCC (what librosa computes under the hood) +
an ARCHITECTURE-MATCHED torch LCNN1D forward on CPU (same layer plan/widths as
the TPU model), >=10 batches.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

BATCH = 384          # batch sweep on v5e at DFT 'high': 256 -> 93k, 320 -> 80k,
                     # 384 -> 100k, 448 -> 85k, 512 -> 94k, 640 -> 95k utt/s
                     # (stable across repeats); train also peaks at 384 (62.5k
                     # vs 57k at 256)
CUT = 64600          # 4 s @ 16 kHz
N_ITERS = 128        # 64 -> 96.5k, 128 -> ~104k utt/s: the serial scan amortises
                     # the fixed dispatch+sync overhead of the tunneled backend
TRAIN_ITERS = 16
CPU_BATCHES = 10
CPU_BATCH = 16
PEAK_BF16_FLOPS = 197e12      # TPU v5e per-chip bf16 peak


def _time_one_sync(fn, *args) -> float:
    """Run fn twice (compile+warm, then timed); one float() forces the sync."""
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def _time_windows(fn, *args, repeats: int = 3) -> list[float]:
    """Warm once, then time ``repeats`` independent scan windows. The tunneled
    backend's throughput wanders ±10% run-to-run (CLAUDE.md), so headline
    numbers are quoted as median with a [min, max] range (round-3 verdict)."""
    float(fn(*args))
    out = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        out.append(time.perf_counter() - t0)
    return out


def tpu_eval_rate():
    import jax
    import jax.numpy as jnp

    from adfmsl.config import make_experiment
    from adfmsl.models import build_model

    # lcnn1d_lfcc: the TPU-native LCNN formulation (LFCC coeffs as channels —
    # full MXU lanes; ~1.8x the classic 2-D image layout at equal depth)
    exp = make_experiment("lcnn1d_lfcc")
    model = build_model(exp.model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, CUT)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    @functools.partial(jax.jit, static_argnums=2)
    def fwd_many(v, x, n):
        def body(carry, _):
            out = model.apply(v, x + carry * 1e-30, train=False)["scores"]
            return out[0].astype(jnp.float32), out.sum()
        carry, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry + sums.sum()

    dts = _time_windows(lambda: fwd_many(variables, x, N_ITERS))
    dt = sorted(dts)[len(dts) // 2]                      # median window
    rate = BATCH * N_ITERS / dt
    rate_range = [round(BATCH * N_ITERS / max(dts), 2),
                  round(BATCH * N_ITERS / min(dts), 2)]

    mfu = None
    try:
        # XLA cost analysis counts a scan body ONCE regardless of trip count, so
        # analyse a single-iteration program and scale by N_ITERS.
        ca = jax.jit(fwd_many, static_argnums=2).lower(
            variables, x, 1).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            mfu = 100.0 * flops * N_ITERS / dt / PEAK_BF16_FLOPS
    except Exception:
        pass
    return rate, mfu, rate_range


def tpu_train_rate():
    """Full train-step throughput (fwd+bwd+adam+BN stats), state as scan carry."""
    import jax
    import jax.numpy as jnp
    import optax

    from adfmsl.config import make_experiment
    from adfmsl.heads.losses import compute_loss
    from adfmsl.models import build_model

    exp = make_experiment("lcnn1d_lfcc")
    model = build_model(exp.model)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((BATCH, CUT)).astype(np.float32))
    labels = jnp.asarray(np.arange(BATCH) % 2, dtype=jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    tx = optax.adam(1e-4)
    from adfmsl.train.steps import fast_bits_key as _fast_key

    key = jax.random.PRNGKey(2)

    @functools.partial(jax.jit, static_argnums=1)
    def train_many(carry0, n):
        def loss_fn(p, bstats, xb):
            out, mut = model.apply(
                {"params": p, "batch_stats": bstats}, xb, labels=labels,
                train=True, rngs={"dropout": _fast_key(key)},
                mutable=["batch_stats"])
            loss = compute_loss("weighted_ce", out["logits"], labels,
                                class_weights=[0.3, 0.7])
            return loss, mut["batch_stats"]

        def body(carry, _):
            p, bstats, opt, last = carry
            (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, bstats, x + last * 1e-30)
            updates, nopt = tx.update(grads, opt, p)
            return (optax.apply_updates(p, updates), nbs, nopt, loss), loss

        carry, losses = jax.lax.scan(body, carry0, None, length=n)
        return losses.sum()

    carry0 = (variables["params"], variables["batch_stats"],
              tx.init(variables["params"]), jnp.float32(0.0))
    dt = _time_one_sync(lambda: train_many(carry0, TRAIN_ITERS))
    return BATCH * TRAIN_ITERS / dt


def sinc_frontend_speedup():
    """Pallas fused sinc+|.|+pool3 vs the XLA composition (RawNet eval front end);
    TPU only (the kernel is Mosaic; interpret mode is not a perf path)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return None

    # _xla_frontend is THE product XLA composition (ops/pallas/sinc_fused.py) —
    # reusing it keeps the benchmark honest if the epilogue ever changes
    from adfmsl.ops.pallas.sinc_fused import _xla_frontend, sinc_abs_pool_fused
    from adfmsl.ops.sinc import sinc_filters, sinc_init

    low, band = sinc_init(128)
    f = sinc_filters(jnp.asarray(low), jnp.asarray(band), 251, formula="textbook")
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((8, CUT)).astype(np.float32))
    iters = 32

    def xla_frontend(xb):
        return _xla_frontend(xb, f)                      # (B, T3, C)

    def fused_frontend(xb):
        return sinc_abs_pool_fused(xb, f)                # (B, T3, C)

    def many(fn):
        @jax.jit
        def run(x):
            def body(carry, _):
                y = fn(x + carry * 1e-30)
                return y[0, 0, 0].astype(jnp.float32), y.sum()
            carry, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return carry + sums.sum()
        return run

    dt_xla = _time_one_sync(many(xla_frontend), x)
    dt_fused = _time_one_sync(many(fused_frontend), x)
    return dt_xla / dt_fused


def maze5_eval_rate():
    """Reference-capability model under the production eval path (folded bf16
    trunk + channels-last sinc conv), batch 192 — the maze-zoo headline."""
    import jax
    import jax.numpy as jnp

    from adfmsl.config import make_experiment
    from adfmsl.models import build_model

    exp = make_experiment("maze5")
    exp.model.extra["fused_eval_trunk"] = True
    model = build_model(exp.model)
    batch, iters = 192, 32
    x = jnp.asarray(np.random.default_rng(3)
                    .standard_normal((batch, CUT)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    @functools.partial(jax.jit, static_argnums=2)
    def fwd_many(v, x, n):
        def body(carry, _):
            out = model.apply(v, x + carry * 1e-30, train=False)["scores"]
            return out[0].astype(jnp.float32), out.sum()
        carry, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry + sums.sum()

    dt = _time_one_sync(lambda: fwd_many(variables, x, iters))
    return batch * iters / dt


def cpu_reference_rate() -> float:
    import scipy.fft
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from adfmsl.ops.mel import linear_filterbank
    from adfmsl.ops.window import hann

    sr, n_fft, hop, win, n_filter, n_lfcc = 16000, 512, 160, 400, 70, 60
    w = hann(win, periodic=True).astype(np.float32)
    fb = linear_filterbank(sr, n_fft, n_filter)

    def lfcc_cpu(batch: np.ndarray) -> np.ndarray:
        pad = win // 2
        xp = np.pad(batch, [(0, 0), (pad, pad)], mode="reflect")
        n_frames = 1 + (xp.shape[1] - win) // hop
        idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
        frames = xp[:, idx] * w
        spec = np.fft.rfft(frames, n=n_fft, axis=-1)
        p = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
        e = np.log(np.maximum(p @ fb, 1e-6))
        return scipy.fft.dct(e, type=2, norm="ortho", axis=-1)[..., :n_lfcc]

    class MFM(nn.Module):
        def forward(self, x):
            a, b = torch.chunk(x, 2, dim=1)
            return torch.maximum(a, b)

    class TorchLCNN1D(nn.Module):
        """ARCHITECTURE-MATCHED to adfmsl.models.lcnn.LCNN1D: same layer plan,
        widths, MFM nonlinearity and pool placement (channel-first torch form)."""

        def __init__(self):
            super().__init__()
            self.net = nn.Sequential(
                nn.Conv1d(n_lfcc, 128, 5, padding=2), MFM(), nn.BatchNorm1d(64),
                nn.MaxPool1d(2),
                nn.Conv1d(64, 192, 3, padding=1), MFM(), nn.BatchNorm1d(96),
                nn.MaxPool1d(2),
                nn.Conv1d(96, 256, 3, padding=1), MFM(), nn.BatchNorm1d(128),
                nn.MaxPool1d(2),
                nn.Conv1d(128, 128, 1), MFM(), nn.BatchNorm1d(64),
                nn.Conv1d(64, 128, 3, padding=1), MFM(), nn.BatchNorm1d(64),
                nn.MaxPool1d(2),
            )
            self.fc1, self.fc2 = nn.Linear(64, 160), nn.Linear(80, 2)

        def forward(self, x):                            # (B, 60, T)
            h = self.net(x).mean(dim=2)
            h = self.fc1(h)
            a, b = torch.chunk(h, 2, dim=1)
            return F.log_softmax(self.fc2(torch.maximum(a, b)), dim=-1)[:, 1]

    torch.set_num_threads(max(torch.get_num_threads(), 1))
    model = TorchLCNN1D().eval()
    rng = np.random.default_rng(0)
    batch = rng.standard_normal((CPU_BATCH, CUT)).astype(np.float32)
    with torch.no_grad():   # warmup
        model(torch.from_numpy(lfcc_cpu(batch)).transpose(1, 2))
    # per-batch best rate, not the window total: this 1-core VM's CPU load
    # varies across rounds (measured 50-113 utt/s for the SAME code), and the
    # CPU baseline deserves its best case — vs_baseline should understate,
    # never overstate, the TPU advantage
    best = float("inf")
    total = 0.0
    with torch.no_grad():
        for _ in range(CPU_BATCHES):
            t0 = time.perf_counter()
            feats = lfcc_cpu(batch)
            model(torch.from_numpy(feats).transpose(1, 2))
            dt = time.perf_counter() - t0
            best = min(best, dt)
            total += dt
    # (best, window-mean): vs_baseline uses BEST (conservative for the TPU
    # advantage); the mean is emitted alongside so cross-round comparisons
    # with the round-2/3 window-total methodology stay honest (ADVICE r4)
    return CPU_BATCH / best, CPU_BATCH * CPU_BATCHES / total


def _try(fn, default=None):
    """Secondary measurements must never kill the driver's ONE-line contract."""
    try:
        return fn()
    except Exception as e:  # pragma: no cover
        import sys

        print(f"bench section {fn} failed: {e!r}", file=sys.stderr)
        return default


def main():
    eval_rate, mfu, rate_range = tpu_eval_rate()   # headline: fail loudly if this breaks
    train_rate = _try(tpu_train_rate)
    fused_speedup = _try(sinc_frontend_speedup)
    maze5_rate = _try(maze5_eval_rate)
    cpu_pair = _try(cpu_reference_rate)
    cpu_best, cpu_mean = cpu_pair if cpu_pair else (None, None)
    print(json.dumps({
        "metric": "utterances/sec/chip (fused LFCC+LCNN1D eval, 4s clips)",
        "value": round(eval_rate, 2),
        "value_range": rate_range,          # [min, max] over 3 scan windows
        "unit": "utt/s/chip",
        "vs_baseline": round(eval_rate / cpu_best, 2) if cpu_best else None,
        "train_utt_s_chip": round(train_rate, 2) if train_rate else None,
        "cpu_ref_utt_s": round(cpu_best, 2) if cpu_best else None,
        "cpu_ref_utt_s_mean": round(cpu_mean, 2) if cpu_mean else None,
        "cpu_batches": CPU_BATCHES * CPU_BATCH,
        "mfu_pct_est": round(mfu, 2) if mfu is not None else None,
        "sinc_fused_frontend_speedup": (round(fused_speedup, 2)
                                        if fused_speedup is not None else None),
        "maze5_eval_utt_s_chip": (round(maze5_rate, 1)
                                  if maze5_rate is not None else None),
    }))


if __name__ == "__main__":
    main()
