"""Warm the persistent XLA compile cache for the driver-critical programs.

Operational context (CLAUDE.md "Axon tunnel operational lessons"): with
``PALLAS_AXON_REMOTE_COMPILE=1`` a cold first compile of a maze-model conv
layout can take many minutes with near-zero client CPU, and the on-disk cache
(``~/.cache/adfmsl_xla``, enabled by ``adfmsl/__init__``) does not survive a
host re-image. The round driver compile-checks ``__graft_entry__.entry()`` and
times ``bench.py`` on the real chip — if those programs compile cold inside
the driver's own timeout window, the round's recorded numbers suffer for a
purely operational reason.

This script compiles-and-runs, in order:

1. the driver's ``entry()`` forward (maze5_fmsl eval, batch 8, cut 64600);
2. ``bench.py``'s own programs, by invoking it as a subprocess (its timing
   loops double as the warm-up — every shape it compiles lands in the cache).

Run ``make warm`` once after any host re-image, BEFORE the driver's bench
window. Jobs are strictly sequential: two concurrent axon clients contend for
the chip lease (CLAUDE.md), so never run this alongside another TPU process.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def warm_entry() -> None:
    import jax

    sys.path.insert(0, HERE)
    import __graft_entry__

    t0 = time.time()
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    # one explicit host read forces the dispatch to complete on the tunneled
    # backend (block_until_ready does not wait there, CLAUDE.md)
    float(jax.numpy.asarray(out[0]).sum())
    print(f"entry() compiled+ran in {time.time() - t0:.1f}s "
          f"on {jax.default_backend()!r}")


def _run(cmd, what: str) -> None:
    """Run one warm job as a subprocess so NO axon client lives in this
    process while the next job runs (two concurrent clients contend for the
    single chip lease — CLAUDE.md). Bounded with a generous timeout and
    WAITED on rather than killed: killing a client that holds the TPU wedges
    the tunnel for ~6 min."""
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    except subprocess.TimeoutExpired as e:
        sys.stderr.write(f"{what} timed out after 3600s\n"
                         + ((e.stderr or b"").decode(errors="replace")
                            if isinstance(e.stderr, bytes) else (e.stderr or ""))[-2000:])
        raise SystemExit(124)
    tail = (proc.stdout or "").strip().splitlines()
    print(f"{what} rc={proc.returncode} in {time.time() - t0:.1f}s")
    if tail:
        print(tail[-1])
    if proc.returncode != 0:
        sys.stderr.write((proc.stderr or "")[-2000:])
        raise SystemExit(proc.returncode)


if __name__ == "__main__":
    if "--entry-only" in sys.argv:
        # child mode: the only place jax is imported / a TPU client created
        warm_entry()
    else:
        # parent stays jax-free; each warm job gets its own short-lived client
        _run([sys.executable, os.path.abspath(__file__), "--entry-only"],
             "entry() warm")
        _run([sys.executable, os.path.join(HERE, "bench.py")], "bench.py warm")
