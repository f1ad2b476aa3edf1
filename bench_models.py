"""Per-model TPU throughput survey (NOT run by the driver — bench.py is the
one-line contract; this records the maze-zoo numbers for docs/PERF.md).

Usage: python bench_models.py [model ...]   (default: maze5 main maze7)
Prints one JSON line per model: eval and train utt/s/chip on 4 s clips.
First compile of a maze model on TPU takes minutes; the persistent XLA cache
(adfmsl/__init__) makes reruns instant.
"""
from __future__ import annotations

import functools
import json
import sys

import numpy as np

from bench import _time_one_sync   # the axon-tunnel timing rule lives in ONE place
from bench import PEAK_BF16_FLOPS

CUT = 64600
N_EVAL = 16
N_TRAIN = 8


def _mfu_pct(jitted_lowerable, dt_per_iter):
    """% of v5e bf16 peak for ONE iteration of the lowered program. XLA's
    cost_analysis counts a lax.scan body once regardless of trip count, so the
    caller lowers a length-1 program and passes the measured per-iteration time
    (bench.py MFU trick)."""
    try:
        ca = jitted_lowerable.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            return round(100.0 * flops / dt_per_iter / PEAK_BF16_FLOPS, 2)
    except Exception:
        pass
    return None


def bench_model(name: str, batch_eval: int = 64, batch_train: int = 16):
    import jax
    import jax.numpy as jnp
    import optax

    from adfmsl.config import make_experiment
    from adfmsl.heads.losses import compute_loss
    from adfmsl.models import build_model

    from adfmsl.models.mazes import SPECS

    exp = make_experiment(name)
    # w2v2 models run the FULL architecture at random init (throughput is
    # weight-independent; no local checkpoint needed)
    # (the Pallas fused sinc front end became opt-in in round 4 — the
    # segmented NHC composition wins at every batch; adfmsl-eval default)
    # production eval path: folded bf16 trunk (adfmsl-eval default)
    if SPECS.get(name) and (SPECS[name].blocks
                            or SPECS[name].frontend == "rawnet"):
        exp.model.extra["fused_eval_trunk"] = True
    model = build_model(exp.model)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    x = jnp.asarray(rng.standard_normal((batch_eval, CUT)).astype(np.float32))
    variables = model.init({"params": key}, x, train=False)

    @functools.partial(jax.jit, static_argnums=2)
    def fwd_many(v, x, n):
        def body(carry, _):
            out = model.apply(v, x + carry * 1e-30, train=False)["scores"]
            return out[0].astype(jnp.float32), out.sum()
        carry, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry + sums.sum()

    dt_eval = _time_one_sync(lambda: fwd_many(variables, x, N_EVAL))
    eval_rate = batch_eval * N_EVAL / dt_eval
    eval_mfu = _mfu_pct(jax.jit(fwd_many, static_argnums=2).lower(
        variables, x, 1), dt_eval / N_EVAL)

    xt = jnp.asarray(rng.standard_normal((batch_train, CUT)).astype(np.float32))
    labels = jnp.asarray(np.arange(batch_train) % 2, dtype=jnp.int32)
    vt = model.init({"params": key}, xt, train=False)
    tx = optax.adam(1e-4)
    from adfmsl.train.steps import fast_bits_key

    rngs = {"dropout": fast_bits_key(key),
            "specaugment": fast_bits_key(jax.random.PRNGKey(1)),
            "lsa": fast_bits_key(jax.random.PRNGKey(2))}

    @functools.partial(jax.jit, static_argnums=1)
    def train_many(carry0, n):
        def loss_fn(p, bstats, xb):
            out, mut = model.apply({"params": p, "batch_stats": bstats}, xb,
                                   labels=labels, train=True, rngs=rngs,
                                   mutable=["batch_stats"])
            loss = out.get("loss")
            if loss is None:
                loss = compute_loss("weighted_ce", out["logits"], labels,
                                    class_weights=[0.3, 0.7])
            return loss, mut.get("batch_stats", bstats)

        def body(carry, _):
            p, bstats, opt, last = carry
            (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, bstats, xt + last * 1e-30)
            updates, nopt = tx.update(grads, opt, p)
            return (optax.apply_updates(p, updates), nbs, nopt, loss), loss
        carry, losses = jax.lax.scan(body, carry0, None, length=n)
        return losses.sum()

    carry0 = (vt["params"], vt.get("batch_stats", {}), tx.init(vt["params"]),
              jnp.float32(0.0))
    dt_train = _time_one_sync(lambda: train_many(carry0, N_TRAIN))
    train_rate = batch_train * N_TRAIN / dt_train
    train_mfu = _mfu_pct(jax.jit(train_many, static_argnums=1).lower(
        carry0, 1), dt_train / N_TRAIN)
    return eval_rate, train_rate, eval_mfu, train_mfu


def bench_episodic(batch_eval: int = 4):
    """BASELINE config #3: 2-way 5-shot prototypical episodes, vmap-batched
    through the maze5 trunk (support+query embed, prototype computation,
    distance logits, full backward + adam). Reports episodes/s and utt/s."""
    import jax
    import jax.numpy as jnp
    import optax

    from adfmsl.config import make_experiment
    from adfmsl.heads.episodic import make_episodic_train_step

    exp = make_experiment("maze5")
    model_name = "maze5"
    from adfmsl.models import build_model

    # production embed path: the folded bf16 eval trunk is differentiable
    # (pure XLA affine/conv composition) — grads flow to the conv/BN params;
    # measured +28% on the full episodic step at loss parity ~1e-4
    exp.model.extra["fused_eval_trunk"] = True
    model = build_model(exp.model)
    n_way, k_shot, q_queries, eps = 2, 5, 5, batch_eval
    rng = np.random.default_rng(0)
    support = jnp.asarray(rng.standard_normal(
        (eps, n_way, k_shot, CUT)).astype(np.float32))
    query = jnp.asarray(rng.standard_normal(
        (eps, n_way, q_queries, CUT)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((2, CUT)), train=False)
    bstats = variables.get("batch_stats")

    def embed(params, audio):
        v = {"params": params}
        if bstats is not None:
            v["batch_stats"] = bstats
        return model.apply(v, audio, train=False)["features"]

    tx = optax.adam(1e-3)
    step = make_episodic_train_step(embed, tx, 10.0, "cosine")
    params, opt = variables["params"], tx.init(variables["params"])

    @functools.partial(jax.jit, static_argnums=2)
    def many(params, opt, n):
        def body(carry, _):
            p, o, last = carry
            p2, o2, _, m = step(p, o, support + last * 1e-30, query)
            return (p2, o2, m["loss"]), m["loss"]
        (p, o, last), losses = jax.lax.scan(body, (params, opt, jnp.float32(0.0)),
                                            None, length=n)
        return losses.sum()

    iters = 8
    dt = _time_one_sync(lambda: many(params, opt, iters))
    utts = eps * n_way * (k_shot + q_queries)
    return {"model": f"episodic_{model_name}",
            "episodes_s_chip": round(eps * iters / dt, 2),
            "utt_s_chip": round(utts * iters / dt, 1),
            "note": f"{n_way}-way {k_shot}-shot +{q_queries}q, "
                    f"{eps} episodes/batch, full train step"}


def build_needs_w2v2(name: str) -> bool:
    from adfmsl.models.mazes import SPECS

    return name in SPECS and SPECS[name].frontend == "w2v2"


def main():
    models = sys.argv[1:] or ["maze5", "main", "maze7"]
    for token in models:
        if token == "episodic":
            print(json.dumps(bench_episodic()))
            continue
        # optional per-model batch override: name@batch_eval[:batch_train]
        name, be, bt = token, 64, 16
        if "@" in token:
            name, spec = token.split("@", 1)
            parts = spec.split(":")
            be = int(parts[0])
            if len(parts) > 1:
                bt = int(parts[1])
        ev, tr, emfu, tmfu = bench_model(name, batch_eval=be, batch_train=bt)
        print(json.dumps({"model": name, "batch_eval": be, "batch_train": bt,
                          "eval_utt_s_chip": round(ev, 1),
                          "train_utt_s_chip": round(tr, 1),
                          "eval_mfu_pct": emfu, "train_mfu_pct": tmfu,
                          "note": ("full arch, random-init w2v2 backbone" if
                                   build_needs_w2v2(name) else "full size")}))


if __name__ == "__main__":
    main()
