"""adfmsl-eval: standalone evaluation harness.

Replaces the per-model eval scripts (Maze{2,3,5,6,7,8}_Eval.py — SURVEY.md 2.6):
``--model_type mazeN|mazeN_fmsl --model_path <ckpt_dir>`` rebuilds the architecture,
restores the checkpoint, smoke-tests a synthetic forward pass (the reference's
test_model_forward_pass, Maze5_eval.py:269-320), streams the eval protocol, writes the
score file, and reports EER / min-DCF / min t-DCF.
"""
from __future__ import annotations

import argparse
import logging
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("adfmsl-eval")
    p.add_argument("--model_type", required=True, help="registry model name")
    p.add_argument("--model_path", default=None, help="checkpoint dir (optional)")
    p.add_argument("--protocol", required=True)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--pack", default=None,
                   help="packed-array prefix (adfmsl-pack) replacing --data_dir "
                        "— zero decode during evaluation")
    p.add_argument("--output", default=None, help="score file path")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--cut", type=int, default=None,
                   help="override fixed clip length in samples (default 64600)")
    p.add_argument("--no_drift", action="store_true")
    p.add_argument("--fused_frontend", action="store_true",
                   help="opt into the Pallas fused sinc front end (rawnet "
                        "models, batch <= 16); the default segmented NHC "
                        "composition measured faster at every batch (round 4)")
    p.add_argument("--no_fused_frontend", action="store_true",
                   help="(compat no-op: the fused front end is opt-in now)")
    p.add_argument("--no_fused_trunk", action="store_true",
                   help="disable the Pallas fused eval SE-ResBlock trunk")
    p.add_argument("--smoke_test", action="store_true",
                   help="synthetic forward-pass check before evaluation")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard eval batches over N devices (0/1 = single)")
    p.add_argument("--dump_embeddings", default=None, metavar="NPZ",
                   help="also save per-utterance pooled embeddings (+ FMSL "
                        "prototypes/class weights when present) for "
                        "adfmsl-analyze --embeddings")
    p.add_argument("--asv_scores", default=None, metavar="FILE",
                   help="organizers' ASV score file (target/nontarget/spoof "
                        "keys): derives the ASV operating point so min_tdcf "
                        "is the OFFICIAL computation")
    return p


def smoke_test(trainer) -> bool:
    """Synthetic forward (Maze5_eval.py:269-320 analog): shapes + finiteness."""
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, trainer.exp.data.cut)).astype(np.float32))
    out = trainer.eval_step(trainer.state, x, jnp.zeros(2, dtype=jnp.int32),
                            jnp.ones(2, dtype=bool))
    ok = (out["scores"].shape == (2,)
          and bool(np.isfinite(np.asarray(out["scores"])).all()))
    logging.info("smoke test %s: scores %s", "OK" if ok else "FAILED",
                 np.asarray(out["scores"]))
    return ok


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    from adfmsl.config import make_experiment
    from adfmsl.data import parse_protocol
    from adfmsl.evaluation import evaluate_to_file
    from adfmsl.train import Trainer, make_dataset_and_loader

    import os

    exp_yaml = (os.path.join(args.model_path, "experiment.yaml")
                if args.model_path else None)
    if exp_yaml and os.path.exists(exp_yaml):
        # checkpoints persist their full config (incl. reference-parity semantics
        # for ported torch checkpoints, cli/convert_maze.py)
        from adfmsl.config.yaml_io import load_yaml

        exp = load_yaml(exp_yaml)
        logging.info("loaded experiment config from %s", exp_yaml)
    else:
        exp = make_experiment(args.model_type, drift=not args.no_drift)
    if args.cut:
        exp.data.cut = args.cut
    from adfmsl.models.mazes import SPECS
    if SPECS.get(args.model_type):
        # Eval-only Pallas kernels (interpret-mode on non-TPU backends):
        # the fused SE-ResBlock trunk for models with an SE-residual stack is
        # the default; the fused sinc+|.|+pool3 front end became OPT-IN in
        # round 4 — the time-segmented NHC composition (ops/sinc.py:
        # sinc_abs_pool3_nhc_seg) beats the kernel at every batch (b8 3.20 vs
        # 3.54 ms, b16 4.23 vs 5.76). Training is unaffected. Reference-parity
        # checkpoints (ported torch weights, experiment.yaml from
        # adfmsl-convert-maze) promise f32 <=1e-3 logit parity — the bf16
        # kernels would silently break that, so never force them on for them.
        parity = (exp.model.architecture.block_semantics == "reference"
                  or exp.model.architecture.sinc_formula == "reference"
                  or exp.model.dtype == "float32")
        if SPECS[args.model_type].frontend == "rawnet":
            exp.model.extra["fused_eval_frontend"] = (
                args.fused_frontend and not args.no_fused_frontend
                and not parity)
        if (SPECS[args.model_type].blocks
                or SPECS[args.model_type].frontend == "rawnet"):
            exp.model.extra["fused_eval_trunk"] = (
                not args.no_fused_trunk and not parity)
    proto = parse_protocol(args.protocol, exp.data.label_polarity)
    if args.pack:
        from adfmsl.data import DataLoader, PackedDataset

        packed = PackedDataset(args.pack, proto)
        if packed.cut != exp.data.cut:
            (logging.warning if args.cut else logging.info)(
                "clip length comes from the pack: %d (config had %d%s)",
                packed.cut, exp.data.cut,
                " — the explicit --cut is overridden" if args.cut else "")
            exp.data.cut = packed.cut
        loader = DataLoader(packed, args.batch_size, shuffle=False,
                            drop_last=False, prefetch=exp.data.prefetch)
    elif args.data_dir:
        loader = make_dataset_and_loader(exp, proto, args.data_dir, shuffle=False,
                                         batch_size=args.batch_size,
                                         drop_last=False)
    else:
        build_parser().error("one of --data_dir or --pack is required")
    mesh = None
    if args.data_parallel > 1:
        import jax

        from adfmsl.config import MeshConfig
        from adfmsl.parallel import make_mesh

        mesh = make_mesh(MeshConfig(data_parallel=args.data_parallel),
                         devices=jax.devices()[: args.data_parallel])
    # Trainer(mesh=...) replicates params/batch_stats/opt_state over the mesh;
    # orbax restore preserves that placement (train/checkpoint.py template).
    trainer = Trainer(exp, loader, checkpoint_dir=args.model_path, mesh=mesh,
                      persist_config=False)   # never clobber the ckpt's config
    if args.model_path:
        trainer.state, epoch = trainer.ckpt.restore(trainer.state)
        logging.info("restored %s epoch %d", args.model_path, epoch)
    if args.smoke_test and not smoke_test(trainer):
        return 1
    out_path = args.output or f"{args.model_type}_scores.txt"
    # with --dump_embeddings the features ride the SAME forward pass (and the
    # same mesh sharding) as scoring — the protocol streams once, not twice.
    # Feature collection needs the runner's own step (it threads 'features'
    # through), so the trainer's step is only used for plain scoring.
    dump = bool(args.dump_embeddings)
    res = evaluate_to_file(trainer.state, loader, out_path,
                           labels=proto.labels or None,
                           eval_step=None if dump else trainer.eval_step,
                           mesh=mesh, collect_features=dump,
                           asv_scores=args.asv_scores)
    if res.metrics:
        print({k: round(v, 6) if isinstance(v, float) else v
               for k, v in res.metrics.items()})
    if args.dump_embeddings:
        extras = {}
        fmsl = trainer.state.params.get("fmsl")
        if fmsl is not None:
            # normalized, as the head uses them (heads/fmsl.py l2_normalize)
            for key, name in (("prototypes", "prototypes"),
                              ("weight", "class_weights")):
                v = np.asarray(fmsl.get(key)) if fmsl.get(key) is not None else None
                if v is not None:
                    extras[name] = v / (np.linalg.norm(v, axis=-1, keepdims=True)
                                        + 1e-12)
        np.savez(args.dump_embeddings, utt_ids=np.array(res.utt_ids),
                 features=res.features, scores=res.scores, **extras)
        logging.info("dumped %d embeddings (dim %d) to %s",
                     len(res.utt_ids), res.features.shape[-1],
                     args.dump_embeddings)
    return 0


if __name__ == "__main__":
    sys.exit(main())
