"""adfmsl-train: the CLI entry point replacing each maze script's argparse block
(maze2.py:378-396 flag contract: --database_path, --protocols_path, --batch_size,
--lr, --num_epochs, --seed, --eval, --eval_output, --track, --model_path) plus
--model to select any registry architecture and --config for YAML."""
from __future__ import annotations

import argparse
import logging
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("adfmsl-train")
    p.add_argument("--model", default="maze5", help="registry model name")
    p.add_argument("--config", default=None, help="YAML ExperimentConfig path")
    # None (not the reference's "data/"/"protocols/" literals) so a --config
    # YAML's paths are not clobbered by argparse defaults; the reference
    # defaults apply only when neither source names a path.
    p.add_argument("--database_path", required=False, default=None)
    p.add_argument("--protocols_path", required=False, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--track", default="LA", choices=["LA", "PA", "DF"])
    p.add_argument("--eval", action="store_true", help="produce score file and exit")
    p.add_argument("--eval_output", default="scores.txt")
    p.add_argument("--eval_protocol", default=None)
    p.add_argument("--eval_dir", default=None)
    p.add_argument("--train_protocol", default=None)
    p.add_argument("--train_dir", default=None)
    p.add_argument("--dev_protocol", default=None)
    p.add_argument("--dev_dir", default=None)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--restore", action="store_true",
                   help="resume from latest checkpoint in --checkpoint_dir")
    p.add_argument("--no_drift", action="store_true",
                   help="use canonical FMSL params instead of reference drift")
    p.add_argument("--profile_dir", default=None,
                   help="capture an XLA profiler trace of the first epoch here")
    p.add_argument("--log_dir", default=None,
                   help="JSONL scalar metrics directory (tensorboardX analog)")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard training batches over N devices "
                        "(0/1 = single device)")
    p.add_argument("--train_pack", default=None,
                   help="packed-array prefix (adfmsl-pack) replacing the train "
                        "audio dir — zero decode per epoch")
    p.add_argument("--dev_pack", default=None)
    p.add_argument("--eval_pack", default=None,
                   help="packed-array prefix for the --eval protocol split")
    return p


def _default_paths(exp, split: str, tag: str):
    track = exp.data.track
    proto = os.path.join(
        exp.data.protocols_path, f"ASVspoof2019.{track}.cm.{split}.{tag}.txt")
    audio = os.path.join(exp.data.database_path, f"ASVspoof2019_{track}_{split}")
    return proto, audio


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    args = build_parser().parse_args(argv)

    from adfmsl.config import load_yaml, make_experiment
    from adfmsl.data import parse_protocol
    from adfmsl.evaluation import evaluate_to_file
    from adfmsl.train import Trainer, make_dataset_and_loader

    if args.config:
        exp = load_yaml(args.config)
    else:
        exp = make_experiment(args.model, drift=not args.no_drift)
    for flag, path in [("batch_size", "train.batch_size"), ("lr", "train.optimizer.lr"),
                       ("num_epochs", "train.num_epochs"), ("seed", "train.seed")]:
        v = getattr(args, flag)
        if v is not None:
            obj = exp
            parts = path.split(".")
            for q in parts[:-1]:
                obj = getattr(obj, q)
            setattr(obj, parts[-1], v)
    if args.database_path is not None:
        exp.data.database_path = args.database_path
    elif not exp.data.database_path:
        exp.data.database_path = "data/"
    if args.protocols_path is not None:
        exp.data.protocols_path = args.protocols_path
    elif not exp.data.protocols_path:
        exp.data.protocols_path = "protocols/"
    exp.data.track = args.track

    train_proto_path = args.train_protocol or _default_paths(exp, "train", "trn")[0]
    train_dir = args.train_dir or _default_paths(exp, "train", "trn")[1]
    dev_proto_path = args.dev_protocol or _default_paths(exp, "dev", "trl")[0]
    dev_dir = args.dev_dir or _default_paths(exp, "dev", "trl")[1]

    from adfmsl.data import DataLoader, PackedDataset

    train_proto = parse_protocol(train_proto_path, exp.data.label_polarity)
    if args.train_pack:
        packed = PackedDataset(args.train_pack, train_proto)
        if packed.cut != exp.data.cut:
            logging.info("clip length from pack: %d", packed.cut)
            exp.data.cut = packed.cut
        train_loader = DataLoader(packed, exp.train.batch_size, shuffle=True,
                                  drop_last=True, seed=exp.train.seed,
                                  prefetch=exp.data.prefetch)
    else:
        train_loader = make_dataset_and_loader(exp, train_proto, train_dir,
                                               shuffle=True)
    dev_loader = None
    if args.dev_pack:
        dev_proto = parse_protocol(dev_proto_path, exp.data.label_polarity)
        dev_loader = DataLoader(PackedDataset(args.dev_pack, dev_proto),
                                exp.train.eval_batch_size, shuffle=False,
                                drop_last=False, prefetch=exp.data.prefetch)
    elif os.path.exists(dev_proto_path):
        dev_proto = parse_protocol(dev_proto_path, exp.data.label_polarity)
        dev_loader = make_dataset_and_loader(exp, dev_proto, dev_dir, shuffle=False,
                                             batch_size=exp.train.eval_batch_size,
                                             drop_last=False)

    metric_hook = None
    if args.log_dir:
        from adfmsl.utils import MetricsLogger

        mlog = MetricsLogger(args.log_dir)

        def metric_hook(em):
            mlog.add_scalars({"train/loss": em.train_loss,
                              "train/acc": em.train_acc,
                              "dev/acc": em.dev_acc}, em.epoch)

    mesh = None
    if args.data_parallel > 1:
        import jax

        from adfmsl.config import MeshConfig
        from adfmsl.parallel import make_mesh

        mesh = make_mesh(MeshConfig(data_parallel=args.data_parallel),
                         devices=jax.devices()[: args.data_parallel])
        logging.info("data-parallel training over %d devices",
                     args.data_parallel)

    trainer = Trainer(exp, train_loader, dev_loader,
                      checkpoint_dir=args.checkpoint_dir,
                      metric_hook=metric_hook, mesh=mesh,
                      persist_config=not args.eval)
    if args.restore and args.checkpoint_dir:
        trainer.state, epoch = trainer.ckpt.restore(trainer.state)
        trainer.epochs_run = epoch + 1     # resume epoch numbering/RNG streams
        logging.info("restored checkpoint epoch %d", epoch)

    if args.eval:
        eval_proto_path = args.eval_protocol or _default_paths(exp, "eval", "trl")[0]
        eval_dir = args.eval_dir or _default_paths(exp, "eval", "trl")[1]
        eval_proto = parse_protocol(eval_proto_path, exp.data.label_polarity)
        if args.eval_pack:
            loader = DataLoader(PackedDataset(args.eval_pack, eval_proto),
                                exp.train.eval_batch_size, shuffle=False,
                                drop_last=False, prefetch=exp.data.prefetch)
        else:
            loader = make_dataset_and_loader(exp, eval_proto, eval_dir,
                                             shuffle=False,
                                             batch_size=exp.train.eval_batch_size,
                                             drop_last=False)
        res = evaluate_to_file(trainer.state, loader, args.eval_output,
                               labels=eval_proto.labels or None,
                               eval_step=trainer.eval_step, mesh=mesh)
        if res.metrics:
            print({k: round(v, 6) if isinstance(v, float) else v
                   for k, v in res.metrics.items()})
        return 0

    if args.profile_dir:
        from adfmsl.utils import trace

        with trace(args.profile_dir):
            trainer.fit(num_epochs=1)
        trainer.fit(num_epochs=max(exp.train.num_epochs - 1, 0))
    else:
        trainer.fit()
    logging.info("step timing:\n%s", trainer.timer.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
