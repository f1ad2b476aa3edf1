"""adfmsl-convert-maze: port a reference torch ``.pth`` maze checkpoint into an
adfmsl checkpoint directory that ``adfmsl-eval --model_path`` restores directly.

The reference's eval scripts rebuild the torch model and
``load_state_dict(strict=False)`` (Maze5_eval.py:321, comprehensive_evaluation.py:
411-435); this is the cross-framework analog. The emitted ``experiment.yaml``
carries the reference-parity semantics knobs (sinc_formula/block_semantics =
'reference', f32 trunk) so the ported weights evaluate bit-comparably.
"""
from __future__ import annotations

import argparse
import logging
import sys


def build_parser():
    p = argparse.ArgumentParser("adfmsl-convert-maze")
    p.add_argument("--torch_ckpt", required=True, help=".pth/.pt state dict")
    p.add_argument("--model_type", required=True,
                   help="registry name — all 16 reference models supported "
                        "(main/maze2..8 and their _fmsl variants; maze2_fmsl "
                        "ports under fixed head semantics, models/port.py)")
    p.add_argument("--out", required=True, help="output checkpoint directory")
    p.add_argument("--no_drift", action="store_true")
    p.add_argument("--cut", type=int, default=64600,
                   help="clip length stored in the emitted experiment.yaml")
    return p


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    import os

    import jax
    import numpy as np

    from adfmsl.config.yaml_io import save_yaml
    from adfmsl.models import build_model
    from adfmsl.models.port import (load_torch_state_dict, merge_params,
                                    port_maze_state_dict,
                                    reference_parity_experiment)
    from adfmsl.train import TrainState, make_optimizer
    from adfmsl.train.checkpoint import CheckpointManager

    exp = reference_parity_experiment(args.model_type, drift=not args.no_drift)
    exp.data.cut = args.cut
    sd = load_torch_state_dict(args.torch_ckpt)
    ported_params, ported_stats, report = port_maze_state_dict(sd, args.model_type)
    if report.get("gru_layers"):
        exp.model.architecture.nb_gru_layer = report["gru_layers"]
    if report["missing"]:
        logging.warning("missing torch keys (kept init values): %s",
                        report["missing"])
    if report["unconsumed"]:
        logging.warning("unconsumed torch keys: %s", report["unconsumed"])

    model = build_model(exp.model)
    x = np.zeros((2, exp.data.cut), dtype=np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jax.numpy.asarray(x), train=False)
    params = merge_params(variables["params"], ported_params)
    stats = merge_params(variables.get("batch_stats", {}), ported_stats)

    tx, _ = make_optimizer(exp, steps_per_epoch=1)
    state = TrainState.create(model.apply, params, stats or None, tx)
    ckpt = CheckpointManager(args.out)
    ckpt.save(0, state, {"dev_acc": 0.0})
    ckpt.close()
    save_yaml(exp, os.path.join(os.path.abspath(args.out), "experiment.yaml"))
    print(f"ported {args.torch_ckpt} ({args.model_type}) -> {args.out} "
          f"[missing={len(report['missing'])} unconsumed={len(report['unconsumed'])}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
