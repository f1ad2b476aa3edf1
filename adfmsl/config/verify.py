"""Configuration consistency verifier.

The reference verifies "standardization" by regex/AST-scraping hyperparameters back out
of 16 source files (``verify_maze_configurations.py:11-178``, ``check_maze_consistency.py``,
``analyze_maze_configurations.py``) because every script hard-codes its own dict. With
a single typed config tree the verifier becomes structural: diff each registry model's
config against the canonical contract and report per-key status plus baseline-vs-FMSL
pair consistency.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Tuple

from adfmsl.config.standardized import (
    ALL_MODELS,
    BASELINE_MODELS,
    FMSL_DRIFT,
    make_experiment,
)

# Keys that must match across every model for a fair comparison
# (standardized_maze_config.py architecture+training blocks).
CANONICAL_KEYS = [
    "filts", "nb_fc_node", "nb_classes", "sample_rate", "first_conv", "dropout_rate",
    "fc_dropout", "batch_size", "lr", "weight_decay", "grad_clip_norm", "num_epochs",
    "seed",
]
FMSL_KEYS = ["fmsl_type", "fmsl_n_prototypes", "fmsl_s", "fmsl_m", "fmsl_enable_lsa"]


@dataclass
class VerificationReport:
    per_model: Dict[str, Dict[str, Tuple[Any, Any, bool]]] = field(default_factory=dict)
    pair_consistent: Dict[str, bool] = field(default_factory=dict)
    fmsl_drift: Dict[str, Dict[str, Tuple[Any, Any]]] = field(default_factory=dict)
    opt_drift: Dict[str, Dict[str, Tuple[Any, Any]]] = field(default_factory=dict)

    @property
    def all_canonical_ok(self) -> bool:
        return all(ok for m in self.per_model.values() for (_, _, ok) in m.values())

    def summary(self) -> str:
        lines = ["CONFIG VERIFICATION", "=" * 50]
        for model, keys in self.per_model.items():
            bad = [k for k, (_, _, ok) in keys.items() if not ok]
            lines.append(f"{model:16s} {'OK' if not bad else 'MISMATCH: ' + ', '.join(bad)}")
        lines.append("-" * 50)
        for pair, ok in self.pair_consistent.items():
            lines.append(f"pair {pair:16s} {'consistent' if ok else 'INCONSISTENT'}")
        if self.fmsl_drift:
            lines.append("-" * 50)
            lines.append("FMSL drift vs canonical (reference-faithful, drift=True):")
            for model, keys in self.fmsl_drift.items():
                kv = ", ".join(f"{k}: {c} -> {v}" for k, (c, v) in keys.items())
                lines.append(f"  {model}: {kv}")
        if self.opt_drift:
            lines.append("-" * 50)
            lines.append("Optimizer drift vs standardized claim (drift=True):")
            for model, keys in self.opt_drift.items():
                kv = ", ".join(f"{k}: {c} -> {v}" for k, (c, v) in keys.items())
                lines.append(f"  {model}: {kv}")
        return "\n".join(lines)


def verify_all(drift: bool = True) -> VerificationReport:
    report = VerificationReport()
    canonical = make_experiment("maze5").to_reference_dict()
    canonical_fmsl = make_experiment("maze3_fmsl", drift=False).to_reference_dict()

    for name in ALL_MODELS:
        # canonical check is against the standardization CLAIM (drift=False);
        # drift=True's deltas are reported separately below rather than
        # flagged as mismatches — the reference files genuinely disagree with
        # their own standardized_maze_config.py (lr, clip presence, FMSL s/m)
        d = make_experiment(name, drift=False).to_reference_dict()
        report.per_model[name] = {
            k: (canonical[k], d.get(k), d.get(k) == canonical[k]) for k in CANONICAL_KEYS
        }
        if drift:
            dd = make_experiment(name, drift=True).to_reference_dict()
            opt_keys = ["lr", "weight_decay", "grad_clip_norm"]
            drifted = {k: (d.get(k), dd.get(k)) for k in opt_keys
                       if dd.get(k) != d.get(k)}
            if drifted:
                report.opt_drift[name] = drifted
        if name.endswith("_fmsl"):
            df = make_experiment(name, drift=drift).to_reference_dict()
            drifted = {}
            for k in FMSL_KEYS:
                if df.get(k) != canonical_fmsl.get(k):
                    drifted[k] = (canonical_fmsl.get(k), df.get(k))
            if drifted:
                report.fmsl_drift[name] = drifted

    for base in BASELINE_MODELS:
        b = make_experiment(base, drift=False).to_reference_dict()
        f = make_experiment(f"{base}_fmsl", drift=False).to_reference_dict()
        report.pair_consistent[f"{base}/+fmsl"] = all(
            b[k] == f[k] for k in CANONICAL_KEYS
        )
    return report
