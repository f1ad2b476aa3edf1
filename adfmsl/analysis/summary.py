"""Model structure analysis: parameter counts per module, checkpoint compatibility.

Rebuild of the eval scripts' ``analyze_model_structure`` (Maze5_eval.py:227) and
``check_model_compatibility`` (:321 — state-dict key diffing with missing/unexpected
reporting, the load_state_dict(strict=False) workflow at
comprehensive_evaluation.py:411-435).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def count_params(tree: Any) -> int:
    import jax

    return sum(int(np.prod(np.asarray(l).shape))
               for l in jax.tree_util.tree_leaves(tree))


def model_summary(params: Dict[str, Any], max_depth: int = 2) -> str:
    """Per-module parameter counts, reference analyze_model_structure analog."""
    import jax

    rows: List[Tuple[str, int]] = []

    def walk(prefix: str, node: Any, depth: int):
        if depth >= max_depth or not isinstance(node, dict):
            rows.append((prefix, count_params(node)))
            return
        for k in sorted(node):
            walk(f"{prefix}/{k}" if prefix else k, node[k], depth + 1)

    walk("", params, 0)
    total = count_params(params)
    lines = [f"{'module':40s} {'params':>12s}", "-" * 54]
    for name, n in rows:
        lines.append(f"{name:40s} {n:12,d}")
    lines += ["-" * 54, f"{'TOTAL':40s} {total:12,d}"]
    return "\n".join(lines)


def check_compatibility(params: Dict[str, Any], restored: Dict[str, Any]
                        ) -> Dict[str, List[str]]:
    """Diff two param trees by path: missing / unexpected / shape-mismatched keys
    (strict=False load tolerance with reporting)."""
    import jax

    def flat(tree):
        return {jax.tree_util.keystr(k): np.asarray(v).shape
                for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    a, b = flat(params), flat(restored)
    return {
        "missing": sorted(set(a) - set(b)),
        "unexpected": sorted(set(b) - set(a)),
        "shape_mismatch": sorted(k for k in set(a) & set(b) if a[k] != b[k]),
    }
