"""adfmsl-analyze: score aggregation + tables + reference comparison.

Replaces score_file_processor.py's __main__ and the table half of
comprehensive_thesis_analyser.py (SURVEY.md 2.6)."""
from __future__ import annotations

import argparse
import os
import sys


def build_parser():
    p = argparse.ArgumentParser("adfmsl-analyze")
    p.add_argument("--scores_dir", required=True)
    p.add_argument("--protocol", required=True)
    p.add_argument("--output_dir", default="analysis_out")
    p.add_argument("--polarity", default="bonafide1", choices=["bonafide1", "spoof1"])
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from adfmsl.analysis import (
        ScoreFileProcessor,
        comparison_markdown,
        results_csv,
        results_latex,
    )

    proc = ScoreFileProcessor(args.scores_dir, args.protocol, args.polarity)
    processed = proc.process_all_scores()
    if not processed.per_model:
        print("no score files found under", args.scores_dir)
        return 1
    os.makedirs(args.output_dir, exist_ok=True)
    proc.export_for_thesis_analysis(
        processed, os.path.join(args.output_dir, "processed_performance_data.json"))
    with open(os.path.join(args.output_dir, "results.csv"), "w") as fh:
        fh.write(results_csv(processed.per_model))
    with open(os.path.join(args.output_dir, "results.tex"), "w") as fh:
        fh.write(results_latex(processed.per_model))
    with open(os.path.join(args.output_dir, "report.md"), "w") as fh:
        fh.write(comparison_markdown(processed.per_model))
    print(processed.summary())
    print(f"\nwrote JSON/CSV/LaTeX/markdown to {args.output_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
