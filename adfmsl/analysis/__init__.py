from adfmsl.analysis.processor import (
    ProcessedScores,
    ScoreFileProcessor,
    model_name_from_filename,
)
from adfmsl.analysis.report import (
    REFERENCE_RESULTS,
    comparison_markdown,
    results_csv,
    results_latex,
)

__all__ = [
    "ProcessedScores", "ScoreFileProcessor", "model_name_from_filename",
    "REFERENCE_RESULTS", "comparison_markdown", "results_csv", "results_latex",
]
