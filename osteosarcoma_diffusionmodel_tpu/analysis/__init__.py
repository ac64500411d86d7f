from .report import AnalysisReport, embed_2d, grade, kaplan_meier, write_summary_report

__all__ = [
    "AnalysisReport",
    "embed_2d",
    "grade",
    "kaplan_meier",
    "write_summary_report",
]
