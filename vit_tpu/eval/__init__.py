"""Evaluation layer: golden-file comparator (replaces comparator.c)."""

from vit_tpu.eval.comparator import (
    ResultLine,
    compare_files,
    compare_results,
    format_result_line,
    parse_result_file,
    write_result_file,
)

__all__ = [
    "ResultLine",
    "compare_files",
    "compare_results",
    "format_result_line",
    "parse_result_file",
    "write_result_file",
]
