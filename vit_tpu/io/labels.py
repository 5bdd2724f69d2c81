"""ImageNet class-name table.

The reference hard-codes a 1000-entry ``imagenet_label`` C string array in
Main.c:14-16 (one giant line).  Rather than embed that data here, this module
loads class names from (in priority order):

  1. an explicit text file (one name per line),
  2. a C source file containing a string-array literal (e.g. the reference's
     own Main.c, parsed read-only at runtime),
  3. a ``class_{i}`` placeholder fallback.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import List, Optional

_DEFAULT_C_SOURCES = (Path("/root/reference/Main.c"),)


def load_labels(
    path: Optional[str] = None, num_classes: int = 1000
) -> List[str]:
    if path is not None:
        p = Path(path)
        if p.suffix == ".c":
            labels = _parse_c_string_array(p.read_text(errors="replace"))
        else:
            labels = [ln.strip() for ln in p.read_text().splitlines() if ln.strip()]
        if len(labels) >= num_classes:
            return labels[:num_classes]
        raise ValueError(f"{path}: found {len(labels)} labels, need {num_classes}")
    for src in _DEFAULT_C_SOURCES:
        if src.exists():
            labels = _parse_c_string_array(src.read_text(errors="replace"))
            if len(labels) >= num_classes:
                return labels[:num_classes]
    return [f"class_{i}" for i in range(num_classes)]


def _parse_c_string_array(text: str) -> List[str]:
    """Extract the longest brace-delimited array of C string literals."""
    best: List[str] = []
    for m in re.finditer(r"\{((?:\s*\"(?:[^\"\\]|\\.)*\"\s*,?)+)\}", text):
        strings = re.findall(r"\"((?:[^\"\\]|\\.)*)\"", m.group(1))
        if len(strings) > len(best):
            best = strings
    return [s.replace('\\"', '"') for s in best]
