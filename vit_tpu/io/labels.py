"""ImageNet class-name table.

The reference hard-codes a 1000-entry ``imagenet_label`` C string array in
Main.c:14-16 (one giant line).  The framework ships the standard public
ImageNet-1k class list as a packaged asset (``data/imagenet_labels.txt``) so
deployments are self-contained; sources are resolved in priority order:

  1. an explicit text file (one name per line) or C source file containing a
     string-array literal,
  2. the packaged ImageNet-1k asset (when it covers ``num_classes``),
  3. a C source named by ``$VIT_TPU_LABELS_SOURCE`` (e.g. a checkout of the
     reference's Main.c, parsed read-only at runtime),
  4. a ``class_{i}`` placeholder fallback.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import List, Optional

_PACKAGED_LABELS = Path(__file__).parent / "data" / "imagenet_labels.txt"


def load_labels(
    path: Optional[str] = None, num_classes: int = 1000
) -> List[str]:
    if path is not None:
        labels = _load_source(Path(path))
        if len(labels) >= num_classes:
            return labels[:num_classes]
        raise ValueError(f"{path}: found {len(labels)} labels, need {num_classes}")
    for src in (_PACKAGED_LABELS, os.environ.get("VIT_TPU_LABELS_SOURCE")):
        if src and Path(src).exists():
            labels = _load_source(Path(src))
            if len(labels) >= num_classes:
                return labels[:num_classes]
    return [f"class_{i}" for i in range(num_classes)]


def _load_source(p: Path) -> List[str]:
    if p.suffix == ".c":
        return _parse_c_string_array(p.read_text(errors="replace"))
    return [ln.strip() for ln in p.read_text().splitlines() if ln.strip()]


def _parse_c_string_array(text: str) -> List[str]:
    """Extract the longest brace-delimited array of C string literals."""
    best: List[str] = []
    for m in re.finditer(r"\{((?:\s*\"(?:[^\"\\]|\\.)*\"\s*,?)+)\}", text):
        strings = re.findall(r"\"((?:[^\"\\]|\\.)*)\"", m.group(1))
        if len(strings) > len(best):
            best = strings
    return [s.replace('\\"', '"') for s in best]
