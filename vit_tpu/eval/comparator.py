"""Golden-file comparator.

Replaces comparator.c: the reference parses ``[i] label: %d / prob: %f``
lines from the program output and the golden file (parse_line,
comparator.c:11-14), requiring exact label match (comparator.c:64) and
absolute probability difference <= 0.01 (comparator.c:70).  The reference
only gates line 0 (``IMAGE_COUNT 1``, comparator.c:8); here the default is
*all* lines, with the count overridable for strict reference parity.

The line format contract (Main.c:71): ``[%d] label: %d / prob: %.6f``.
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path
from typing import List, Optional, Sequence

PROB_TOLERANCE = 0.01  # comparator.c:70

_LINE_RE = re.compile(
    r"^\[(\d+)\]\s*label:\s*(\d+)\s*/\s*prob:\s*([0-9.eE+-]+)\s*$"
)


@dataclasses.dataclass(frozen=True)
class ResultLine:
    index: int
    label: int
    prob: float


@dataclasses.dataclass(frozen=True)
class Mismatch:
    index: int
    kind: str  # 'label' | 'prob' | 'format' | 'missing'
    got: Optional[ResultLine]
    want: Optional[ResultLine]

    def __str__(self) -> str:
        return f"[{self.index}] {self.kind}: got {self.got}, want {self.want}"


def parse_line(line: str) -> Optional[ResultLine]:
    m = _LINE_RE.match(line.strip())
    if not m:
        return None
    try:
        prob = float(m.group(3))
    except ValueError:  # the char class admits strings float() rejects
        return None     # (e.g. '1.2.3', '1e+-3') — a format error, not a crash
    return ResultLine(int(m.group(1)), int(m.group(2)), prob)


_INDEX_PREFIX_RE = re.compile(r"^\[(\d+)\]")


def _parse_lines(path) -> tuple[List[ResultLine], List[int]]:
    """-> (parsed lines, indices of non-empty lines that failed to parse).
    A corrupt line's ``[i]`` prefix is salvaged when present (e.g.
    'prob: nan', which %.6f prints, still carries its index) so the format
    error lands in the same index space the comparison uses; only a line
    with no parseable prefix falls back to its ordinal position among
    non-empty lines."""
    lines: List[ResultLine] = []
    bad: List[int] = []
    ordinal = 0
    for raw in Path(path).read_text().splitlines():
        if not raw.strip():
            continue
        parsed = parse_line(raw)
        if parsed is None:
            prefix = _INDEX_PREFIX_RE.match(raw.strip())
            bad.append(int(prefix.group(1)) if prefix else ordinal)
        else:
            lines.append(parsed)
        ordinal += 1
    return lines, bad


def parse_result_file(path) -> List[ResultLine]:
    return _parse_lines(path)[0]


def format_result_line(index: int, label: int, prob: float) -> str:
    """Exact output format of the reference driver (Main.c:71)."""
    return f"[{index}] label: {label} / prob: {prob:.6f}"


def write_result_file(labels: Sequence[int], probs: Sequence[float], path) -> None:
    text = "".join(
        format_result_line(i, int(l), float(p)) + "\n"
        for i, (l, p) in enumerate(zip(labels, probs))
    )
    Path(path).write_text(text)


def compare_results(
    got: Sequence[ResultLine],
    want: Sequence[ResultLine],
    count: Optional[int] = None,
    prob_tolerance: float = PROB_TOLERANCE,
) -> List[Mismatch]:
    """Label exact + |dprob| <= tol, over the first ``count`` golden
    indices (default: all golden lines — stricter than the reference's 1).

    Rows pair by their PARSED [i] index, not list position, so one
    dropped/corrupt line misreports only itself — it cannot misalign
    every comparison after it."""
    want_by = {w.index: w for w in want}
    got_by = {g.index: g for g in got}
    indices = sorted(want_by) if count is None else range(count)
    errors: List[Mismatch] = []
    for i in indices:
        w = want_by.get(i)
        g = got_by.get(i)
        if w is None or g is None:
            errors.append(Mismatch(i, "missing", g, w))
            continue
        if g.label != w.label:
            errors.append(Mismatch(i, "label", g, w))
        elif abs(g.prob - w.prob) > prob_tolerance:
            errors.append(Mismatch(i, "prob", g, w))
    return errors


def compare_files(
    result_path,
    golden_path,
    count: Optional[int] = None,
    prob_tolerance: float = PROB_TOLERANCE,
) -> List[Mismatch]:
    got, got_bad = _parse_lines(result_path)
    want, want_bad = _parse_lines(golden_path)
    # corrupt lines surface as their own 'format' mismatches instead of
    # silently vanishing
    bad = set(got_bad) | set(want_bad)
    errors = [
        Mismatch(i, "format", None, None)
        for i in sorted(bad)
        if count is None or i < count
    ]
    # one error per corrupt line: the hole it leaves in the parsed rows
    # would ALSO report as 'missing' at the same index — drop the duplicate
    errors += [
        e
        for e in compare_results(
            got, want, count=count, prob_tolerance=prob_tolerance
        )
        if not (e.kind == "missing" and e.index in bad)
    ]
    return errors
