"""Comparator tests: format contract + tolerance semantics (comparator.c)."""

import numpy as np
import pytest

from vit_tpu.eval import comparator as C


def test_format_matches_reference():
    # Main.c:71 contract: "[%d] label: %d / prob: %.6f"
    assert C.format_result_line(0, 65, 0.919345) == "[0] label: 65 / prob: 0.919345"


def test_parse_roundtrip(tmp_path):
    path = tmp_path / "r.txt"
    C.write_result_file([65, 795], [0.919345, 0.824735], path)
    lines = C.parse_result_file(path)
    assert lines == [
        C.ResultLine(0, 65, 0.919345),
        C.ResultLine(1, 795, 0.824735),
    ]


def test_reference_artifact_passes_tolerance():
    # The reference's own artifacts: golden 0.919345 vs opencl 0.918015
    # (answer_result.txt:1 / opencl_result.txt:1) must pass at tol 0.01.
    got = [C.ResultLine(0, 65, 0.918015)]
    want = [C.ResultLine(0, 65, 0.919345)]
    assert C.compare_results(got, want) == []


def test_label_mismatch_fails():
    got = [C.ResultLine(0, 64, 0.919345)]
    want = [C.ResultLine(0, 65, 0.919345)]
    errs = C.compare_results(got, want)
    assert len(errs) == 1 and errs[0].kind == "label"


def test_prob_out_of_tolerance_fails():
    got = [C.ResultLine(0, 65, 0.93)]
    want = [C.ResultLine(0, 65, 0.919345)]
    errs = C.compare_results(got, want)
    assert len(errs) == 1 and errs[0].kind == "prob"


def test_missing_lines_fail():
    want = [C.ResultLine(0, 65, 0.9), C.ResultLine(1, 3, 0.5)]
    errs = C.compare_results([C.ResultLine(0, 65, 0.9)], want)
    assert len(errs) == 1 and errs[0].kind == "missing"


def test_count_limits_gate():
    # reference parity mode: IMAGE_COUNT 1 (comparator.c:8)
    got = [C.ResultLine(0, 65, 0.9), C.ResultLine(1, 99, 0.5)]
    want = [C.ResultLine(0, 65, 0.9), C.ResultLine(1, 3, 0.5)]
    assert C.compare_results(got, want, count=1) == []
    assert len(C.compare_results(got, want)) == 1


def test_real_golden_file_parses():
    import pathlib

    golden = pathlib.Path("/root/reference/Data/answer_result.txt")
    if not golden.exists():
        pytest.skip("reference golden file not mounted")
    lines = C.parse_result_file(golden)
    assert len(lines) == 100
    assert lines[0] == C.ResultLine(0, 65, 0.919345)


def test_compare_files(tmp_path):
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    C.write_result_file([1, 2], [0.5, 0.6], a)
    C.write_result_file([1, 2], [0.505, 0.595], b)
    assert C.compare_files(a, b) == []


def test_corrupt_line_reports_itself_not_misaligns(tmp_path):
    """A dropped/corrupt line ('prob: nan' — exactly what %.6f prints for
    NaN) must surface as its own format error and must NOT shift every
    later row: pairing is by the parsed [i] index, not list position."""
    from vit_tpu.eval.comparator import compare_files

    golden = tmp_path / "golden.txt"
    result = tmp_path / "result.txt"
    golden.write_text(
        "[0] label: 5 / prob: 0.900000\n[1] label: 6 / prob: 0.800000\n"
        "[2] label: 7 / prob: 0.700000\n[3] label: 8 / prob: 0.600000\n"
    )
    result.write_text(
        "[0] label: 5 / prob: 0.900000\n[1] label: 6 / prob: nan\n"
        "[2] label: 7 / prob: 0.700000\n[3] label: 8 / prob: 0.600000\n"
    )
    errors = compare_files(result, golden)
    kinds = {(e.index, e.kind) for e in errors}
    assert (1, "format") in kinds      # the bad row reports itself
    # ONE error per corrupt line: the hole it leaves must not also
    # double-report as 'missing' at the same index
    assert [e.index for e in errors] == [1]
    assert not any(e.index in (2, 3) for e in errors)  # no bogus shift


def test_corrupt_line_index_salvaged_from_prefix(tmp_path):
    """A corrupt line's [i] prefix places its format error at the REAL
    index (the same coordinate system the comparison uses), even when
    parsed indices are non-contiguous; only a line with no prefix falls
    back to its ordinal position."""
    from vit_tpu.eval.comparator import compare_files

    golden = tmp_path / "golden.txt"
    result = tmp_path / "result.txt"
    golden.write_text(
        "[10] label: 5 / prob: 0.900000\n[11] label: 6 / prob: 0.800000\n"
        "[12] label: 7 / prob: 0.700000\n"
    )
    result.write_text(
        "[10] label: 5 / prob: 0.900000\n[11] label: 6 / prob: nan\n"
        "total garbage line\n"
    )
    errors = compare_files(result, golden)
    by = {(e.index, e.kind) for e in errors}
    assert (11, "format") in by     # salvaged from the [11] prefix
    assert (3, "format") not in by  # NOT reported at a phantom ordinal
    assert (2, "format") in by      # prefixless garbage -> ordinal 2
    assert (12, "missing") in by    # [12] genuinely absent from result
    assert (11, "missing") not in by  # no duplicate for the corrupt row


def test_parse_line_rejects_unfloatable_prob():
    from vit_tpu.eval.comparator import parse_line

    assert parse_line("[0] label: 5 / prob: 1.2.3") is None
    assert parse_line("[0] label: 5 / prob: 1e+-3") is None
