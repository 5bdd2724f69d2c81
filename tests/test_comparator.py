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
