"""Golden end-to-end gate vs the reference's artifacts.

Activates only when the real artifacts exist (this snapshot strips
input-100.bin and the 36 large weight blobs — .MISSING_LARGE_BLOBS — so the
full gate cannot run here; the structure is in place for a complete
checkout).  Mirrors comparator.c semantics over ALL 100 lines.
"""

from pathlib import Path

import numpy as np
import pytest

from vit_tpu.config import VIT_B_16
from vit_tpu.eval import comparator as C

REF = Path("/root/reference")
INPUT_BIN = REF / "Data" / "input-100.bin"
GOLDEN = REF / "Data" / "answer_result.txt"
NETWORK = REF / "Network"


def _have_full_artifacts() -> bool:
    if not (INPUT_BIN.exists() and GOLDEN.exists() and NETWORK.exists()):
        return False
    from vit_tpu.io import weights as wio

    files = wio.scan_weight_dir(NETWORK)
    return len(files) == 152


@pytest.mark.skipif(
    not _have_full_artifacts(),
    reason="full reference artifacts not present (stripped snapshot)",
)
def test_golden_end_to_end():
    from vit_tpu.io import images as iio
    from vit_tpu.io import weights as wio
    from vit_tpu.runtime import InferenceEngine

    images = iio.load_image_bin(INPUT_BIN)
    params = wio.load_reference_weights(NETWORK, VIT_B_16, round_to_6dp=True)
    engine = InferenceEngine(VIT_B_16, params, dtype="float32", batch_pad=100)
    labels, probs = engine.classify(images)
    got = [C.ResultLine(i, int(l), float(p)) for i, (l, p) in enumerate(zip(labels, probs))]
    want = C.parse_result_file(GOLDEN)
    mismatches = C.compare_results(got, want)  # ALL 100 lines, not just line 0
    assert mismatches == [], mismatches


@pytest.mark.skipif(not GOLDEN.exists(), reason="golden file not mounted")
def test_golden_file_statistics():
    # Sanity on the golden artifact itself: 100 lines, labels in range,
    # probs in (0, 1]; line 0 is the documented sea-snake case.
    want = C.parse_result_file(GOLDEN)
    assert len(want) == 100
    assert all(0 <= l.label < 1000 for l in want)
    assert all(0.0 < l.prob <= 1.0 for l in want)
    assert want[0].label == 65 and abs(want[0].prob - 0.919345) < 1e-9
