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


def have_full_artifacts(input_bin, golden, network, cfg) -> bool:
    """Activation predicate: every weight file present + input + golden."""
    if not (Path(input_bin).exists() and Path(golden).exists() and Path(network).exists()):
        return False
    from vit_tpu.io import weights as wio

    files = wio.scan_weight_dir(Path(network))
    return len(files) == len(wio.reference_tensor_specs(cfg))


def run_golden_gate(input_bin, golden, network, cfg, batch_pad=100):
    """The full gate: load real weights (NO synth fallback), classify the
    input batch, compare every line under comparator.c:64-70 semantics.
    Returns the mismatch list."""
    from vit_tpu.io import images as iio
    from vit_tpu.io import weights as wio
    from vit_tpu.runtime import InferenceEngine

    images = iio.load_image_bin(input_bin)
    params = wio.load_reference_weights(network, cfg, round_to_6dp=True)
    engine = InferenceEngine(cfg, params, dtype="float32", batch_pad=batch_pad)
    labels, probs = engine.classify(images)
    got = [C.ResultLine(i, int(l), float(p)) for i, (l, p) in enumerate(zip(labels, probs))]
    want = C.parse_result_file(golden)
    return C.compare_results(got, want)  # ALL lines, not just line 0


@pytest.mark.skipif(
    not have_full_artifacts(INPUT_BIN, GOLDEN, NETWORK, VIT_B_16),
    reason="full reference artifacts not present (stripped snapshot)",
)
def test_golden_end_to_end():
    mismatches = run_golden_gate(INPUT_BIN, GOLDEN, NETWORK, VIT_B_16)
    assert mismatches == [], mismatches


def test_golden_gate_fires_on_fabricated_complete_checkout(tmp_path, tiny_cfg):
    """Proves the latent gate's machinery end-to-end: fabricate a COMPLETE
    reference-layout checkout (all weight files + input bin + golden file)
    and the gate must activate, pass on a consistent golden, and fail on a
    corrupted one — so when the stripped blobs appear, the real gate
    provably fires."""
    from vit_tpu.io import images as iio
    from vit_tpu.io import weights as wio
    from vit_tpu.runtime import InferenceEngine

    network = tmp_path / "Network"
    input_bin = tmp_path / "Data" / "input-100.bin"
    golden = tmp_path / "Data" / "answer_result.txt"
    input_bin.parent.mkdir()
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=3), network, tiny_cfg
    )
    images = iio.synth_images(4, tiny_cfg, seed=4)
    iio.save_image_bin(images, input_bin)
    # golden produced by the engine itself => gate must report 0 mismatches
    params = wio.load_reference_weights(network, tiny_cfg, round_to_6dp=True)
    engine = InferenceEngine(tiny_cfg, params, dtype="float32", batch_pad=4)
    labels, probs = engine.classify(images)
    C.write_result_file(labels, probs, golden)

    assert have_full_artifacts(input_bin, golden, network, tiny_cfg)
    assert run_golden_gate(input_bin, golden, network, tiny_cfg, batch_pad=4) == []

    # corrupt one golden line -> the gate must catch exactly that line
    lines = golden.read_text().splitlines()
    lines[2] = "[2] label: 999 / prob: 0.500000"
    golden.write_text("\n".join(lines) + "\n")
    mismatches = run_golden_gate(input_bin, golden, network, tiny_cfg, batch_pad=4)
    assert len(mismatches) == 1 and mismatches[0].index == 2

    # incomplete checkout (one weight file removed) -> gate stays latent
    some_file = next(network.glob("Weight_5_*.bin"))
    some_file.unlink()
    assert not have_full_artifacts(input_bin, golden, network, tiny_cfg)


@pytest.mark.skipif(not GOLDEN.exists(), reason="golden file not mounted")
def test_golden_file_statistics():
    # Sanity on the golden artifact itself: 100 lines, labels in range,
    # probs in (0, 1]; line 0 is the documented sea-snake case.
    want = C.parse_result_file(GOLDEN)
    assert len(want) == 100
    assert all(0 <= l.label < 1000 for l in want)
    assert all(0.0 < l.prob <= 1.0 for l in want)
    assert want[0].label == 65 and abs(want[0].prob - 0.919345) < 1e-9
