"""Differential gate over the REAL reference weight files.

The snapshot mounts 115 of the 152 `Weight_*.bin` blobs (the 37 largest are
stripped, listed in `.MISSING_LARGE_BLOBS`).  These tests consume every real
tensor that IS present:

  - per-file load bit-exactness: NumPy raw read + round6 (Network.c:186
    semantics) == native C++ reader == what the loader actually returns —
    any misread of a present real tensor fails here;
  - byte-size census: every index is either present with exactly
    4*prod(shape) bytes, or accounted for in `.MISSING_LARGE_BLOBS`;
  - a full hybrid forward (real tensors where present, seeded synth
    elsewhere) gated against the independent NumPy fp64 oracle.

The golden 100-line comparator gate itself lives in test_golden.py, with its
activation machinery proven on a fabricated complete checkout.
"""

from pathlib import Path

import numpy as np
import pytest

from vit_tpu.config import VIT_B_16
from vit_tpu.io import weights as wio

REF = Path("/root/reference")
NETWORK = REF / "Network"
MISSING_LIST = REF / ".MISSING_LARGE_BLOBS"

pytestmark = pytest.mark.skipif(
    not NETWORK.exists(), reason="reference weight dir not mounted"
)


def _missing_names() -> set:
    if not MISSING_LIST.exists():
        return set()
    return {
        Path(line.strip()).name
        for line in MISSING_LIST.read_text().splitlines()
        if line.strip().startswith("Network/")
    }


def test_every_spec_tensor_present_or_accounted_for():
    files = wio.scan_weight_dir(NETWORK)
    missing = _missing_names()
    for idx, name, shape in wio.reference_tensor_specs(VIT_B_16):
        fname = f"Weight_{idx}_{name}.bin"
        if idx in files:
            got = files[idx].stat().st_size
            want = 4 * int(np.prod(shape))
            assert got == want, f"{fname}: {got} bytes, expected {want}"
        else:
            assert fname in missing, (
                f"{fname} absent but not listed in .MISSING_LARGE_BLOBS"
            )
    # and nothing listed as stripped is actually present
    present_names = {p.name for p in files.values()}
    assert not (missing & present_names)


def test_real_file_count_matches_round1_census():
    # 152 total, 37 stripped (.MISSING_LARGE_BLOBS has 36 weight entries +
    # input-100.bin); the mounted census is what VERDICT r1 counted.
    files = wio.scan_weight_dir(NETWORK)
    assert len(files) == 152 - len(_missing_names())


def test_real_tensors_load_bit_exactly():
    """Every present real tensor: the loader's output must equal the
    independent raw-read + round6 pipeline bit-for-bit, in the spec shape."""
    files = wio.scan_weight_dir(NETWORK)
    tensors = wio.load_reference_tensors(
        NETWORK, VIT_B_16, round_to_6dp=True, allow_synth=True
    )
    checked = 0
    for idx, name, shape in wio.reference_tensor_specs(VIT_B_16):
        path = files.get(idx)
        if path is None:
            continue
        raw = np.fromfile(path, dtype="<f4")
        want = wio.round6(raw).reshape(shape)
        got = tensors[idx]
        assert got.shape == tuple(shape), f"{path.name}: shape {got.shape}"
        assert np.array_equal(
            got.view(np.uint32), want.view(np.uint32)
        ), f"{path.name}: loader output differs from raw+round6"
        checked += 1
    assert checked >= 100  # the snapshot mounts 115 real files


def test_native_reader_matches_numpy_on_real_files():
    from vit_tpu.io import native

    if not native.available():
        pytest.skip("native IO library not built")
    files = wio.scan_weight_dir(NETWORK)
    for idx in sorted(files)[:40]:  # a broad slice keeps runtime sane
        path = files[idx]
        for rounding in (True, False):
            a = native.read_fp32(path, rounding)
            b = np.fromfile(path, dtype="<f4")
            if rounding:
                b = wio.round6(b)
            assert np.array_equal(a.view(np.uint32), b.view(np.uint32)), (
                f"{path.name} rounding={rounding}"
            )


def test_round6_is_idempotent_on_real_data():
    # Network.c applies rounding once at load; re-rounding must be a no-op
    # (guards the tie-break emulation against drift on real distributions).
    files = wio.scan_weight_dir(NETWORK)
    path = files[min(files)]
    x = wio.round6(np.fromfile(path, dtype="<f4"))
    assert np.array_equal(x, wio.round6(x))


def test_hybrid_real_weights_forward_vs_oracle():
    """Full B/16 forward with every real tensor in place (synth fills the
    stripped 37): fp32 engine vs the independent NumPy fp64 oracle under the
    north-star gate (<1e-3 max logit deviation, BASELINE.json)."""
    from vit_tpu.io import images as iio
    from vit_tpu.models import oracle
    from vit_tpu.runtime import InferenceEngine

    params = wio.load_reference_weights(NETWORK, VIT_B_16, allow_synth=True)
    images = iio.synth_images(2, VIT_B_16, seed=7)
    engine = InferenceEngine(VIT_B_16, params, dtype="float32", ops="xla",
                             batch_pad=2)
    got = np.asarray(engine.logits(images))
    want = oracle.forward(params, images, VIT_B_16)
    dev = float(np.abs(got - want).max())
    assert np.isfinite(got).all()
    assert dev < 1e-3, f"max logit deviation {dev}"
