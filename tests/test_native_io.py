"""Native C++ loader parity vs the NumPy fallback (same semantics contract).

The shared library is built with ``make -C native``; tests build it on the
fly if a toolchain is present, otherwise skip.
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from vit_tpu.io import images as iio
from vit_tpu.io import native
from vit_tpu.io import weights as wio

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not native.available():
        if shutil.which("make") and shutil.which("g++"):
            subprocess.run(["make", "-C", str(REPO / "native")], check=True)
            native._load_attempted = False  # re-probe
        if not native.available():
            pytest.skip("native vitio library not built and no toolchain")


def test_read_fp32_matches_numpy(tmp_path):
    data = np.random.default_rng(0).normal(size=1000).astype("<f4")
    path = tmp_path / "w.bin"
    data.tofile(path)
    got = native.read_fp32(path, round_to_6dp=False)
    np.testing.assert_array_equal(got, data)


def test_read_fp32_rounding_matches_reference_quirk(tmp_path):
    data = np.random.default_rng(1).normal(size=1000).astype("<f4")
    path = tmp_path / "w.bin"
    data.tofile(path)
    got = native.read_fp32(path, round_to_6dp=True)
    np.testing.assert_array_equal(got, wio.round6(data))


def test_read_image_bin_matches_python_loader(tmp_path):
    imgs = np.random.default_rng(2).normal(size=(3, 3, 8, 8)).astype(np.float32)
    path = tmp_path / "input.bin"
    iio.save_image_bin(imgs, path)
    got = native.read_image_bin(path)
    np.testing.assert_array_equal(got, imgs)


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        native.read_fp32("/nonexistent/file.bin")


def test_weight_loader_uses_native_when_available(tmp_path, tiny_cfg):
    # Full loader path through the native reader must equal the numpy path.
    tensors = wio.synth_reference_tensors(tiny_cfg, seed=5)
    wio.save_reference_weights(tensors, tmp_path, tiny_cfg)
    via_native = wio.load_reference_tensors(tmp_path, tiny_cfg, use_native=True)
    via_numpy = wio.load_reference_tensors(tmp_path, tiny_cfg, use_native=False)
    for idx in via_numpy:
        np.testing.assert_array_equal(via_native[idx], via_numpy[idx])
