"""Checkpoint round-trip tests (npz + orbax)."""

import jax
import numpy as np
import pytest

from vit_tpu.io import checkpoint as ckpt


def test_npz_roundtrip(tiny_params, tmp_path):
    path = tmp_path / "params.npz"
    ckpt.save_npz(tiny_params, path)
    loaded = ckpt.load_npz(path)
    for a, b in zip(jax.tree.leaves(tiny_params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), b)
    # structure preserved
    assert set(loaded) == set(tiny_params)
    assert set(loaded["blocks"]) == set(tiny_params["blocks"])


def test_npz_dtype_cast(tiny_params, tmp_path):
    path = tmp_path / "params.npz"
    ckpt.save_npz(tiny_params, path)
    loaded = ckpt.load_npz(path, dtype=np.float16)
    assert all(l.dtype == np.float16 for l in jax.tree.leaves(loaded))


def test_orbax_roundtrip(tiny_params, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    path = tmp_path / "orbax_ckpt"
    ckpt.save_orbax(tiny_params, path)
    loaded = ckpt.load_orbax(path, like=tiny_params)
    for a, b in zip(jax.tree.leaves(tiny_params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
