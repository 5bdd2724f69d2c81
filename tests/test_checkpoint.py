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


def test_suffixless_path_writes_exact_file(tiny_params, tmp_path):
    """np.savez silently appends .npz to a bare name; save_npz/-train_state
    must write to EXACTLY the given path so --resume/--weights find it."""
    import optax

    from vit_tpu.io.checkpoint import (
        load_npz,
        load_train_state,
        save_npz,
        save_train_state,
    )

    p = tmp_path / "ckpt"  # no suffix
    save_npz(tiny_params, p)
    assert p.exists() and not (tmp_path / "ckpt.npz").exists()
    load_npz(p)

    opt = optax.sgd(0.1).init(tiny_params)
    s = tmp_path / "state"
    save_train_state(tiny_params, opt, 3, s)
    assert s.exists()
    _, _, step = load_train_state(s, opt)
    assert step == 3


def test_train_state_leaf_count_mismatch_raises(tiny_params, tmp_path):
    """Restoring against an optimizer with a different leaf COUNT must
    fail loudly, not restore a shape-coincident prefix."""
    import optax
    import pytest as _pytest

    from vit_tpu.io.checkpoint import load_train_state, save_train_state

    opt_small = optax.sgd(0.1).init(tiny_params)  # stateless-ish
    p = tmp_path / "state.npz"
    save_train_state(tiny_params, opt_small, 1, p)
    opt_big = optax.adamw(1e-3).init(tiny_params)  # mu/nu/count
    with _pytest.raises(ValueError, match="optimizer mismatch"):
        load_train_state(p, opt_big)
