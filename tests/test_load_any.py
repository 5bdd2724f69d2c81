"""Universal weight-source resolution (io/load_any.py): the CLIs accept
reference Weight_*.bin dirs, trained .npz checkpoints, torchvision .pth
state dicts, and Orbax checkpoint dirs through one entry point."""

import jax
import numpy as np
import pytest

from vit_tpu.io import checkpoint as ckpt
from vit_tpu.io import weights as wio
from vit_tpu.io.load_any import load_params_any


def _ref_dir(tmp_path, tiny_cfg, seed=1):
    d = tmp_path / "Network"
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=seed), d, tiny_cfg
    )
    return d


def test_reference_dir_and_npz_agree(tmp_path, tiny_cfg):
    d = _ref_dir(tmp_path, tiny_cfg)
    p_ref = load_params_any(d, tiny_cfg, round_to_6dp=False)
    ckpt.save_npz(p_ref, tmp_path / "p.npz")
    p_npz = load_params_any(tmp_path / "p.npz", tiny_cfg)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_npz)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_dir(tmp_path, tiny_cfg):
    d = _ref_dir(tmp_path, tiny_cfg)
    p_ref = load_params_any(d, tiny_cfg, round_to_6dp=False)
    ckpt.save_orbax(p_ref, tmp_path / "orbax_ckpt")
    p_orb = load_params_any(tmp_path / "orbax_ckpt", tiny_cfg)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_orb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pth_state_dict(tmp_path, tiny_cfg):
    torch = pytest.importorskip("torch")
    from vit_tpu.io.torch_convert import state_dict_key

    specs = wio.reference_tensor_specs(tiny_cfg)
    tensors = wio.synth_reference_tensors(tiny_cfg, seed=2)
    sd = {
        state_dict_key(name): torch.from_numpy(np.asarray(tensors[idx]))
        for idx, name, _ in specs
    }
    torch.save(sd, tmp_path / "model.pth")
    p_pth = load_params_any(tmp_path / "model.pth", tiny_cfg)
    p_ref = wio.params_from_tensors(tensors, tiny_cfg)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_pth)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_unknown_source_rejected(tmp_path):
    (tmp_path / "weights.txt").write_text("nope")
    with pytest.raises(ValueError, match="unrecognized weight source"):
        load_params_any(tmp_path / "weights.txt")


def test_cli_classifies_from_npz(tmp_path, tiny_cfg, capsys, monkeypatch):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.main import main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    d = _ref_dir(tmp_path, tiny_cfg)
    params = load_params_any(d, tiny_cfg)
    ckpt.save_npz(params, tmp_path / "trained.npz")
    rc = main([
        "--config", "vit_tiny_test", "--weights", str(tmp_path / "trained.npz"),
        "--synth", "2", "--dtype", "float32", "--ops", "xla",
        "--batch-pad", "2", "--no-compile-cache",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "label:" in out


def test_train_cli_init_from_npz(tmp_path, tiny_cfg, capsys, monkeypatch):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    d = _ref_dir(tmp_path, tiny_cfg)
    ckpt.save_npz(load_params_any(d, tiny_cfg), tmp_path / "warm.npz")
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "1", "--batch", "4",
        "--dp", "1", "--ops", "xla",
        "--init-weights", str(tmp_path / "warm.npz"), "--no-compile-cache",
    ])
    assert rc == 0
    assert "step    0" in capsys.readouterr().out


def test_train_state_npz_yields_params(tmp_path, tiny_cfg):
    """Pointing --weights at a --save-state archive must extract the params
    subtree (not unflatten params./opt./__step__ into a garbled tree)."""
    import optax

    from vit_tpu.io.checkpoint import save_train_state
    from vit_tpu.io.load_any import load_params_any
    from vit_tpu.io import weights as wio

    tensors = wio.synth_reference_tensors(tiny_cfg, seed=5)
    params = wio.params_from_tensors(tensors, tiny_cfg)
    opt = optax.sgd(0.1).init(params)
    p = tmp_path / "state.npz"
    save_train_state(params, opt, 7, p)
    got = load_params_any(p, tiny_cfg)
    assert "cls_token" in got and "blocks" in got
    np.testing.assert_allclose(
        np.asarray(got["cls_token"]), np.asarray(params["cls_token"])
    )


def test_wide_config_refuses_published_checkpoints(tmp_path, tiny_cfg):
    """vit_b_16_wide's tensor shapes match B/16 exactly, so a torchvision
    .pth or Weight_*.bin dir would load without any shape error and compute
    wrong attention (the packed-QKV head grouping differs) — the loader
    must refuse (ADVICE r3)."""
    import dataclasses

    wide = dataclasses.replace(
        tiny_cfg, num_heads=2, native_checkpoints=False, name="tiny_wide"
    )
    d = _ref_dir(tmp_path, tiny_cfg)
    with pytest.raises(ValueError, match="head geometry"):
        load_params_any(d, wide)
    # our own .npz checkpoints carry the wide packing natively — allowed
    params = load_params_any(d, tiny_cfg)
    ckpt.save_npz(params, tmp_path / "own.npz")
    got = load_params_any(tmp_path / "own.npz", wide)
    assert "cls_token" in got


def test_uppercase_suffixes_dispatch(tmp_path, tiny_cfg):
    """.NPZ / .PT names (case-insensitive filesystems, external tooling)
    must dispatch like their lowercase twins, not fall through to
    'unrecognized weight source'."""
    from vit_tpu.io import checkpoint as ckpt
    from vit_tpu.io import weights as wio
    from vit_tpu.io.load_any import load_params_any

    tensors = wio.synth_reference_tensors(tiny_cfg, seed=9)
    params = wio.params_from_tensors(tensors, tiny_cfg)
    p = tmp_path / "CKPT.NPZ"
    ckpt.save_npz(params, p)
    got = load_params_any(p, tiny_cfg)
    assert "cls_token" in got
    np.testing.assert_allclose(
        np.asarray(got["cls_token"]), np.asarray(params["cls_token"])
    )
