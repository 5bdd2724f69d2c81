"""torchvision state-dict converter tests, using a fabricated state dict
(and the real torchvision model class when torchvision is installed)."""

import numpy as np
import pytest

from vit_tpu.io import torch_convert as tc
from vit_tpu.io import weights as wio


def _fake_state_dict(cfg, seed=0):
    """Build a state dict with torchvision's exact keys/shapes from the
    reference spec table (tensors are the synth set, so values line up)."""
    tensors = wio.synth_reference_tensors(cfg, seed=seed)
    sd = {}
    for idx, name, shape in wio.reference_tensor_specs(cfg):
        key = tc.state_dict_key(name)
        t = tensors[idx]
        if name == "class_token":
            t = t.reshape(1, 1, -1)
        elif name == "encoder_pos_embedding":
            t = t.reshape(1, *t.shape)
        sd[key] = t
    return tensors, sd


def test_state_dict_keys_are_torchvision_style(tiny_cfg):
    keys = {
        tc.state_dict_key(name) for _, name, _ in wio.reference_tensor_specs(tiny_cfg)
    }
    assert "class_token" in keys
    assert "conv_proj.weight" in keys
    assert "encoder.pos_embedding" in keys
    assert "encoder.layers.encoder_layer_0.ln_1.weight" in keys
    assert "encoder.layers.encoder_layer_0.self_attention.in_proj_weight" in keys
    assert "encoder.layers.encoder_layer_0.self_attention.out_proj.weight" in keys
    assert "encoder.layers.encoder_layer_1.mlp.0.weight" in keys
    assert "encoder.layers.encoder_layer_1.mlp.3.bias" in keys
    assert "encoder.ln.weight" in keys
    assert "heads.head.weight" in keys


def test_roundtrip_state_dict_to_tensors(tiny_cfg):
    tensors, sd = _fake_state_dict(tiny_cfg)
    got = tc.tensors_from_state_dict(sd, tiny_cfg)
    for idx in tensors:
        np.testing.assert_array_equal(got[idx], tensors[idx])


def test_params_match_bin_loader_path(tiny_cfg, tmp_path):
    # state dict -> params must equal: state dict -> Weight_*.bin -> params
    tensors, sd = _fake_state_dict(tiny_cfg)
    p_direct = tc.params_from_state_dict(sd, tiny_cfg, round_to_6dp=True)
    tc.export_reference_bins(sd, tmp_path, tiny_cfg)
    p_files = wio.load_reference_weights(tmp_path, tiny_cfg, round_to_6dp=True)
    import jax

    for a, b in zip(jax.tree.leaves(p_direct), jax.tree.leaves(p_files)):
        np.testing.assert_array_equal(a, b)


def test_missing_key_raises(tiny_cfg):
    _, sd = _fake_state_dict(tiny_cfg)
    del sd["conv_proj.bias"]
    with pytest.raises(KeyError):
        tc.tensors_from_state_dict(sd, tiny_cfg)


def test_torch_tensor_inputs(tiny_cfg):
    torch = pytest.importorskip("torch")
    tensors, sd = _fake_state_dict(tiny_cfg)
    sd_t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    got = tc.tensors_from_state_dict(sd_t, tiny_cfg)
    for idx in tensors:
        np.testing.assert_array_equal(got[idx], tensors[idx])


def test_pth_export_roundtrip(tiny_cfg, tiny_params, tmp_path):
    """params -> save_pth -> load_pth round-trips bit-exactly, and the
    exported dict carries torchvision's native cls/pos shapes."""
    import jax

    path = tmp_path / "export.pth"
    tc.save_pth(tiny_params, path, tiny_cfg)
    sd = tc.state_dict_from_params(tiny_params, tiny_cfg)
    assert sd["class_token"].shape == (1, 1, tiny_cfg.embed_dim)
    assert sd["encoder.pos_embedding"].shape == (
        1, tiny_cfg.seq_len, tiny_cfg.embed_dim
    )
    back = tc.load_pth(path, tiny_cfg)
    for a, b in zip(jax.tree.leaves(tiny_params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_cli_pth_destination(tiny_cfg, tmp_path, monkeypatch, capsys):
    """vit-tpu-convert infers pth output from the destination suffix; the
    file loads back through the generic loader."""
    import vit_tpu.config as config_mod
    from vit_tpu.cli.convert import main as convert_main
    from vit_tpu.io.load_any import load_params_any

    monkeypatch.setitem(config_mod.CONFIGS, tiny_cfg.name, tiny_cfg)
    tensors = wio.synth_reference_tensors(tiny_cfg, seed=3)
    wio.save_reference_weights(tensors, tmp_path / "Network", tiny_cfg)
    dst = tmp_path / "out.pth"
    rc = convert_main([
        "--config", tiny_cfg.name, "--from", str(tmp_path / "Network"),
        "--to", str(dst),
    ])
    assert rc == 0 and dst.exists()
    assert "pth" in capsys.readouterr().out
    params = load_params_any(dst, tiny_cfg)
    want = wio.params_from_tensors(tensors, tiny_cfg)
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
