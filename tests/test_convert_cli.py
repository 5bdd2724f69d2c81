"""vit-tpu-convert: one command between every weight format
(cli/convert.py over io/load_any.py + the writers)."""

import jax
import numpy as np
import pytest

from vit_tpu.cli.convert import main as convert_main
from vit_tpu.io import checkpoint as ckpt
from vit_tpu.io import weights as wio
from vit_tpu.io.load_any import load_params_any


@pytest.fixture()
def ref_dir(tmp_path, tiny_cfg, monkeypatch):
    import vit_tpu.config as config_mod

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    d = tmp_path / "Network"
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=3), d, tiny_cfg
    )
    return d


def test_reference_to_npz_and_back(ref_dir, tiny_cfg, tmp_path, capsys):
    npz = tmp_path / "p.npz"
    rc = convert_main([
        "--config", "vit_tiny_test", "--from", str(ref_dir), "--to",
        str(npz), "--no-round6",
    ])
    assert rc == 0 and npz.exists()
    assert "npz" in capsys.readouterr().out

    back = tmp_path / "Network2"
    rc = convert_main([
        "--config", "vit_tiny_test", "--from", str(npz), "--to", str(back),
    ])
    assert rc == 0
    n_files = len(list(back.glob("Weight_*.bin")))
    assert n_files == 4 + 12 * tiny_cfg.depth + 4
    # bit-exact full circle
    a = load_params_any(ref_dir, tiny_cfg, round_to_6dp=False)
    b = load_params_any(back, tiny_cfg, round_to_6dp=False)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pth_to_reference(ref_dir, tiny_cfg, tmp_path):
    torch = pytest.importorskip("torch")
    from vit_tpu.io.torch_convert import state_dict_key

    tensors = wio.synth_reference_tensors(tiny_cfg, seed=4)
    sd = {
        state_dict_key(name): torch.from_numpy(np.asarray(tensors[idx]))
        for idx, name, _ in wio.reference_tensor_specs(tiny_cfg)
    }
    torch.save(sd, tmp_path / "m.pth")
    out = tmp_path / "FromTorch"
    rc = convert_main([
        "--config", "vit_tiny_test", "--from", str(tmp_path / "m.pth"),
        "--to", str(out), "--format", "reference",
    ])
    assert rc == 0
    p = load_params_any(out, tiny_cfg, round_to_6dp=False)
    want = wio.params_from_tensors(tensors, tiny_cfg)
    for x, y in zip(jax.tree.leaves(want), jax.tree.leaves(p)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_orbax_output(ref_dir, tiny_cfg, tmp_path):
    out = tmp_path / "orbax_out"
    rc = convert_main([
        "--config", "vit_tiny_test", "--from", str(ref_dir), "--to",
        str(out), "--format", "orbax", "--no-round6",
    ])
    assert rc == 0
    a = load_params_any(ref_dir, tiny_cfg, round_to_6dp=False)
    b = ckpt.load_orbax(out)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_hf_source(tiny_cfg, tmp_path, monkeypatch, capsys):
    """--hf: a saved HuggingFace ViT checkpoint converts to .npz with the
    packed-QKV repack applied."""
    transformers = pytest.importorskip("transformers")
    import vit_tpu.config as config_mod

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    hf_cfg = transformers.ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, image_size=32, patch_size=16, num_labels=11,
    )
    import torch

    torch.manual_seed(1)
    model = transformers.ViTForImageClassification(hf_cfg).eval()
    model.save_pretrained(tmp_path / "hf_model")
    rc = convert_main([
        "--config", "vit_tiny_test", "--hf",
        "--from", str(tmp_path / "hf_model"),
        "--to", str(tmp_path / "from_hf.npz"),
    ])
    assert rc == 0
    p = ckpt.load_npz(tmp_path / "from_hf.npz")
    assert np.asarray(p["blocks"]["wqkv"]).shape == (2, 64, 192)

    rc = convert_main([
        "--config", "vit_tiny_test", "--hf",
        "--from", str(tmp_path / "no_such_dir"),
        "--to", str(tmp_path / "x.npz"),
    ])
    assert rc == 2
    assert "cannot load HF checkpoint" in capsys.readouterr().err


def test_bad_source(tiny_cfg, tmp_path, capsys, monkeypatch):
    import vit_tpu.config as config_mod

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    (tmp_path / "x.txt").write_text("nope")
    rc = convert_main([
        "--config", "vit_tiny_test", "--from", str(tmp_path / "x.txt"),
        "--to", str(tmp_path / "o.npz"),
    ])
    assert rc == 2
    assert "error:" in capsys.readouterr().err


def test_uppercase_dst_suffix_infers_format(ref_dir, tiny_cfg, tmp_path, capsys):
    """--to out.NPZ must infer npz (not silently write reference .bin files
    into a directory named 'out.NPZ')."""
    npz = tmp_path / "OUT.NPZ"
    rc = convert_main([
        "--config", "vit_tiny_test", "--from", str(ref_dir), "--to",
        str(npz), "--no-round6",
    ])
    assert rc == 0
    assert npz.is_file()
    got = load_params_any(npz, tiny_cfg)
    assert "cls_token" in got


def test_headless_vit_backbone_refuses(tmp_path, capsys, monkeypatch, tiny_cfg):
    """A plain-ViT backbone with no classifier head must fail cleanly
    instead of exporting random-initialized classifier weights (same guard
    as the DeiT branch, tests/test_deit.py)."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")

    torch.manual_seed(3)
    hf_cfg = transformers.ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, image_size=32, patch_size=16,
        num_channels=3, num_labels=11,
    )
    model = transformers.ViTModel(hf_cfg)  # headless backbone
    src = tmp_path / "headless_vit"
    model.save_pretrained(src)

    import vit_tpu.config as config_mod

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rc = convert_main([
        "--hf", "--from", str(src), "--to", str(tmp_path / "out.npz"),
        "--config", "vit_tiny_test",
    ])
    assert rc == 2
    assert "no classifier head" in capsys.readouterr().err
    assert not (tmp_path / "out.npz").exists()
