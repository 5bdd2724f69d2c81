"""Interpretability probe: per-layer attention probabilities + attention
rollout (models/vit.attention_maps / attention_rollout).  The reference
materializes these probability rows per head (ViT_opencl.c:523-532) but
never exposes them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.models import vit
from vit_tpu.runtime import InferenceEngine


def _x(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(size=(b, 3, cfg.image_size, cfg.image_size)), jnp.float32
    )


def test_attention_maps_shape_and_rows(tiny_cfg, tiny_params):
    x = _x(tiny_cfg)
    probs = np.asarray(
        jax.jit(lambda p, v: vit.attention_maps(p, v, tiny_cfg))(
            tiny_params, x
        )
    )
    t = tiny_cfg.num_patches + 1
    assert probs.shape == (tiny_cfg.depth, 2, tiny_cfg.num_heads, t, t)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert (probs >= 0).all()


def test_rollout_matches_manual_composition(tiny_cfg, tiny_params):
    x = _x(tiny_cfg, b=1, seed=1)
    probs = np.asarray(vit.attention_maps(tiny_params, x, tiny_cfg))
    got = np.asarray(vit.attention_rollout(jnp.asarray(probs)))

    a = probs.mean(axis=2)  # (depth, 1, T, T)
    t = a.shape[-1]
    a = 0.5 * a + 0.5 * np.eye(t, dtype=a.dtype)
    a = a / a.sum(-1, keepdims=True)
    r = np.eye(t, dtype=a.dtype)
    for l in range(a.shape[0]):
        r = a[l, 0] @ r
    np.testing.assert_allclose(got[0], r[0, 1:], atol=1e-6)
    # rows of the full rollout are stochastic -> relevance mass <= 1
    assert got.sum(-1).max() <= 1.0 + 1e-5


def test_engine_attention_maps_and_quant_guard(tiny_cfg, tiny_params):
    eng = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops="xla",
                          batch_pad=4)
    x = np.asarray(_x(tiny_cfg))
    g = tiny_cfg.grid_size
    roll = np.asarray(eng.attention_maps(x, rollout=True))
    assert roll.shape == (2, g, g) and (roll >= 0).all()
    probs = np.asarray(eng.attention_maps(x))
    assert probs.shape[0] == tiny_cfg.depth

    q = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops="quant",
                        batch_pad=4)
    with pytest.raises(ValueError, match="fp weights"):
        q.attention_maps(x)


def test_engine_attention_maps_sharded_matches_single_device(
    tiny_cfg, tiny_params
):
    """On a meshed engine the probe shards (batch over dp, params by the
    Megatron rules) instead of jitting unsharded; results must match the
    single-device probe exactly up to fp reassociation."""
    from vit_tpu.parallel import make_mesh

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    x = np.asarray(_x(tiny_cfg, b=3, seed=2))  # 3 does not divide dp=2
    single = InferenceEngine(
        tiny_cfg, tiny_params, dtype="float32", ops="xla", batch_pad=4
    )
    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    meshed = InferenceEngine(
        tiny_cfg, tiny_params, dtype="float32", ops="xla", mesh=mesh,
        batch_pad=4,
    )
    np.testing.assert_allclose(
        np.asarray(meshed.attention_maps(x)),
        np.asarray(single.attention_maps(x)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(meshed.attention_maps(x, rollout=True)),
        np.asarray(single.attention_maps(x, rollout=True)),
        atol=1e-5,
    )


def test_cli_attn_rollout(tmp_path, tiny_cfg, capsys, monkeypatch):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.main import main
    from vit_tpu.io import weights as wio

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=1),
        tmp_path / "Network", tiny_cfg,
    )
    out = tmp_path / "roll.npz"
    rc = main([
        "--config", "vit_tiny_test", "--weights", str(tmp_path / "Network"),
        "--synth", "3", "--dtype", "float32", "--ops", "xla",
        "--batch-pad", "4", "--attn-rollout", str(out),
        "--no-compile-cache",
    ])
    assert rc == 0
    data = np.load(out)
    g = tiny_cfg.grid_size
    assert data["maps"].shape == (3, g, g)
    assert data["labels"].shape == (3,)
