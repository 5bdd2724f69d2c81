"""Kernel coverage across the model family's shape space.

The fused kernels slice heads out of the packed QKV columns, so unusual
head dims (H/14's dh=80, not a lane multiple) and large widths must keep
parity with the jnp path — forward AND backward (interpret mode).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.config import VIT_B_16
from vit_tpu.models import vit
from vit_tpu.ops.dispatch import get_ops

SHAPES = {
    # name: (embed_dim, heads) with mlp_ratio 4 — depth/res kept tiny
    "b_like": (64, 4),
    "l_like_dh64": (128, 2),     # dh=64, the B/L head dim
    "h_like_dh80": (160, 2),     # dh=80, H/14's non-lane-multiple dim
}


def _cfg(d, h):
    return dataclasses.replace(
        VIT_B_16, depth=2, embed_dim=d, num_heads=h,
        image_size=32, patch_size=16, num_classes=7,
        name=f"vit_shape_{d}_{h}",
    )


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_fused_forward_matches_xla(shape):
    d, h = SHAPES[shape]
    cfg = _cfg(d, h)
    params = vit.init_params(jax.random.key(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 3, 32, 32)), jnp.float32
    )
    want = vit.forward(params, imgs, cfg, get_ops("xla"))
    got = vit.forward(params, imgs, cfg, get_ops("fused"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_fused_train_grads_match_xla(shape):
    d, h = SHAPES[shape]
    cfg = _cfg(d, h)
    params = vit.init_params(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(2, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, 2), jnp.int32)

    from vit_tpu.runtime import trainer

    def grads(ops_name):
        loss_fn = trainer._make_loss_fn(cfg, get_ops(ops_name), False, None)
        return jax.grad(loss_fn)(params, imgs, labels)

    g_fused = grads("fused_train")
    g_xla = grads("xla")
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )


def test_quant_matches_fp_within_int8_noise():
    # int8 path across an odd-head-dim shape
    d, h = SHAPES["h_like_dh80"]
    cfg = _cfg(d, h)
    params = vit.init_params(jax.random.key(2), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 3, 32, 32)), jnp.float32
    )
    want = np.asarray(vit.forward(params, imgs, cfg, get_ops("xla")))
    from vit_tpu.ops import quant

    qp = quant.cast_quantized_params(quant.quantize_params(
        jax.tree.map(jnp.asarray, params)), jnp.float32)
    got = np.asarray(vit.forward(qp, imgs, cfg, get_ops("quant")))
    assert np.isfinite(got).all()
    # int8 noise scales with activations; labels must agree on decisive rows
    assert np.abs(got - want).max() < 0.5


def test_fuzz_fused_vs_xla_random_shapes():
    """Differential fuzz: random (depth, width, heads, batch) through both
    paths — the framework's race-detector analog (SURVEY.md §5)."""
    rng = np.random.default_rng(42)
    for trial in range(4):
        h = int(rng.choice([1, 2, 4]))
        dh = int(rng.choice([16, 32, 48]))
        d = h * dh
        cfg = dataclasses.replace(
            VIT_B_16, depth=int(rng.integers(1, 3)), embed_dim=d,
            num_heads=h, mlp_ratio=float(rng.choice([2.0, 4.0])),
            image_size=32, patch_size=16,
            num_classes=int(rng.integers(3, 12)),
            name=f"fuzz_{trial}",
        )
        params = vit.init_params(jax.random.key(trial), cfg)
        b = int(rng.integers(1, 4))
        imgs = jnp.asarray(rng.normal(size=(b, 3, 32, 32)), jnp.float32)
        want = np.asarray(vit.forward(params, imgs, cfg, get_ops("xla")))
        got = np.asarray(vit.forward(params, imgs, cfg, get_ops("fused")))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4,
                                   err_msg=f"trial {trial} cfg={cfg.name}")


def test_long_sequence_fallback_matches_xla(monkeypatch):
    """Past VMEM_ATTENTION_MAX_T the fused block must switch to the
    blockwise flash-attention composition and stay correct."""
    from vit_tpu.ops.pallas import fused_block as FB

    monkeypatch.setattr(FB, "VMEM_ATTENTION_MAX_T", 4)  # force the fallback
    cfg = _cfg(64, 4)  # T = (32/16)^2 + 1 = 5 > 4
    params = vit.init_params(jax.random.key(3), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 3, 32, 32)), jnp.float32
    )
    want = np.asarray(vit.forward(params, imgs, cfg, get_ops("xla")))
    got = np.asarray(vit.forward(params, imgs, cfg, get_ops("fused")))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("image_size", [160, 192, 256])
def test_fused_parity_at_odd_resolutions(image_size):
    """'Any resolution via config' (docs/parity.md long-context row): token
    counts that are NOT tile multiples (101 / 145 / 257) must keep fused
    parity — padding/masking edges the @224 (197) and @384 (577) configs
    never exercise."""
    cfg = dataclasses.replace(
        VIT_B_16, depth=2, embed_dim=64, num_heads=4,
        image_size=image_size, patch_size=16, num_classes=7,
        name=f"vit_res_{image_size}",
    )
    assert cfg.seq_len in (101, 145, 257)
    params = vit.init_params(jax.random.key(3), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 3, image_size, image_size)),
        jnp.float32,
    )
    want = np.asarray(vit.forward(params, imgs, cfg, get_ops("xla")))
    got = np.asarray(vit.forward(params, imgs, cfg, get_ops("fused")))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_train_grads_at_odd_resolution():
    """Training at a non-tile token count (T=101) through the backward
    megakernels matches autodiff — the claim that any configured
    resolution trains through the kernel path."""
    cfg = dataclasses.replace(
        VIT_B_16, depth=2, embed_dim=64, num_heads=4,
        image_size=160, patch_size=16, num_classes=7, name="vit_res_160",
    )
    params = vit.init_params(jax.random.key(4), cfg)
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.normal(size=(2, 3, 160, 160)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, 2), jnp.int32)

    from vit_tpu.runtime import trainer

    def grads(ops_name):
        loss_fn = trainer._make_loss_fn(cfg, get_ops(ops_name), False, None)
        return jax.grad(loss_fn)(params, imgs, labels)

    for a, b in zip(
        jax.tree.leaves(grads("fused_train")), jax.tree.leaves(grads("xla"))
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )
