"""Backward Pallas kernels vs jnp autodiff (interpret mode on CPU).

The gate from VERDICT r1 item 2: hand-written dLN/dGEMM/dattention kernels
must match autodiff of the same block to <=1e-4 in fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.ops.pallas.backward import (
    ln_mlp_residual_bwd,
    ln_qkv_attn_bwd,
    out_residual_bwd,
)
from vit_tpu.ops.pallas.trainable import (
    _reference_block_2d,
    fused_encoder_block_trainable,
    fused_encoder_block_trainable_ref,
)

EPS = 1e-6


def _rand(key, *shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32) * 0.5


def _tree_close(a, b, atol):
    # atol for near-zero entries; matching rtol for large-magnitude grads
    # (fp32 reduction-order noise scales with |grad|).
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            atol=atol, rtol=atol,
        )


@pytest.mark.parametrize("variant", ["exact", "tanh"])
def test_ln_mlp_bwd_matches_autodiff(variant):
    rows, d, f = 100, 64, 256  # ragged vs block_rows=32 -> exercises masking
    x1 = _rand(0, rows, d)
    g = _rand(1, rows, d)
    s, b = 1.0 + 0.1 * _rand(2, d), 0.1 * _rand(3, d)
    w1, b1 = _rand(4, d, f), 0.1 * _rand(5, f)
    w2, b2 = _rand(6, f, d), 0.1 * _rand(7, d)

    def fwd(x1, s, b, w1, b1, w2, b2):
        from vit_tpu.ops import reference as R

        h = R.layer_norm(x1, s, b, EPS)
        return x1 + R.mlp(h, w1, b1, w2, b2, variant)

    _, vjp = jax.vjp(fwd, x1, s, b, w1, b1, w2, b2)
    want = vjp(g)  # (dx1, ds, db, dw1, db1, dw2, db2)

    got = ln_mlp_residual_bwd(
        g, x1, s, b, w1, b1, w2, EPS, variant, block_rows=32, interpret=True
    )
    _tree_close(list(got), list(want), atol=1e-4)


def test_out_residual_bwd_matches_autodiff():
    rows, d = 100, 64
    ctx, res, g = _rand(0, rows, d), _rand(1, rows, d), _rand(2, rows, d)
    wo, bo = _rand(3, d, d), 0.1 * _rand(4, d)

    def fwd(ctx, res, wo, bo):
        return res + ctx @ wo + bo

    _, vjp = jax.vjp(fwd, ctx, res, wo, bo)
    dctx_w, dres_w, dwo_w, dbo_w = vjp(g)

    dctx, dwo, dbo = out_residual_bwd(g, ctx, wo, block_rows=32, interpret=True)
    _tree_close([dctx, dwo, dbo], [dctx_w, dwo_w, dbo_w], atol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(dres_w))  # identity


def test_ln_qkv_attn_bwd_matches_autodiff(tiny_cfg):
    d, nh, t, bimg = 64, 4, 13, 3
    rows = bimg * t
    x = _rand(0, rows, d)
    dctx = _rand(1, rows, d)
    dres = _rand(2, rows, d)
    s, b = 1.0 + 0.1 * _rand(3, d), 0.1 * _rand(4, d)
    w, bq = _rand(5, d, 3 * d), 0.1 * _rand(6, 3 * d)

    def fwd(x, s, b, w, bq):
        from vit_tpu.ops import reference as R

        xr = x.reshape(bimg, t, d)
        h = R.layer_norm(xr, s, b, EPS)
        qkv = h @ w + bq
        dh = d // nh
        outs = []
        for hh in range(nh):
            base = hh * 3 * dh
            q = qkv[..., base : base + dh] / (dh**0.5)
            k = qkv[..., base + dh : base + 2 * dh]
            v = qkv[..., base + 2 * dh : base + 3 * dh]
            p = jax.nn.softmax(jnp.einsum("bqd,bkd->bqk", q, k), axis=-1)
            outs.append(jnp.einsum("bqk,bkd->bqd", p, v))
        return jnp.concatenate(outs, -1).reshape(rows, d)

    # join: loss = sum(fwd * dctx) + sum(x * something)? We need d/dx of
    # (attention path with cotangent dctx) PLUS the residual join dres.
    _, vjp = jax.vjp(fwd, x, s, b, w, bq)
    dx_w, ds_w, db_w, dw_w, dbq_w = vjp(dctx)
    dx_w = dx_w + dres  # the kernel fuses the residual-join add

    dx, ds, db, dw, dbq = ln_qkv_attn_bwd(
        dctx, dres, x, s, b, w, bq, nh, t, EPS, interpret=True
    )
    _tree_close([dx, ds, db, dw, dbq], [dx_w, ds_w, db_w, dw_w, dbq_w], atol=1e-4)


@pytest.mark.parametrize("variant", ["exact", "tanh"])
def test_full_block_grads_match_autodiff(tiny_cfg, tiny_params, variant):
    t = tiny_cfg.seq_len
    d = tiny_cfg.embed_dim
    rows = 4 * t
    x2d = _rand(0, rows, d) * 0.3
    blk = jax.tree.map(lambda a: jnp.asarray(a[0], jnp.float32),
                       tiny_params["blocks"])

    def loss_pallas(x, b):
        out = fused_encoder_block_trainable(
            x, b, tiny_cfg.num_heads, t, tiny_cfg.layernorm_eps, variant
        )
        return jnp.sum(out * jnp.cos(out.astype(jnp.float32) * 0.1))

    def loss_ref(x, b):
        out = _reference_block_2d(
            x, b, tiny_cfg.num_heads, t, tiny_cfg.layernorm_eps, variant
        )
        return jnp.sum(out * jnp.cos(out.astype(jnp.float32) * 0.1))

    gx, gb = jax.grad(loss_pallas, argnums=(0, 1))(x2d, blk)
    gx_w, gb_w = jax.grad(loss_ref, argnums=(0, 1))(x2d, blk)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_w), atol=1e-4, rtol=1e-4)
    _tree_close(gb, gb_w, atol=1e-4)


def test_kernel_bwd_matches_round1_recompute_bwd(tiny_cfg, tiny_params):
    # The round-1 jnp-recompute VJP stays as an independent oracle.
    t, d = tiny_cfg.seq_len, tiny_cfg.embed_dim
    rows = 2 * t
    x2d = _rand(9, rows, d) * 0.3
    blk = jax.tree.map(lambda a: jnp.asarray(a[1], jnp.float32),
                       tiny_params["blocks"])

    def mk(fn):
        def loss(x, b):
            return jnp.sum(
                fn(x, b, tiny_cfg.num_heads, t, tiny_cfg.layernorm_eps, "exact") ** 2
            )
        return jax.grad(loss, argnums=(0, 1))

    gx_a, gb_a = mk(fused_encoder_block_trainable)(x2d, blk)
    gx_b, gb_b = mk(fused_encoder_block_trainable_ref)(x2d, blk)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b), atol=1e-4, rtol=1e-4)
    _tree_close(gb_a, gb_b, atol=1e-4)


def test_fused_train_step_matches_xla_train_step(tiny_cfg):
    # End-to-end: one fused_train SGD step == one xla SGD step.
    import optax

    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.runtime import trainer

    optimizer = optax.sgd(0.05)
    params, opt0 = trainer.init_train_state(jax.random.key(3), tiny_cfg, optimizer)
    rng = np.random.default_rng(3)
    images = jnp.asarray(
        rng.normal(size=(4, 3, tiny_cfg.image_size, tiny_cfg.image_size)), jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 4), jnp.int32)

    step_x = trainer.make_train_step(tiny_cfg, optimizer, get_ops("xla"), remat=False)
    step_f = trainer.make_train_step(
        tiny_cfg, optimizer, get_ops("fused_train"), remat=False
    )
    px, _, lx = jax.jit(step_x)(params, opt0, images, labels)
    pf, _, lf = jax.jit(step_f)(params, opt0, images, labels)
    assert abs(float(lx) - float(lf)) < 1e-5
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), px, pf)
    assert max(jax.tree.leaves(d)) < 1e-4


def test_h14_head_geometry_grads_match_autodiff():
    """dh=80 (H/14: 1280/16) is the one head width B/16 and L/16 (both
    dh=64) never exercise — the lane-padded 80->128 head slices in the
    attention backward must mask correctly.  Small t keeps interpret
    mode fast; the full d/f are what matter for the padding paths."""
    import dataclasses

    from vit_tpu.config import VIT_H_14
    from vit_tpu.io import weights as wio

    cfg = dataclasses.replace(VIT_H_14, depth=1, image_size=70, name="h14_dims")
    t = cfg.seq_len  # (70/14)^2 + 1 = 26
    tensors = wio.synth_reference_tensors(cfg, seed=3)
    params = wio.params_from_tensors(tensors, cfg)
    blk = jax.tree.map(lambda a: jnp.asarray(a[0], jnp.float32), params["blocks"])
    x2d = _rand(0, 2 * t, cfg.embed_dim) * 0.3

    def mk(fn):
        def loss(x, b):
            out = fn(x, b, cfg.num_heads, t, cfg.layernorm_eps, "exact")
            return jnp.sum(out * jnp.cos(out.astype(jnp.float32) * 0.1))
        return jax.grad(loss, argnums=(0, 1))

    gx_a, gb_a = mk(fused_encoder_block_trainable)(x2d, blk)
    gx_b, gb_b = mk(_reference_block_2d)(x2d, blk)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               atol=1e-4, rtol=1e-4)
    _tree_close(gb_a, gb_b, atol=1e-4)


def test_split_bwd_form_matches_merged(tiny_cfg, tiny_params, monkeypatch):
    """Configs whose merged C'+B' backward overflows scoped VMEM (H/14:
    the fp32 dw accumulators alone are 52 MB) fall back to the split
    kernels; grads must be identical-ish to the merged form."""
    from vit_tpu.ops.pallas import backward as B

    t, d = tiny_cfg.seq_len, tiny_cfg.embed_dim
    rows = 3 * t
    x2d = _rand(4, rows, d) * 0.3
    blk = jax.tree.map(lambda a: jnp.asarray(a[0], jnp.float32),
                       tiny_params["blocks"])

    def grads():
        def loss(x, b):
            return jnp.sum(
                fused_encoder_block_trainable(
                    x, b, tiny_cfg.num_heads, t, tiny_cfg.layernorm_eps
                ) ** 2
            )
        return jax.grad(loss, argnums=(0, 1))(x2d, blk)

    assert B._merged_bwd_vmem_bytes(1280, 5120, 1280) > B.MERGED_BWD_VMEM_BUDGET  # H/14 splits
    assert B._merged_bwd_vmem_bytes(1024, 4096, 1024) <= B.MERGED_BWD_VMEM_BUDGET  # L/16 merges
    gx_m, gb_m = grads()
    monkeypatch.setattr(B, "MERGED_BWD_VMEM_BUDGET", 0)  # force split
    gx_s, gb_s = grads()
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_m), atol=1e-5)
    _tree_close(gb_s, gb_m, atol=1e-5)


# -- regularized (dropout + stochastic depth) fused block ---------------------
# VERDICT r3 item 1: the 2.1x training path must run the full ViT/DeiT
# recipe.  Gate: grads match the jnp twin under IDENTICAL masks <= 1e-4.


def _reg_case(tiny_cfg, tiny_params, batch=3):
    t, d = tiny_cfg.seq_len, tiny_cfg.embed_dim
    rows = batch * t
    x2d = _rand(11, rows, d) * 0.3
    blk = jax.tree.map(lambda a: jnp.asarray(a[0], jnp.float32),
                       tiny_params["blocks"])
    return x2d, blk, t


@pytest.mark.parametrize(
    "p,dp_rate", [(0.3, 0.0), (0.0, 0.4), (0.25, 0.25)]
)
def test_regularized_block_grads_match_jnp_twin(tiny_cfg, tiny_params, p, dp_rate):
    from vit_tpu.ops.pallas.trainable import (
        encoder_block_train,
        train_block_reference_2d,
    )

    x2d, blk, t = _reg_case(tiny_cfg, tiny_params)
    seed = jnp.uint32(987654)
    args = (tiny_cfg.num_heads, t, tiny_cfg.layernorm_eps, "exact",
            seed, p, dp_rate)

    def loss_k(x, b):
        return jnp.sum(jnp.sin(encoder_block_train(x, b, *args)))

    def loss_r(x, b):
        return jnp.sum(jnp.sin(train_block_reference_2d(x, b, *args)))

    fk = loss_k(x2d, blk)
    fr = loss_r(x2d, blk)
    np.testing.assert_allclose(float(fk), float(fr), rtol=1e-5)
    gk = jax.grad(loss_k, argnums=(0, 1))(x2d, blk)
    gr = jax.grad(loss_r, argnums=(0, 1))(x2d, blk)
    _tree_close(gk, gr, atol=1e-4)


def test_regularized_block_split_bwd_matches_merged(
    tiny_cfg, tiny_params, monkeypatch
):
    """The split C'/B' train backward (H/14-scale fallback) must produce
    the same grads as the merged train kernel."""
    from vit_tpu.ops.pallas import backward as B
    from vit_tpu.ops.pallas.trainable import encoder_block_train

    x2d, blk, t = _reg_case(tiny_cfg, tiny_params)
    seed = jnp.uint32(31337)

    def grads():
        def loss(x, b):
            return jnp.sum(
                encoder_block_train(
                    x, b, tiny_cfg.num_heads, t, tiny_cfg.layernorm_eps,
                    "exact", seed, 0.2, 0.3,
                ) ** 2
            )
        return jax.grad(loss, argnums=(0, 1))(x2d, blk)

    gx_m, gb_m = grads()
    monkeypatch.setattr(B, "MERGED_BWD_VMEM_BUDGET", 0)
    gx_s, gb_s = grads()
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_m), atol=1e-5)
    _tree_close(gb_s, gb_m, atol=1e-5)


def test_regularized_block_grads_partial_block_padding(
    tiny_cfg, tiny_params, monkeypatch
):
    """Regression: rows NOT a multiple of block_rows.  Pallas pads the
    final partial block with unspecified values (NaN in interpret mode);
    the train backwards must mask the dp_* row-scale operands too or
    0 * NaN poisons the dw/db accumulators (found via ToMe x dropout,
    whose merged token counts make b*t spill the 256-row block)."""
    from vit_tpu.ops.pallas import backward as B
    from vit_tpu.ops.pallas.trainable import (
        encoder_block_train,
        train_block_reference_2d,
    )

    x2d, blk, t = _reg_case(tiny_cfg, tiny_params, batch=60)  # rows=300
    assert x2d.shape[0] % 256 != 0 and x2d.shape[0] > 256
    seed = jnp.uint32(2468)
    args = (tiny_cfg.num_heads, t, tiny_cfg.layernorm_eps, "exact",
            seed, 0.25, 0.25)

    def check():
        def loss_k(x, b):
            return jnp.sum(jnp.sin(encoder_block_train(x, b, *args)))

        def loss_r(x, b):
            return jnp.sum(jnp.sin(train_block_reference_2d(x, b, *args)))

        gk = jax.grad(loss_k, argnums=(0, 1))(x2d, blk)
        assert not any(
            bool(jnp.isnan(g).any()) for g in jax.tree.leaves(gk)
        )
        gr = jax.grad(loss_r, argnums=(0, 1))(x2d, blk)
        _tree_close(gk, gr, atol=1e-4)

    check()  # merged train backward
    monkeypatch.setattr(B, "MERGED_BWD_VMEM_BUDGET", 0)
    check()  # split C'/B' train backwards


def test_regularized_block_zero_rates_is_identity(tiny_cfg, tiny_params):
    """p=0, rate=0 must equal the unregularized trainable block exactly
    (the drop-path threshold formula is exact at rate 0), so layer 0 of
    the linear drop-path schedule is a true no-op."""
    from vit_tpu.ops.pallas.trainable import encoder_block_train

    x2d, blk, t = _reg_case(tiny_cfg, tiny_params)
    a = encoder_block_train(
        x2d, blk, tiny_cfg.num_heads, t, tiny_cfg.layernorm_eps, "exact",
        jnp.uint32(5), 0.0, 0.0,
    )
    b = fused_encoder_block_trainable(
        x2d, blk, tiny_cfg.num_heads, t, tiny_cfg.layernorm_eps, "exact"
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mask_hash_statistics():
    """The position-hash masks must hit their keep probabilities and be
    sample-constant for drop-path / block-independent for dropout."""
    from vit_tpu.ops.pallas.fused_block import (
        DROP_SITE_DP_ATTN,
        DROP_SITE_MLP_INNER,
        drop_path_scale_rows,
        dropout_mask,
    )

    seed = jnp.uint32(42)
    p = 0.3
    m = np.asarray(dropout_mask(seed, DROP_SITE_MLP_INNER, 0, (512, 512), p))
    keep_frac = (m > 0).mean()
    assert abs(keep_frac - (1 - p)) < 0.01
    np.testing.assert_allclose(m[m > 0], 1.0 / (1 - p), rtol=1e-6)
    # block decomposition reproduces the same mask (fwd/bwd use different
    # block_rows)
    m_lo = np.asarray(dropout_mask(seed, DROP_SITE_MLP_INNER, 0, (128, 512), p))
    m_hi = np.asarray(dropout_mask(seed, DROP_SITE_MLP_INNER, 128, (128, 512), p))
    np.testing.assert_array_equal(m[:128], m_lo)
    np.testing.assert_array_equal(m[128:256], m_hi)

    # drop-path: constant within a sample, exact identity at rate 0
    t = 7
    s = np.asarray(drop_path_scale_rows(seed, DROP_SITE_DP_ATTN, 200, t, 0.4))
    s = s.reshape(200, t)
    assert (s == s[:, :1]).all()
    drop_frac = (s[:, 0] == 0).mean()
    assert abs(drop_frac - 0.4) < 0.1
    ones = np.asarray(drop_path_scale_rows(seed, DROP_SITE_DP_ATTN, 64, t, 0.0))
    np.testing.assert_array_equal(ones, np.ones_like(ones))
