"""Quantization-aware training (ops/qat.py): the fake-int8 forward must
reproduce the int8 deployment math (ops/quant.py) exactly, and the
straight-through backward must train."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_tpu.models import vit
from vit_tpu.ops import quant, reference
from vit_tpu.ops.dispatch import get_ops
from vit_tpu.ops.qat import (
    QAT_OPS,
    fake_quant_act,
    fake_quant_weight,
    mlp_qat,
    ste_round,
)
from vit_tpu.runtime import trainer


def test_ste_round_identity_gradient():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16,)), jnp.float32)
    g = jax.grad(lambda v: ste_round(v * 3.0).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 3.0, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(ste_round(x)), np.round(np.asarray(x)))


def test_fake_quant_matches_int8_dequant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(5, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    x_q, s_x = quant.quantize_activations(x)
    np.testing.assert_allclose(
        np.asarray(fake_quant_act(x)),
        np.asarray(x_q.astype(jnp.float32) * s_x[..., None]),
        atol=1e-7,
    )
    w_q, s_w = quant.quantize_weight(w)
    np.testing.assert_allclose(
        np.asarray(fake_quant_weight(w)),
        np.asarray(w_q.astype(jnp.float32) * s_w[None, :]),
        atol=1e-7,
    )


def test_qat_mlp_equals_w8a8_reference():
    """mlp_qat == the deployed int8 GEMM composition (linear_w8a8 with the
    same grouping), bit-for-bit up to fp32 summation."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(7, 24)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(24, 96)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(96,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(96, 24)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(24,)) * 0.1, jnp.float32)

    got = np.asarray(mlp_qat(x, w1, b1, w2, b2))

    w1_q, s1 = quant.quantize_weight(w1)
    w2_q, s2 = quant.quantize_weight(w2)
    h = quant.linear_w8a8(x, w1_q, s1, b1)
    h = reference.gelu_exact(h)
    want = np.asarray(quant.linear_w8a8(h, w2_q, s2, b2))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_qat_forward_finite_and_close_to_fp(tiny_cfg, tiny_params):
    x = jnp.asarray(
        np.random.default_rng(3).normal(
            size=(2, 3, tiny_cfg.image_size, tiny_cfg.image_size)
        ),
        jnp.float32,
    )
    fp = np.asarray(jax.jit(vit.logits_fn(tiny_cfg))(tiny_params, x))
    qa = np.asarray(
        jax.jit(vit.logits_fn(tiny_cfg, QAT_OPS))(tiny_params, x)
    )
    assert np.isfinite(qa).all()
    # int8 grouping keeps logits in the same ballpark (not identical)
    assert np.abs(qa - fp).max() < 1.0
    assert np.abs(qa - fp).max() > 0  # the quantizer actually does something


def test_qat_trains_and_grads_flow(tiny_cfg):
    optimizer = optax.adamw(1e-3)
    params, opt_state = trainer.init_train_state(
        jax.random.key(0), tiny_cfg, optimizer
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(
        rng.normal(size=(8, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
        jnp.float32,
    )
    y = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 8), jnp.int32)
    step = jax.jit(trainer.make_train_step(
        tiny_cfg, optimizer, get_ops("qat"), remat=False
    ))
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # STE gradients actually optimize
    # the quantized weights received nonzero grads (they changed)
    p2 = jax.device_get(params)
    assert not np.array_equal(
        np.asarray(p2["blocks"]["wqkv"]), np.zeros(1)
    )


def test_qat_then_deploy_int8(tiny_cfg):
    """The QAT forward predicts the deployed int8 path: after a few QAT
    steps, quantize_params + the quant reference math must match the QAT
    forward closely (the training objective IS the deployment math)."""
    optimizer = optax.sgd(1e-2)
    params, opt_state = trainer.init_train_state(
        jax.random.key(1), tiny_cfg, optimizer
    )
    rng = np.random.default_rng(5)
    x = jnp.asarray(
        rng.normal(size=(4, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
        jnp.float32,
    )
    y = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 4), jnp.int32)
    step = jax.jit(trainer.make_train_step(
        tiny_cfg, optimizer, get_ops("qat"), remat=False
    ))
    for _ in range(3):
        params, opt_state, _ = step(params, opt_state, x, y)

    qat_logits = np.asarray(
        jax.jit(vit.logits_fn(tiny_cfg, QAT_OPS))(params, x)
    )

    # deployed math: per-layer w8a8 GEMMs with the same grouping
    qp = quant.quantize_params(jax.device_get(params))

    def deployed(params_q, images):
        p = params_q
        h = reference.patch_embed(
            images, p["patch_embed"]["kernel"], p["patch_embed"]["bias"],
            tiny_cfg.patch_size,
        )
        h = reference.add_cls_and_pos(h, p["cls_token"], p["pos_embed"])
        for l in range(tiny_cfg.depth):
            blk = jax.tree.map(lambda a: a[l], p["blocks"])
            z = reference.layer_norm(
                h, blk["ln1_scale"], blk["ln1_bias"], tiny_cfg.layernorm_eps
            )
            qkv = quant.linear_w8a8(
                z, blk["wqkv"], blk["wqkv_scale"], blk["bqkv"]
            )
            # reuse the fp attention core on the dequantized QKV
            t, d = z.shape[-2], tiny_cfg.embed_dim
            hd = d // tiny_cfg.num_heads
            qkv = qkv.reshape(*z.shape[:-1], tiny_cfg.num_heads, 3, hd)
            q = jnp.moveaxis(qkv[..., 0, :], -2, -3)
            k = jnp.moveaxis(qkv[..., 1, :], -2, -3)
            v = jnp.moveaxis(qkv[..., 2, :], -2, -3)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           precision=jax.lax.Precision.HIGHEST) / np.sqrt(hd)
            pr = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", pr, v,
                             precision=jax.lax.Precision.HIGHEST)
            ctx = jnp.moveaxis(ctx, -3, -2).reshape(*z.shape)
            h = h + reference.linear(ctx, blk["wo"], blk["bo"])
            z = reference.layer_norm(
                h, blk["ln2_scale"], blk["ln2_bias"], tiny_cfg.layernorm_eps
            )
            m = quant.linear_w8a8(z, blk["w1"], blk["w1_scale"], blk["b1"])
            m = reference.gelu_exact(m)
            m = quant.linear_w8a8(m, blk["w2"], blk["w2_scale"], blk["b2"])
            h = h + m
        h = reference.layer_norm(
            h, p["ln_final"]["scale"], p["ln_final"]["bias"],
            tiny_cfg.layernorm_eps,
        )
        return reference.linear(
            h[..., 0, :], p["head"]["kernel"], p["head"]["bias"]
        )

    dep_logits = np.asarray(deployed(qp, x))
    np.testing.assert_allclose(qat_logits, dep_logits, atol=5e-4, rtol=1e-4)


def test_qat_mixed_precision_step(tiny_cfg):
    """QAT composes with bf16 compute (fp32 masters): finite decreasing
    loss, fake-quant scales computed on the bf16 activations."""
    optimizer = optax.adamw(1e-3)
    params, opt_state = trainer.init_train_state(
        jax.random.key(2), tiny_cfg, optimizer
    )
    rng = np.random.default_rng(6)
    x = jnp.asarray(
        rng.normal(size=(8, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
        jnp.float32,
    )
    y = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 8), jnp.int32)
    step = jax.jit(trainer.make_train_step(
        tiny_cfg, optimizer, get_ops("qat"), remat=False,
        compute_dtype=jnp.bfloat16,
    ))
    losses = []
    for _ in range(4):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses) and losses[-1] < losses[0]
    assert params["pos_embed"].dtype == jnp.float32  # masters stay fp32


def test_qat_trains_under_gspmd_tp(tiny_cfg):
    """QAT is pure jnp, so it shards under GSPMD tp — the per-channel
    absmax reduces over the row-sharded in-dim via an XLA collective."""
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    from vit_tpu.parallel import make_mesh

    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    optimizer = optax.adamw(1e-3)
    params, opt_state = trainer.init_train_state(
        jax.random.key(3), tiny_cfg, optimizer
    )
    step = trainer.jit_train_step_for_mesh(
        tiny_cfg, optimizer, mesh, params, opt_state, ops=get_ops("qat"),
        remat=False,
    )
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.normal(size=(4, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
        jnp.float32,
    )
    y = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 4), jnp.int32)
    # sharded step must agree with the single-device QAT step
    s1 = jax.jit(trainer.make_train_step(
        tiny_cfg, optimizer, get_ops("qat"), remat=False
    ))
    p_ref, _, l_ref = s1(params, opt_state, x, y)
    from vit_tpu.parallel import shard_params

    p_sh = shard_params(params, mesh)
    o_sh = optimizer.init(p_sh)
    _, _, l_tp = step(p_sh, o_sh, x, y)
    assert float(l_ref) == pytest.approx(float(l_tp), abs=1e-5)


def test_train_cli_qat(tiny_cfg, monkeypatch, capsys):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "2", "--batch", "4",
        "--dp", "1", "--ops", "qat", "--no-compile-cache",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ops: qat" in out and "step    1" in out
