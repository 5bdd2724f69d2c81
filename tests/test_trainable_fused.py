"""Trainable fused path: forward = Pallas kernels, backward = reference
formulation.  Gradients must match the pure-xla path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_tpu.models import vit
from vit_tpu.ops.dispatch import get_ops
from vit_tpu.runtime import trainer


def test_fused_train_forward_matches_xla(tiny_cfg, tiny_params, tiny_images):
    x = jnp.asarray(tiny_images)
    a = np.asarray(vit.forward(tiny_params, x, tiny_cfg, ops=get_ops("xla")))
    b = np.asarray(vit.forward(tiny_params, x, tiny_cfg, ops=get_ops("fused_train")))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_fused_train_grads_match_xla(tiny_cfg, tiny_params, tiny_images):
    x = jnp.asarray(tiny_images)
    labels = jnp.arange(len(tiny_images)) % tiny_cfg.num_classes

    def loss_fn(ops_name):
        def f(params):
            logits = vit.forward(params, x, tiny_cfg, ops=get_ops(ops_name))
            return trainer.cross_entropy_loss(logits, labels)

        return f

    la, ga = jax.value_and_grad(loss_fn("xla"))(tiny_params)
    lb, gb = jax.value_and_grad(loss_fn("fused_train"))(tiny_params)
    assert abs(float(la) - float(lb)) < 1e-5
    for pa, pb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=5e-4)


def test_train_step_with_fused_ops(tiny_cfg):
    optimizer = optax.sgd(0.1)
    params, opt_state = trainer.init_train_state(jax.random.key(0), tiny_cfg, optimizer)
    step = jax.jit(
        trainer.make_train_step(tiny_cfg, optimizer, ops=get_ops("fused_train"),
                                remat=False)
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(4, 3, tiny_cfg.image_size, tiny_cfg.image_size)), jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 4), jnp.int32)
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, images, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_dropout_training(tiny_cfg, tiny_params, tiny_images):
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, dropout=0.2)
    x = jnp.asarray(tiny_images)
    rng = jax.random.key(0)
    # deterministic (no rng): dropout off
    a = np.asarray(vit.forward(tiny_params, x, cfg))
    b = np.asarray(vit.forward(tiny_params, x, cfg))
    np.testing.assert_array_equal(a, b)
    # training mode: stochastic, different keys differ
    c = np.asarray(vit.forward(tiny_params, x, cfg, dropout_rng=rng))
    d = np.asarray(vit.forward(tiny_params, x, cfg, dropout_rng=jax.random.key(1)))
    assert np.abs(c - d).max() > 0
    # same key reproduces
    e = np.asarray(vit.forward(tiny_params, x, cfg, dropout_rng=rng))
    np.testing.assert_array_equal(c, e)


def test_dropout_train_step(tiny_cfg):
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, dropout=0.1)
    optimizer = optax.sgd(0.05)
    params, opt_state = trainer.init_train_state(jax.random.key(0), cfg, optimizer)
    step = jax.jit(
        trainer.make_train_step(cfg, optimizer, remat=False, use_dropout=True)
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(4, 3, cfg.image_size, cfg.image_size)), jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, 4), jnp.int32)
    for i in range(3):
        params, opt_state, loss = step(
            params, opt_state, images, labels, jax.random.key(i)
        )
        assert np.isfinite(float(loss))


def test_dropout_rejected_on_fused_path(tiny_cfg, tiny_params, tiny_images):
    import dataclasses
    import pytest as _pytest

    cfg = dataclasses.replace(tiny_cfg, dropout=0.1)
    with _pytest.raises(ValueError, match="dropout"):
        vit.forward(
            tiny_params, jnp.asarray(tiny_images), cfg,
            ops=get_ops("fused"), dropout_rng=jax.random.key(0),
        )


def test_mixed_precision_train_step(tiny_cfg):
    # fp32 master weights, bf16 compute: params stay fp32 across steps and
    # the loss still decreases.
    optimizer = optax.sgd(0.1)
    params, opt_state = trainer.init_train_state(jax.random.key(0), tiny_cfg, optimizer)
    step = jax.jit(
        trainer.make_train_step(
            tiny_cfg, optimizer, remat=False, compute_dtype=jnp.bfloat16
        )
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(4, 3, tiny_cfg.image_size, tiny_cfg.image_size)), jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 4), jnp.int32)
    losses = []
    for _ in range(4):
        params, opt_state, loss = step(params, opt_state, images, labels)
        losses.append(float(loss))
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def _rand_blk(key, d, f):
    ks = jax.random.split(key, 12)
    z = lambda i, shape, s=0.2: jax.random.normal(ks[i], shape, jnp.float32) * s  # noqa: E731
    return {
        "ln1_scale": 1.0 + z(0, (d,), 0.05), "ln1_bias": z(1, (d,), 0.05),
        "wqkv": z(2, (d, 3 * d)), "bqkv": z(3, (3 * d,), 0.05),
        "wo": z(4, (d, d)), "bo": z(5, (d,), 0.05),
        "ln2_scale": 1.0 + z(6, (d,), 0.05), "ln2_bias": z(7, (d,), 0.05),
        "w1": z(8, (d, f)), "b1": z(9, (f,), 0.05),
        "w2": z(10, (f, d)), "b2": z(11, (d,), 0.05),
    }


def test_long_seq_trainable_grads_match_autodiff():
    """Past the single-tile VMEM attention limit, the fused_train block
    routes through the blockwise flash-attention VJP (round-2 verdict #1);
    grads must match jnp autodiff end-to-end (fp32, interpret)."""
    from vit_tpu.ops.pallas.fused_block import VMEM_ATTENTION_MAX_T
    from vit_tpu.ops.pallas.trainable import (
        _reference_block_2d,
        encoder_block_trainable,
    )

    t = VMEM_ATTENTION_MAX_T + 40  # ragged flash blocks
    d, h, f = 64, 4, 128
    key = jax.random.key(7)
    x = jax.random.normal(jax.random.fold_in(key, 99), (t, d), jnp.float32)
    blk = _rand_blk(key, d, f)

    def loss_kernel(xx, p):
        return (encoder_block_trainable(xx, p, h, t, 1e-6) ** 2).sum()

    def loss_ref(xx, p):
        return (_reference_block_2d(xx, p, h, t, 1e-6, "exact") ** 2).sum()

    gx_a, gb_a = jax.grad(loss_kernel, (0, 1))(x, blk)
    gx_b, gb_b = jax.grad(loss_ref, (0, 1))(x, blk)
    scale = max(1.0, float(jnp.abs(gx_b).max()))
    np.testing.assert_allclose(
        np.asarray(gx_a) / scale, np.asarray(gx_b) / scale, atol=1e-4
    )
    for k in gb_b:
        s = max(1.0, float(jnp.abs(gb_b[k]).max()))
        np.testing.assert_allclose(
            np.asarray(gb_a[k]) / s, np.asarray(gb_b[k]) / s, atol=1e-4,
            err_msg=k,
        )


def test_fused_block_trainable_direct_long_seq_raises():
    """The inner megakernel VJP still guards its own precondition (the
    dispatcher in encoder_block_trainable is the supported entry)."""
    import pytest

    from vit_tpu.ops.pallas.fused_block import VMEM_ATTENTION_MAX_T
    from vit_tpu.ops.pallas.trainable import fused_encoder_block_trainable

    t = VMEM_ATTENTION_MAX_T + 8
    d, h = 64, 4
    x = jnp.zeros((t, d), jnp.float32)
    blk = _rand_blk(jax.random.key(0), d, 4 * d)

    def loss(p):
        return fused_encoder_block_trainable(x, p, h, t, 1e-6).sum()

    with pytest.raises(ValueError, match="seq_len"):
        jax.grad(loss)(blk)


def test_long_seq_mlp_vjp_mixed_bias_dtype():
    """The _ln_mlp_residual custom VJP must return each bias cotangent in
    the bias's OWN dtype — fp32 biases alongside bf16 GEMM weights (a
    common mixed-precision layout) previously crashed custom_vjp with a
    b2-cotangent dtype mismatch (cast to w2.dtype instead of b2.dtype)."""
    from vit_tpu.ops.pallas.trainable import _ln_mlp_residual_diff

    rows, d, f = 48, 64, 128
    key = jax.random.key(3)

    def z(i, shape, scale=0.3):
        return scale * jax.random.normal(jax.random.fold_in(key, i), shape)

    x1 = z(0, (rows, d)).astype(jnp.float32)
    s = (1.0 + z(1, (d,), 0.05)).astype(jnp.float32)
    b = z(2, (d,), 0.05).astype(jnp.float32)
    w1 = z(3, (d, f)).astype(jnp.bfloat16)
    b1 = z(4, (f,), 0.05).astype(jnp.float32)
    w2 = z(5, (f, d)).astype(jnp.bfloat16)
    b2 = z(6, (d,), 0.05).astype(jnp.float32)

    def loss(w2, b2):
        out = _ln_mlp_residual_diff(
            x1, s, b, w1, b1, w2, b2, 1e-6, "exact", True
        )
        return (out.astype(jnp.float32) ** 2).sum()

    gw2, gb2 = jax.grad(loss, (0, 1))(w2, b2)
    assert gw2.dtype == w2.dtype
    assert gb2.dtype == b2.dtype
    assert bool(jnp.isfinite(gb2).all())


def test_dropout_through_fused_train_forward(tiny_cfg, tiny_params, tiny_images):
    """vit.forward routes dropout_rng through the regularized megakernels
    on the fused_train ops table (VERDICT r3 item 1)."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, dropout=0.2, drop_path=0.2)
    x = jnp.asarray(tiny_images)
    ops = get_ops("fused_train")
    rng = jax.random.key(0)
    c = np.asarray(vit.forward(tiny_params, x, cfg, ops=ops, dropout_rng=rng))
    d = np.asarray(
        vit.forward(tiny_params, x, cfg, ops=ops, dropout_rng=jax.random.key(1))
    )
    assert np.abs(c - d).max() > 0  # stochastic across keys
    e = np.asarray(vit.forward(tiny_params, x, cfg, ops=ops, dropout_rng=rng))
    np.testing.assert_array_equal(c, e)  # same key reproduces
    # eval mode (no rng) is the unregularized fused path
    a = np.asarray(vit.forward(tiny_params, x, cfg, ops=ops))
    b = np.asarray(vit.forward(tiny_params, x, cfg))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_dropout_fused_train_dp_shard_map_step(tiny_cfg):
    """The dp shard_map trainer threads the dropout rng per shard."""
    import dataclasses

    from jax.sharding import Mesh

    if jax.device_count() < 2:
        import pytest as _pytest

        _pytest.skip("needs 2 virtual devices")
    cfg = dataclasses.replace(tiny_cfg, dropout=0.1, drop_path=0.1)
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    optimizer = optax.adamw(1e-3)
    params, opt_state = trainer.init_train_state(
        jax.random.key(0), cfg, optimizer
    )
    step = trainer.jit_train_step_dp_shard_map(
        cfg, optimizer, mesh, get_ops("fused_train"), remat=False,
        use_dropout=True,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(4, 3, cfg.image_size, cfg.image_size)), jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, 4), jnp.int32)
    losses = []
    for i in range(3):
        params, opt_state, loss = step(
            params, opt_state, images, labels, jax.random.key(i)
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()


def test_train_cli_dropout_validation(tiny_cfg, monkeypatch, capsys):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    base = ["--config", "vit_tiny_test", "--steps", "1", "--batch", "4",
            "--no-compile-cache", "--dropout", "0.1"]
    # fused_train + dropout on a dp mesh: accepted
    assert train_main(base + ["--ops", "fused_train", "--dp", "1"]) == 0
    # ... but not under tensor/pipeline parallelism
    assert train_main(base + ["--ops", "fused_train", "--tp", "2"]) == 2
    capsys.readouterr()
