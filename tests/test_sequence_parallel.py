"""Sequence parallelism / ring attention (parallel/sequence.py) on the
virtual CPU mesh: tokens shard over 'sp', K/V blocks ride a ppermute ring,
softmax combines online — results must match the unsharded reference."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vit_tpu.config import VIT_B_16
from vit_tpu.models import vit
from vit_tpu.ops import reference
from vit_tpu.parallel import make_mesh
from vit_tpu.parallel.sequence import attention_sp, shard_forward_sp

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs 4 (virtual) devices"
)


@pytest.fixture(scope="module")
def cfg_sp():
    # 5 tokens ((32/16)^2 + CLS) over sp=4 -> t_local=2, last shard ALL
    # padding: exercises the mask + online-softmax guards
    return dataclasses.replace(
        VIT_B_16, depth=3, embed_dim=64, num_heads=4, image_size=32,
        patch_size=16, num_classes=13, name="vit_tiny_sp",
    )


def test_ring_attention_matches_reference(cfg_sp):
    """attention_sp under shard_map == reference.attention, token-sharded."""
    d, h = 64, 4
    t = 24  # divides sp=4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, t, d)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * d,)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)

    want = np.asarray(reference.attention(x, wqkv, bqkv, wo, bo, h))

    mesh = make_mesh({"sp": 4}, jax.devices()[:4])
    valid = jnp.ones((4, t // 4), bool)

    def local(xl):
        return attention_sp(xl, wqkv, bqkv, wo, bo, h, valid, "sp")

    got = np.asarray(
        jax.jit(
            jax.shard_map(
                local, mesh=mesh, in_specs=P(None, "sp", None),
                out_specs=P(None, "sp", None), check_vma=False,
            )
        )(x)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sp_forward_matches_single_device(cfg_sp):
    """Full SP forward (LN/MLP local, ring attention, psum'd CLS) ==
    unsharded xla forward — including the all-padding last shard."""
    params = vit.init_params(jax.random.key(0), cfg_sp)
    images = np.asarray(
        jax.random.normal(jax.random.key(1), (4, 3, 32, 32), jnp.float32)
    )
    want = np.asarray(jax.jit(vit.logits_fn(cfg_sp))(params, images))
    mesh = make_mesh({"sp": 4}, jax.devices()[:4])
    got = np.asarray(
        jax.jit(shard_forward_sp(cfg_sp, mesh))(params, jnp.asarray(images))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sp_forward_partial_padding_shard(cfg_sp):
    # 17 tokens ((64/16)^2 + CLS) over sp=4 -> partial padding on one shard
    cfg = dataclasses.replace(cfg_sp, image_size=64, name="vit_tiny_sp64")
    params = vit.init_params(jax.random.key(2), cfg)
    images = np.asarray(
        jax.random.normal(jax.random.key(3), (2, 3, 64, 64), jnp.float32)
    )
    want = np.asarray(jax.jit(vit.logits_fn(cfg))(params, images))
    mesh = make_mesh({"sp": 4}, jax.devices()[:4])
    got = np.asarray(
        jax.jit(shard_forward_sp(cfg, mesh))(params, jnp.asarray(images))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sp_forward_row_window_clamp(cfg_sp):
    """image_size=96: gh=6, 37 tokens over sp=4 -> the patch-embed row
    window is rows=5 < gh=6, exercising the rw clamp and window-offset
    arithmetic no smaller grid reaches."""
    cfg = dataclasses.replace(cfg_sp, image_size=96, name="vit_tiny_sp96")
    params = vit.init_params(jax.random.key(10), cfg)
    images = np.asarray(
        jax.random.normal(jax.random.key(11), (2, 3, 96, 96), jnp.float32)
    )
    want = np.asarray(jax.jit(vit.logits_fn(cfg))(params, images))
    mesh = make_mesh({"sp": 4}, jax.devices()[:4])
    got = np.asarray(
        jax.jit(shard_forward_sp(cfg, mesh))(params, jnp.asarray(images))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sp_composes_with_dp(cfg_sp):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    params = vit.init_params(jax.random.key(4), cfg_sp)
    images = np.asarray(
        jax.random.normal(jax.random.key(5), (4, 3, 32, 32), jnp.float32)
    )
    want = np.asarray(jax.jit(vit.logits_fn(cfg_sp))(params, images))
    mesh = make_mesh({"dp": 2, "sp": 4}, jax.devices()[:8])
    got = np.asarray(
        jax.jit(shard_forward_sp(cfg_sp, mesh))(params, jnp.asarray(images))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sp_long_sequence_8ring(cfg_sp):
    """The scaling case SP exists for: 4097 tokens (1024px / p16) over an
    8-chip ring — each shard holds 513 tokens, no (T, T) tensor or full
    K/V ever materializes per shard — still matches the unsharded
    reference forward."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = dataclasses.replace(
        cfg_sp, image_size=1024, depth=2, name="vit_tiny_sp_long"
    )
    params = vit.init_params(jax.random.key(20), cfg)
    images = np.asarray(
        jax.random.normal(jax.random.key(21), (1, 3, 1024, 1024), jnp.float32)
    )
    want = np.asarray(jax.jit(vit.logits_fn(cfg))(params, images))
    mesh = make_mesh({"sp": 8}, jax.devices()[:8])
    got = np.asarray(
        jax.jit(shard_forward_sp(cfg, mesh))(params, jnp.asarray(images))
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sp_requires_axis(cfg_sp):
    mesh = make_mesh({"dp": 4}, jax.devices()[:4])
    with pytest.raises(ValueError, match="'sp' axis"):
        shard_forward_sp(cfg_sp, mesh)


def test_sp_train_mixed_precision(cfg_sp):
    """bf16-compute SP step: fp32 masters, finite decreasing loss."""
    import optax

    from vit_tpu.parallel.sequence import make_sp_train_step
    from vit_tpu.runtime import trainer

    optimizer = optax.adamw(1e-3)
    params, opt_state = trainer.init_train_state(
        jax.random.key(8), cfg_sp, optimizer
    )
    mesh = make_mesh({"sp": 4}, jax.devices()[:4])
    step = make_sp_train_step(cfg_sp, optimizer, mesh,
                              compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(4, 3, 32, 32)), jnp.float32)
    y = jnp.asarray(rng.integers(0, cfg_sp.num_classes, 4), jnp.int32)
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses) and losses[-1] < losses[0]
    # masters stay fp32
    assert params["pos_embed"].dtype == jnp.float32


def test_sp_fused_forward_matches_single_device(cfg_sp):
    """VERDICT r4 item 8: the ring over the fused kernels.  The
    fused_train SP forward (ring attention + split Pallas out_proj/MLP
    kernels) must match the unsharded xla forward, padding shard
    included."""
    params = vit.init_params(jax.random.key(0), cfg_sp)
    images = np.asarray(
        jax.random.normal(jax.random.key(1), (4, 3, 32, 32), jnp.float32)
    )
    want = np.asarray(jax.jit(vit.logits_fn(cfg_sp))(params, images))
    mesh = make_mesh({"sp": 4}, jax.devices()[:4])
    got = np.asarray(
        jax.jit(shard_forward_sp(cfg_sp, mesh, ops_name="fused_train"))(
            params, jnp.asarray(images)
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sp_fused_train_step_matches_xla_ring(cfg_sp):
    """One SGD step through the kernel-path ring == the jnp-ring step
    (the split kernels' hand-written backwards transpose through the
    ppermute ring identically to autodiff)."""
    import optax

    from vit_tpu.parallel.sequence import make_sp_train_step
    from vit_tpu.runtime import trainer

    optimizer = optax.sgd(0.05)
    params, opt_state = trainer.init_train_state(
        jax.random.key(12), cfg_sp, optimizer
    )
    mesh = make_mesh({"sp": 4}, jax.devices()[:4])
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(4, 3, 32, 32)), jnp.float32)
    y = jnp.asarray(rng.integers(0, cfg_sp.num_classes, 4), jnp.int32)

    step_x = make_sp_train_step(cfg_sp, optimizer, mesh, remat=False)
    step_f = make_sp_train_step(cfg_sp, optimizer, mesh,
                                ops_name="fused_train")
    p_x, _, l_x = step_x(params, opt_state, x, y)
    p_f, _, l_f = step_f(params, opt_state, x, y)
    assert abs(float(l_x) - float(l_f)) < 1e-5
    for a, b in zip(jax.tree.leaves(p_x), jax.tree.leaves(p_f)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_train_cli_sp_fused(cfg_sp, monkeypatch, capsys):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_sp", cfg_sp)
    rc = train_main([
        "--config", "vit_tiny_sp", "--steps", "2", "--batch", "4",
        "--dp", "2", "--sp", "4", "--ops", "fused_train",
        "--no-compile-cache",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ring size 4 (ops fused_train)" in out and "step    1" in out


def test_train_cli_sp(cfg_sp, monkeypatch, capsys):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_sp", cfg_sp)
    rc = train_main([
        "--config", "vit_tiny_sp", "--steps", "2", "--batch", "4",
        "--dp", "2", "--sp", "4", "--ops", "xla", "--label-smoothing", "0.1",
        "--no-compile-cache",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sequence parallel: ring size 4" in out and "step    1" in out


def test_train_cli_sp_rejects_tp(cfg_sp, monkeypatch, capsys):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_sp", cfg_sp)
    rc = train_main([
        "--config", "vit_tiny_sp", "--steps", "1", "--batch", "4",
        "--sp", "2", "--tp", "2", "--no-compile-cache",
    ])
    assert rc == 2
    assert "--sp composes with --dp only" in capsys.readouterr().err


def test_sp_train_step_does_not_donate_aliased_params(cfg_sp):
    """cli/train_setup places params with device_put(NamedSharding(mesh,
    P())), which ALIASES the source when the sharding already matches; the
    sp step must not donate (same rule as make_pp_train_step) or the
    caller's buffers — still held by checkpoint/eval code — get deleted."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec

    from vit_tpu.parallel.sequence import make_sp_train_step
    from vit_tpu.runtime import trainer

    optimizer = optax.adamw(1e-3)
    params, opt_state = trainer.init_train_state(
        jax.random.key(8), cfg_sp, optimizer
    )
    mesh = make_mesh({"sp": 4}, jax.devices()[:4])
    rep = NamedSharding(mesh, PartitionSpec())
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    # second device_put with matching sharding aliases the same buffers
    p_alias = jax.device_put(params, rep)
    o_alias = jax.device_put(opt_state, rep)
    step = make_sp_train_step(cfg_sp, optimizer, mesh)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(4, 3, 32, 32)), jnp.float32)
    y = jnp.asarray(rng.integers(0, cfg_sp.num_classes, 4), jnp.int32)
    step(p_alias, o_alias, x, y)
    # the original (aliased) arrays must still be readable after the step
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_sp_train_step_matches_single_device(cfg_sp):
    """Grads through the ring (transposed ppermute hops) must reproduce the
    unsharded train step: same loss, same updated params."""
    import optax

    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.parallel.sequence import make_sp_train_step
    from vit_tpu.runtime import trainer

    optimizer = optax.sgd(0.1)  # linear in grads: exact-ish comparison
    params, opt_state = trainer.init_train_state(
        jax.random.key(6), cfg_sp, optimizer
    )
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 3, 32, 32)), jnp.float32)
    y = jnp.asarray(rng.integers(0, cfg_sp.num_classes, 4), jnp.int32)

    ref_step = jax.jit(trainer.make_train_step(
        cfg_sp, optimizer, get_ops("xla"), remat=False
    ))
    p_ref, _, l_ref = ref_step(params, opt_state, x, y)

    mesh = make_mesh({"sp": 4}, jax.devices()[:4])
    sp_step = make_sp_train_step(cfg_sp, optimizer, mesh)
    p_sp, _, l_sp = sp_step(params, opt_state, x, y)

    assert float(l_ref) == pytest.approx(float(l_sp), abs=1e-5)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
