"""Pipeline-parallel forward over the stacked-layer seam (parallel/pipeline.py)
on the virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec

from vit_tpu.config import VIT_B_16
from vit_tpu.models import vit
from vit_tpu.parallel import make_mesh
from vit_tpu.parallel.pipeline import pp_param_pspecs, shard_forward_pp

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs 4 (virtual) devices"
)


@pytest.fixture(scope="module")
def cfg4():
    # depth divisible by pp=2 and pp=4
    return dataclasses.replace(
        VIT_B_16, depth=4, embed_dim=64, num_heads=4, image_size=32,
        patch_size=16, num_classes=11, name="vit_tiny_pp",
    )


@pytest.fixture(scope="module")
def params4(cfg4):
    return vit.init_params(jax.random.key(0), cfg4)


def _place(params, mesh):
    specs = pp_param_pspecs(params)
    return jax.device_put(
        params,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, PartitionSpec),
        ),
    )


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_matches_single_device(cfg4, params4, pp):
    images = np.asarray(
        jax.random.normal(jax.random.key(1), (8, 3, 32, 32), jnp.float32)
    )
    want = np.asarray(jax.jit(vit.logits_fn(cfg4))(params4, images))
    mesh = make_mesh({"pp": pp}, jax.devices()[:pp])
    fwd = jax.jit(shard_forward_pp(cfg4, mesh, num_microbatches=4))
    got = np.asarray(fwd(_place(params4, mesh), jnp.asarray(images)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pp_microbatch_count_independent(cfg4, params4):
    # Pipeline schedule must not change results with the microbatch split.
    images = jnp.asarray(
        np.random.default_rng(2).normal(size=(8, 3, 32, 32)), jnp.float32
    )
    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    p = _place(params4, mesh)
    a = np.asarray(jax.jit(shard_forward_pp(cfg4, mesh, 2))(p, images))
    b = np.asarray(jax.jit(shard_forward_pp(cfg4, mesh, 8))(p, images))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_pp_validates_divisibility(cfg4):
    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    bad = dataclasses.replace(cfg4, depth=3, name="odd")
    with pytest.raises(ValueError, match="must divide depth"):
        shard_forward_pp(bad, mesh, 2)


def test_pp_train_step_matches_single_device(cfg4, params4):
    """Pipeline-parallel training: one SGD step over pp=2 must match the
    unsharded step (grads flow backward through the microbatch schedule)."""
    import optax

    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.parallel.pipeline import make_pp_train_step
    from vit_tpu.runtime import trainer

    optimizer = optax.sgd(0.05)
    opt0 = optimizer.init(params4)
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.normal(size=(8, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg4.num_classes, 8), jnp.int32)

    step_ref = jax.jit(trainer.make_train_step(cfg4, optimizer, get_ops("xla"),
                                               remat=False))
    p_ref, _, l_ref = step_ref(params4, opt0, images, labels)

    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    p_pp = _place(params4, mesh)
    opt_pp = optimizer.init(p_pp)
    step_pp = make_pp_train_step(cfg4, optimizer, mesh, num_microbatches=4)
    p_out, _, l_pp = step_pp(p_pp, opt_pp, jnp.asarray(images), labels)

    assert abs(float(l_ref) - float(l_pp)) < 1e-5
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(jax.device_get(p_out))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_pp_train_loss_decreases(cfg4, params4):
    import optax

    from vit_tpu.parallel.pipeline import make_pp_train_step

    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    optimizer = optax.adamw(1e-3)
    params = _place(params4, mesh)
    opt_state = optimizer.init(params)
    step = make_pp_train_step(cfg4, optimizer, mesh, num_microbatches=2)
    rng = np.random.default_rng(6)
    images = jnp.asarray(rng.normal(size=(4, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg4.num_classes, 4), jnp.int32)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, images, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pp_fused_train_step_matches_single_device(cfg4, params4):
    """PP training through the fused Pallas kernels (custom VJP backward
    megakernels): one SGD step over pp=2 must match the unsharded
    fused_train step."""
    import optax

    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.parallel.pipeline import make_pp_train_step
    from vit_tpu.runtime import trainer

    optimizer = optax.sgd(0.05)
    opt0 = optimizer.init(params4)
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.normal(size=(8, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg4.num_classes, 8), jnp.int32)

    step_ref = jax.jit(
        trainer.make_train_step(cfg4, optimizer, get_ops("fused_train"),
                                remat=False)
    )
    p_ref, _, l_ref = step_ref(params4, opt0, images, labels)

    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    p_pp = _place(params4, mesh)
    opt_pp = optimizer.init(p_pp)
    step_pp = make_pp_train_step(cfg4, optimizer, mesh, num_microbatches=4,
                                 ops_name="fused_train")
    p_out, _, l_pp = step_pp(p_pp, opt_pp, jnp.asarray(images), labels)

    assert abs(float(l_ref) - float(l_pp)) < 1e-5
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(jax.device_get(p_out))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("ops_name", ["xla", "fused_train"])
def test_pp_dropout_train_matches_plain_step(cfg4, params4, ops_name):
    """VERDICT r4 item 6a: dropout/drop-path x pp.  With microbatches=1
    the pipelined regularized step must match the plain dp step under the
    SAME rng — the per-layer seeds/rates shard over 'pp' with the blocks,
    so ABSOLUTE layer indices drive the masks on every stage (pp=2 is the
    real gate; pp would silently restart the drop-path schedule per stage
    otherwise)."""
    import optax

    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.parallel.pipeline import make_pp_train_step
    from vit_tpu.runtime import trainer

    rcfg = dataclasses.replace(cfg4, dropout=0.2, drop_path=0.3)
    optimizer = optax.sgd(0.05)
    opt0 = optimizer.init(params4)
    rng = np.random.default_rng(8)
    images = jnp.asarray(rng.normal(size=(8, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg4.num_classes, 8), jnp.int32)
    step_rng = jax.random.key(21)

    step_ref = jax.jit(
        trainer.make_train_step(rcfg, optimizer, get_ops(ops_name),
                                remat=False, use_dropout=True)
    )
    p_ref, _, l_ref = step_ref(params4, opt0, images, labels, step_rng)

    for pp in (1, 2):
        mesh = make_mesh({"pp": pp}, jax.devices()[:pp])
        p_pp = _place(params4, mesh)
        opt_pp = optimizer.init(p_pp)
        step_pp = make_pp_train_step(
            rcfg, optimizer, mesh, num_microbatches=1, ops_name=ops_name,
            use_dropout=True,
        )
        p_out, _, l_pp = step_pp(p_pp, opt_pp, images, labels, step_rng)
        assert abs(float(l_ref) - float(l_pp)) < 1e-5, (pp, ops_name)
        for a, b in zip(
            jax.tree.leaves(p_ref), jax.tree.leaves(jax.device_get(p_out))
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )


def test_pp_dropout_train_microbatched(cfg4, params4):
    """Microbatched regularized pipeline: masks decorrelate across
    microbatches (loss differs from m=1), training stays finite and
    deterministic given the rng, and zero rates reproduce the
    unregularized pipeline exactly."""
    import optax

    from vit_tpu.parallel.pipeline import make_pp_train_step

    rcfg = dataclasses.replace(cfg4, dropout=0.2, drop_path=0.3)
    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    optimizer = optax.sgd(0.05)
    rng = np.random.default_rng(9)
    images = jnp.asarray(rng.normal(size=(8, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg4.num_classes, 8), jnp.int32)
    step_rng = jax.random.key(33)

    params = _place(params4, mesh)
    opt0 = optimizer.init(params)

    step_m4 = make_pp_train_step(
        rcfg, optimizer, mesh, num_microbatches=4, ops_name="fused_train",
        use_dropout=True,
    )
    _, _, l_a = step_m4(params, opt0, images, labels, step_rng)
    _, _, l_b = step_m4(params, opt0, images, labels, step_rng)
    assert np.isfinite(float(l_a))
    np.testing.assert_array_equal(np.asarray(l_a), np.asarray(l_b))

    step_m1 = make_pp_train_step(
        rcfg, optimizer, mesh, num_microbatches=1, ops_name="fused_train",
        use_dropout=True,
    )
    _, _, l_m1 = step_m1(params, opt0, images, labels, step_rng)
    assert abs(float(l_a) - float(l_m1)) > 1e-6  # decorrelated masks

    # zero rates: the regularized schedule is a true no-op
    step_plain = make_pp_train_step(
        cfg4, optimizer, mesh, num_microbatches=4, ops_name="fused_train",
    )
    step_zero = make_pp_train_step(
        cfg4, optimizer, mesh, num_microbatches=4, ops_name="fused_train",
        use_dropout=True,
    )
    _, _, l_p = step_plain(params, opt0, images, labels)
    _, _, l_z = step_zero(params, opt0, images, labels, step_rng)
    np.testing.assert_array_equal(np.asarray(l_p), np.asarray(l_z))


def test_pp_dropout_rejects_tp(cfg4):
    from vit_tpu.parallel.pipeline import shard_forward_pp

    mesh = make_mesh({"pp": 2, "tp": 2}, jax.devices()[:4])
    with pytest.raises(ValueError, match="regularized"):
        shard_forward_pp(cfg4, mesh, 2, ops_name="fused", use_dropout=True)


def test_pp_train_rejects_nondifferentiable_fused(cfg4):
    import optax

    from vit_tpu.parallel.pipeline import make_pp_train_step

    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    with pytest.raises(ValueError, match="fused_train"):
        make_pp_train_step(cfg4, optax.sgd(0.1), mesh, 2, ops_name="fused")


def _place3d(params, mesh):
    specs = pp_param_pspecs(params, mesh.axis_names)
    return jax.device_put(
        params,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, PartitionSpec),
        ),
    )


def test_pp3d_fused_matches_single_device(cfg4, params4):
    """Full 3D parallelism (dp=2 x pp=2 x tp=2) through the fused Pallas
    kernels: batch sharded, layer stack staged, heads/MLP-hidden sharded."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from vit_tpu.ops.dispatch import get_ops

    images = np.asarray(
        jax.random.normal(jax.random.key(11), (8, 3, 32, 32), jnp.float32)
    )
    want = np.asarray(
        jax.jit(vit.logits_fn(cfg4, get_ops("fused")))(params4, images)
    )
    mesh = make_mesh({"dp": 2, "pp": 2, "tp": 2}, jax.devices()[:8])
    fwd = jax.jit(shard_forward_pp(cfg4, mesh, num_microbatches=2,
                                   ops_name="fused"))
    got = np.asarray(fwd(_place3d(params4, mesh), jnp.asarray(images)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pp3d_fused_train_step_matches_single_device(cfg4, params4):
    """3D-parallel TRAINING (dp x pp x tp) through the fused kernels with
    the hand-written backward megakernels: one SGD step must match the
    unsharded fused_train step."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import optax

    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.parallel.pipeline import make_pp_train_step
    from vit_tpu.runtime import trainer

    optimizer = optax.sgd(0.05)
    opt0 = optimizer.init(params4)
    rng = np.random.default_rng(13)
    images = jnp.asarray(rng.normal(size=(8, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg4.num_classes, 8), jnp.int32)

    step_ref = jax.jit(
        trainer.make_train_step(cfg4, optimizer, get_ops("fused_train"),
                                remat=False)
    )
    p_ref, _, l_ref = step_ref(params4, opt0, images, labels)

    mesh = make_mesh({"dp": 2, "pp": 2, "tp": 2}, jax.devices()[:8])
    p_3d = _place3d(params4, mesh)
    opt_3d = optimizer.init(p_3d)
    step_3d = make_pp_train_step(cfg4, optimizer, mesh, num_microbatches=2,
                                 ops_name="fused_train")
    p_out, _, l_3d = step_3d(p_3d, opt_3d, images, labels)

    assert abs(float(l_ref) - float(l_3d)) < 1e-5
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(jax.device_get(p_out))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_pp_tp_quant_matches_single_device(cfg4, params4):
    """pp x tp over the W8A8 int8 path: the tp block's pmax/int32-psum keep
    the quantization grouping exact, so staged+sharded must equal the
    single-device quant engine bit-for-bit (same arithmetic order)."""
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    from vit_tpu.ops import quant
    from vit_tpu.runtime import InferenceEngine

    images = np.asarray(
        jax.random.normal(jax.random.key(17), (4, 3, 32, 32), jnp.float32)
    )
    single = InferenceEngine(cfg4, params4, dtype="float32", ops="quant",
                             batch_pad=4)
    want = np.asarray(single.logits(images))

    qparams = quant.cast_quantized_params(
        quant.quantize_params(params4), jnp.float32
    )
    mesh = make_mesh({"pp": 2, "tp": 2}, jax.devices()[:4])
    fwd = jax.jit(shard_forward_pp(cfg4, mesh, num_microbatches=2,
                                   ops_name="quant"))
    got = np.asarray(fwd(_place3d(qparams, mesh), jnp.asarray(images)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pp3d_validates_ops(cfg4):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh({"dp": 2, "pp": 2, "tp": 2}, jax.devices()[:8])
    with pytest.raises(ValueError, match="tp composition"):
        shard_forward_pp(cfg4, mesh, 2, ops_name="xla")


def test_pp_fused_kernels_match_single_device(cfg4, params4):
    # Pipeline over the fused Pallas megakernels (inference).
    images = np.asarray(
        jax.random.normal(jax.random.key(9), (8, 3, 32, 32), jnp.float32)
    )
    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.models import vit as vit_mod

    want = np.asarray(
        jax.jit(vit_mod.logits_fn(cfg4, get_ops("fused")))(params4, images)
    )
    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    fwd = jax.jit(shard_forward_pp(cfg4, mesh, num_microbatches=4,
                                   ops_name="fused"))
    got = np.asarray(fwd(_place(params4, mesh), jnp.asarray(images)))
    np.testing.assert_allclose(got, want, atol=1e-5)
