"""Multi-device tests on the virtual 8-device CPU mesh: sharded inference
parity, TP/DP sharding rules, and a full sharded training step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_tpu.models import vit
from vit_tpu.parallel import (
    batch_sharding,
    make_mesh,
    mesh_shape_for,
    param_shardings,
    shard_params,
)
from vit_tpu.runtime import InferenceEngine, trainer

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def test_make_mesh_shapes():
    mesh = make_mesh({"dp": 4, "tp": 2})
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh({"dp": 3, "tp": 2})


def test_sharded_inference_matches_single_device(tiny_cfg, tiny_params, tiny_images):
    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    single = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=4)
    sharded = InferenceEngine(
        tiny_cfg, tiny_params, dtype="float32", mesh=mesh, batch_pad=4
    )
    a = np.asarray(single.logits(tiny_images))
    b = np.asarray(sharded.logits(tiny_images))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_param_sharding_rules(tiny_cfg, tiny_params):
    mesh = make_mesh({"dp": 4, "tp": 2})
    sharded = shard_params(tiny_params, mesh)
    wqkv = sharded["blocks"]["wqkv"]
    # column-parallel QKV: last axis split over tp
    assert wqkv.sharding.spec == jax.sharding.PartitionSpec(None, None, "tp")
    # row-parallel out_proj: middle (input) axis split
    assert sharded["blocks"]["wo"].sharding.spec == jax.sharding.PartitionSpec(
        None, "tp", None
    )
    # replicated embeddings
    assert sharded["pos_embed"].sharding.is_fully_replicated


def test_tp_shard_is_whole_heads(tiny_cfg, tiny_params):
    # The loader's (head, {q,k,v}, head_dim) column order means a contiguous
    # tp shard owns whole heads: shard boundary must fall on a 3*head_dim
    # multiple.
    tp = 2
    per_shard = 3 * tiny_cfg.embed_dim // tp
    assert per_shard % (3 * tiny_cfg.head_dim) == 0


def test_sharded_train_step_runs_and_learns(tiny_cfg):
    mesh = make_mesh({"dp": 4, "tp": 2})
    optimizer = optax.adamw(1e-3)
    params, opt_state = trainer.init_train_state(
        jax.random.key(0), tiny_cfg, optimizer
    )
    params = shard_params(params, mesh)
    opt_state = jax.device_put(
        opt_state,
        trainer._opt_state_shardings(
            opt_state, params, param_shardings(mesh, params), mesh
        ),
    )
    step = trainer.jit_train_step_for_mesh(tiny_cfg, optimizer, mesh, params, opt_state)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(rng.normal(size=(8, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
                    jnp.float32),
        batch_sharding(mesh, 4),
    )
    labels = jax.device_put(
        jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 8), jnp.int32),
        batch_sharding(mesh, 1),
    )
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, images, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # memorizing one batch must reduce loss


def test_sharded_train_step_matches_unsharded(tiny_cfg):
    # One step on the mesh == one step on a single device (same math,
    # collectives inserted by XLA must not change results beyond fp noise).
    optimizer = optax.sgd(0.1)
    params0, opt0 = trainer.init_train_state(jax.random.key(1), tiny_cfg, optimizer)
    step_fn = trainer.make_train_step(tiny_cfg, optimizer, remat=False)

    rng = np.random.default_rng(1)
    images = jnp.asarray(
        rng.normal(size=(8, 3, tiny_cfg.image_size, tiny_cfg.image_size)), jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 8), jnp.int32)

    p1, _, loss1 = jax.jit(step_fn)(params0, opt0, images, labels)

    mesh = make_mesh({"dp": 4, "tp": 2})
    params_s = shard_params(params0, mesh)
    opt_s = jax.device_put(
        opt0,
        trainer._opt_state_shardings(
            opt0, params_s, param_shardings(mesh, params_s), mesh
        ),
    )
    step_s = trainer.jit_train_step_for_mesh(
        tiny_cfg, optimizer, mesh, params_s, opt_s, remat=False
    )
    p2, _, loss2 = step_s(
        params_s,
        opt_s,
        jax.device_put(images, batch_sharding(mesh, 4)),
        jax.device_put(labels, batch_sharding(mesh, 1)),
    )
    assert abs(float(loss1) - float(loss2)) < 1e-5
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
        p1, jax.device_get(p2),
    )
    assert max(jax.tree.leaves(d)) < 1e-4


def test_mesh_shape_for():
    assert mesh_shape_for(8, tp=2) == {"dp": 4, "tp": 2}
    assert mesh_shape_for(8) == {"dp": 8, "tp": 1}
    with pytest.raises(ValueError):
        mesh_shape_for(8, tp=3)
    # tp > device count must error loudly, not build an empty {'dp': 0}
    # mesh that fails much later with an inscrutable sharding error
    with pytest.raises(ValueError, match="dp=0"):
        mesh_shape_for(0, tp=16)


def test_fused_dp_shard_map_matches_single_device(tiny_cfg, tiny_params, tiny_images):
    # Pallas kernels can't be GSPMD-sharded; the engine runs them per-shard
    # via shard_map over a dp-only mesh. Results must match single-device.
    mesh = make_mesh({"dp": 4}, jax.devices()[:4])
    single = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops="fused",
                             batch_pad=4)
    sharded = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops="fused",
                              mesh=mesh, batch_pad=4)
    a = np.asarray(single.logits(tiny_images))
    b = np.asarray(sharded.logits(tiny_images))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("tp", [2, 4])
def test_fused_tp_matches_single_device(tiny_cfg, tiny_params, tiny_images, tp):
    # Tensor-parallel megakernels: heads split over 'tp' (column-parallel
    # packed QKV), psum epilogues complete out_proj and the MLP
    # (parallel/tp_forward.py; the reference's seam is the per-head loop
    # ViT_opencl.c:546).  Must match the single-device fused path.
    mesh = make_mesh({"dp": 8 // tp, "tp": tp})
    single = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops="fused",
                             batch_pad=4)
    sharded = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops="fused",
                              mesh=mesh, batch_pad=4)
    a = np.asarray(single.logits(tiny_images))
    b = np.asarray(sharded.logits(tiny_images))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("tp", [2, 4])
def test_quant_tp_matches_single_device(tiny_cfg, tiny_params, tiny_images, tp):
    # W8A8 under tp: int8 column shards are exact per-column; the dynamic
    # mid-activation scale uses a cross-shard pmax and the FC2 accumulator
    # psums in int32, so the quantization grouping matches the single-device
    # kernel bit-for-bit (tp_forward._mlp_q8_tp).
    mesh = make_mesh({"dp": 8 // tp, "tp": tp})
    single = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops="quant",
                             batch_pad=4)
    sharded = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops="quant",
                              mesh=mesh, batch_pad=4)
    a = np.asarray(single.logits(tiny_images))
    b = np.asarray(sharded.logits(tiny_images))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_quant_tp_bf16_matches_single_device(tiny_cfg, tiny_params,
                                             tiny_images):
    """bf16 quant under tp: the TP MLP must use the SAME erf form as the
    unsharded q8 kernel (tanh-form in bf16) — a different erf right before
    the int8 round() would drift codes by an LSB between tp=1 and tp>1."""
    mesh = make_mesh({"dp": 4, "tp": 2})
    single = InferenceEngine(tiny_cfg, tiny_params, dtype="bfloat16",
                             ops="quant", batch_pad=4)
    sharded = InferenceEngine(tiny_cfg, tiny_params, dtype="bfloat16",
                              ops="quant", mesh=mesh, batch_pad=4)
    a = np.asarray(single.logits(tiny_images))
    b = np.asarray(sharded.logits(tiny_images))
    np.testing.assert_allclose(a, b, atol=5e-2)  # bf16 reduction-order noise


def test_fused_tp_features_and_bf16(tiny_cfg, tiny_params, tiny_images):
    mesh = make_mesh({"dp": 4, "tp": 2})
    single = InferenceEngine(tiny_cfg, tiny_params, dtype="bfloat16", ops="fused",
                             batch_pad=4)
    sharded = InferenceEngine(tiny_cfg, tiny_params, dtype="bfloat16", ops="fused",
                              mesh=mesh, batch_pad=4)
    a = np.asarray(single.logits(tiny_images))
    b = np.asarray(sharded.logits(tiny_images))
    np.testing.assert_allclose(a, b, atol=5e-2)  # bf16 reduction-order noise
    fa = np.asarray(single.features(tiny_images))
    fb = np.asarray(sharded.features(tiny_images))
    assert fa.shape == fb.shape == (4, tiny_cfg.embed_dim)
    np.testing.assert_allclose(fa, fb, atol=5e-2)


@pytest.mark.parametrize("mesh_shape", [{"dp": 1, "tp": 2}, {"dp": 2, "tp": 2}])
def test_kernel_tp_train_step_matches_fused_train(tiny_cfg, mesh_shape):
    # Tensor-parallel TRAINING through the fused kernels (custom-VJP
    # pallas calls under shard_map) must match the single-device
    # fused_train step.
    from vit_tpu.ops.dispatch import get_ops

    n = mesh_shape["dp"] * mesh_shape["tp"]
    optimizer = optax.sgd(0.05)
    params, opt0 = trainer.init_train_state(jax.random.key(7), tiny_cfg, optimizer)
    rng = np.random.default_rng(7)
    images = jnp.asarray(
        rng.normal(size=(8, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 8), jnp.int32)

    step_ref = jax.jit(
        trainer.make_train_step(tiny_cfg, optimizer, get_ops("fused_train"),
                                remat=False)
    )
    p_ref, _, l_ref = step_ref(params, opt0, images, labels)

    mesh = make_mesh(mesh_shape, jax.devices()[:n])
    p_s = shard_params(jax.device_get(params), mesh)
    o_s = jax.device_put(
        jax.device_get(opt0),
        trainer._opt_state_shardings(opt0, p_s, param_shardings(mesh, p_s), mesh),
    )
    step_tp = trainer.jit_train_step_kernel_tp(tiny_cfg, optimizer, mesh, p_s, o_s)
    p_tp, _, l_tp = step_tp(
        p_s, o_s,
        jax.device_put(images, batch_sharding(mesh, 4)),
        jax.device_put(labels, batch_sharding(mesh, 1)),
    )
    assert abs(float(l_ref) - float(l_tp)) < 1e-6
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(jax.device_get(p_tp))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("ops", ["fused", "quant"])
def test_tp_long_seq_routes_through_flash(tiny_cfg, tiny_params, tiny_images,
                                          ops, monkeypatch):
    """Past VMEM_ATTENTION_MAX_T the TP block must switch to the local-head
    flash-attention composition (tp_forward._ctx_long_seq_tp) instead of
    compiling a (T,T)-in-VMEM tile per head — same dispatch the
    single-device fused path has (fused_block._long_seq_block)."""
    from vit_tpu.ops.pallas import fused_block as FB

    monkeypatch.setattr(FB, "VMEM_ATTENTION_MAX_T", 4)  # T=5 > 4
    mesh = make_mesh({"dp": 4, "tp": 2})
    single = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops=ops,
                             batch_pad=4)
    sharded = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops=ops,
                              mesh=mesh, batch_pad=4)
    a = np.asarray(single.logits(tiny_images))
    b = np.asarray(sharded.logits(tiny_images))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_kernel_tp_train_long_seq_matches_fused_train(tiny_cfg, monkeypatch):
    """TP *training* past VMEM_ATTENTION_MAX_T: the flash-attention VJP must
    transpose correctly under shard_map (local heads) and match the
    single-device long-sequence fused_train step."""
    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.ops.pallas import fused_block as FB

    monkeypatch.setattr(FB, "VMEM_ATTENTION_MAX_T", 4)  # T=5 > 4
    optimizer = optax.sgd(0.05)
    params, opt0 = trainer.init_train_state(jax.random.key(9), tiny_cfg, optimizer)
    rng = np.random.default_rng(9)
    images = jnp.asarray(
        rng.normal(size=(8, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 8), jnp.int32)

    step_ref = jax.jit(
        trainer.make_train_step(tiny_cfg, optimizer, get_ops("fused_train"),
                                remat=False)
    )
    p_ref, _, l_ref = step_ref(params, opt0, images, labels)

    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    p_s = shard_params(jax.device_get(params), mesh)
    o_s = jax.device_put(
        jax.device_get(opt0),
        trainer._opt_state_shardings(opt0, p_s, param_shardings(mesh, p_s), mesh),
    )
    step_tp = trainer.jit_train_step_kernel_tp(tiny_cfg, optimizer, mesh, p_s, o_s)
    p_tp, _, l_tp = step_tp(
        p_s, o_s,
        jax.device_put(images, batch_sharding(mesh, 4)),
        jax.device_put(labels, batch_sharding(mesh, 1)),
    )
    assert abs(float(l_ref) - float(l_tp)) < 1e-6
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(jax.device_get(p_tp))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_unfused_kernel_paths_reject_tp_mesh(tiny_cfg, tiny_params):
    # Per-op pallas and the custom-VJP trainable path still shard dp-only.
    mesh = make_mesh({"dp": 4, "tp": 2})
    with pytest.raises(ValueError, match="data-parallel only"):
        InferenceEngine(tiny_cfg, tiny_params, ops="pallas", mesh=mesh)


def test_tp_must_divide_heads(tiny_cfg, tiny_params):
    import dataclasses as dc

    cfg3 = dc.replace(tiny_cfg, num_heads=3, name="vit_tiny_3h")
    mesh = make_mesh({"dp": 4, "tp": 2})
    with pytest.raises(ValueError, match="must divide"):
        InferenceEngine(cfg3, tiny_params, ops="fused", mesh=mesh)


def test_distributed_initialize_rejects_late_explicit_args():
    """After an arg-less initialize degraded to single-process, a LATER
    call with explicit cluster args must raise — silently ignoring it
    would leave this host solo while pod peers block in
    jax.distributed.initialize forever."""
    from vit_tpu.runtime import distributed

    distributed.initialize()  # single process: degrades to no-op, latches
    with pytest.raises(RuntimeError, match="too late"):
        distributed.initialize(
            coordinator_address="host:1234", num_processes=8, process_id=0
        )


def test_mesh_train_step_mixed_precision(tiny_cfg):
    # compute_dtype must be honored on the sharded path: fp32 master
    # weights, loss computed in bf16.
    mesh = make_mesh({"dp": 4, "tp": 2})
    optimizer = optax.sgd(0.05)
    params, opt_state = trainer.init_train_state(jax.random.key(2), tiny_cfg, optimizer)
    params = shard_params(params, mesh)
    opt_state = jax.device_put(
        opt_state,
        trainer._opt_state_shardings(
            opt_state, params, param_shardings(mesh, params), mesh
        ),
    )
    step = trainer.jit_train_step_for_mesh(
        tiny_cfg, optimizer, mesh, params, opt_state,
        remat=False, compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(2)
    images = jax.device_put(
        jnp.asarray(rng.normal(size=(8, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
                    jnp.float32),
        batch_sharding(mesh, 4),
    )
    labels = jax.device_put(
        jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 8), jnp.int32),
        batch_sharding(mesh, 1),
    )
    params, opt_state, loss = step(params, opt_state, images, labels)
    assert np.isfinite(float(loss))
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))


def test_mlp_q8_tp_kernels_match_jnp_oracle():
    """The TP W8A8 MLP now runs THROUGH the real q8 Pallas kernels
    (quant_kernels.ln_fc1_gelu_q8 + fc2_q8_partial around the pmax/psum);
    it must match the jnp oracle formulation.  The int8 GEMMs and int32
    psum are integer-exact; the fp32 LN/absmax reductions can differ by an
    ulp between the kernel and jnp lowerings, so the gate is a tight
    tolerance rather than bitwise."""
    from jax.sharding import PartitionSpec as P

    from vit_tpu.parallel.tp_forward import _mlp_q8_tp, _mlp_q8_tp_ref

    d, f, rows = 64, 256, 40
    rng = np.random.default_rng(3)
    x2d = jnp.asarray(rng.normal(size=(rows, d)), jnp.float32)
    blk = {
        "ln2_scale": jnp.asarray(1 + 0.1 * rng.normal(size=(1, d)), jnp.float32),
        "ln2_bias": jnp.asarray(0.1 * rng.normal(size=(1, d)), jnp.float32),
        "w1": jnp.asarray(rng.integers(-127, 128, (d, f)), jnp.int8),
        "w1_scale": jnp.asarray(rng.uniform(0.005, 0.02, (f,)), jnp.float32),
        "b1": jnp.asarray(0.1 * rng.normal(size=(f,)), jnp.float32),
        "w2": jnp.asarray(rng.integers(-127, 128, (f, d)), jnp.int8),
        "w2_scale": jnp.asarray(rng.uniform(0.005, 0.02, (d,)), jnp.float32),
        "b2": jnp.asarray(0.1 * rng.normal(size=(d,)), jnp.float32),
    }
    mesh = make_mesh({"tp": 2}, jax.devices()[:2])
    specs = {
        "ln2_scale": P(), "ln2_bias": P(),
        "w1": P(None, "tp"), "w1_scale": P("tp"), "b1": P("tp"),
        "w2": P("tp", None), "w2_scale": P(), "b2": P(),
    }

    def run(fn, *extra):
        return jax.shard_map(
            lambda x, b: fn(x, b, 1e-6, "exact", "tp", *extra),
            mesh=mesh, in_specs=(P(), specs), out_specs=P(),
            check_vma=False,
        )(x2d, blk)

    got = np.asarray(run(_mlp_q8_tp, True))  # interpret=True (CPU)
    want = np.asarray(run(_mlp_q8_tp_ref))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_swap_params_on_meshed_quant_tp_engine(tiny_cfg, tiny_params, tiny_images):
    """Hot-swap on a dp x tp quant engine: the new checkpoint goes through
    the same quantize+placement path the constructor used (the TP forward's
    in_specs cover the int8 weight + scale leaves, so a raw fp pytree
    slipping through would structure-error)."""
    from vit_tpu.io import weights as wio

    mesh = make_mesh({"dp": 4, "tp": 2})
    new_params = wio.params_from_tensors(
        wio.synth_reference_tensors(tiny_cfg, seed=9), tiny_cfg
    )
    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops="quant",
                             mesh=mesh, batch_pad=4)
    fresh = InferenceEngine(tiny_cfg, new_params, dtype="float32", ops="quant",
                            mesh=mesh, batch_pad=4)
    engine.swap_params(new_params)
    np.testing.assert_array_equal(
        np.asarray(engine.logits(tiny_images)),
        np.asarray(fresh.logits(tiny_images)),
    )


def test_distributed_initialize_explicit_is_idempotent(monkeypatch):
    """A REPEATED explicit single-process initialize is fine — the
    'too late' guard exists for the arg-less-degraded case only (the
    docstring promises idempotence)."""
    from vit_tpu.runtime import distributed

    monkeypatch.setattr(distributed, "_initialized", False)
    monkeypatch.setattr(distributed, "_initialized_explicit", False)
    calls = []
    monkeypatch.setattr(
        distributed.jax.distributed, "initialize",
        lambda **kw: calls.append(kw),
    )
    args = dict(coordinator_address="host:1234", num_processes=1, process_id=0)
    distributed.initialize(**args)
    distributed.initialize(**args)  # must not raise
    assert len(calls) == 1  # latched after the first real init


# ---------------------------------------------------------------------------
# ZeRO-1 optimizer-state sharding (parallel/sharding.zero1_pspec +
# trainer._opt_state_shardings(zero1=True)): adam mu/nu shard over dp while
# params stay replicated; one mesh step must still match the unsharded step.
# ---------------------------------------------------------------------------


def test_zero1_pspec_rules():
    from jax.sharding import PartitionSpec as P

    from vit_tpu.parallel.sharding import zero1_pspec

    names = ("dp", "tp")
    # replicated 3D leaf: dp lands on the largest dp-divisible axis
    assert zero1_pspec(P(), (2, 64, 192), names, 4) == P(None, None, "dp")
    # tp-taken output axis: dp falls back to the next-largest free axis
    assert zero1_pspec(P(None, None, "tp"), (2, 64, 192), names, 4) == P(
        None, "dp", "tp"
    )
    # nothing divisible / scalar / dp absent or trivial: unchanged
    assert zero1_pspec(P(), (3, 5), names, 4) == P()
    assert zero1_pspec(P(), (), names, 4) == P()
    assert zero1_pspec(P(), (64,), ("tp",), 4) == P()
    assert zero1_pspec(P(), (64,), names, 1) == P()


def test_zero1_opt_state_is_dp_sharded(tiny_cfg):
    optimizer = optax.adamw(1e-3)
    params, opt_state = trainer.init_train_state(
        jax.random.key(3), tiny_cfg, optimizer
    )
    mesh = make_mesh({"dp": 4, "tp": 2})
    p_sh = param_shardings(mesh, params)
    o_sh = trainer._opt_state_shardings(opt_state, params, p_sh, mesh, zero1=True)
    # every moment leaf with a free (not-tp-taken), dp-divisible axis must
    # carry 'dp'; leaves with no such axis stay as the param rule says.
    leaves, shs = jax.tree.leaves(opt_state), jax.tree.leaves(o_sh)
    n_dp = 0
    for leaf, sh in zip(leaves, shs):
        spec = tuple(sh.spec) + (None,) * (
            getattr(leaf, "ndim", 0) - len(tuple(sh.spec))
        )
        free_divisible = any(
            s is None and d % 4 == 0 and d > 1
            for s, d in zip(spec, getattr(leaf, "shape", ()))
        )
        if free_divisible or "dp" in spec:
            assert "dp" in spec, (leaf.shape, sh.spec)
            n_dp += 1
    assert n_dp > 0


def test_zero1_train_step_matches_unsharded(tiny_cfg):
    # ZeRO-1 must be a pure placement change: same params after one step as
    # the single-device step.  SGD+momentum keeps the check linear in the
    # grads (adamw's first step is ~sign(g)*lr, which amplifies fp noise
    # where |g|~0) while still carrying param-shaped state to shard.
    optimizer = optax.sgd(1e-2, momentum=0.9)
    params0, opt0 = trainer.init_train_state(jax.random.key(4), tiny_cfg, optimizer)
    rng = np.random.default_rng(4)
    images = jnp.asarray(
        rng.normal(size=(8, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 8), jnp.int32)
    p1, _, loss1 = jax.jit(
        trainer.make_train_step(tiny_cfg, optimizer, remat=False)
    )(params0, opt0, images, labels)

    mesh = make_mesh({"dp": 4, "tp": 2})
    p_s = shard_params(jax.device_get(params0), mesh)
    o_sh = trainer._opt_state_shardings(
        opt0, p_s, param_shardings(mesh, p_s), mesh, zero1=True
    )
    o_s = jax.device_put(jax.device_get(opt0), o_sh)
    step = trainer.jit_train_step_for_mesh(
        tiny_cfg, optimizer, mesh, p_s, o_s, remat=False, zero1=True
    )
    p2, o2, loss2 = step(
        p_s, o_s,
        jax.device_put(images, batch_sharding(mesh, 4)),
        jax.device_put(labels, batch_sharding(mesh, 1)),
    )
    assert abs(float(loss1) - float(loss2)) < 1e-5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(jax.device_get(p2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # the updated state keeps the dp-sharded placement
    dp_specs = [
        s.sharding.spec for s in jax.tree.leaves(o2)
        if hasattr(s, "sharding") and "dp" in tuple(s.sharding.spec)
    ]
    assert dp_specs


def test_zero1_fused_train_dp_matches_plain(tiny_cfg):
    # The fused_train (shard_map dp) path with zero1_like: optimizer state
    # dp-sharded outside the shard_map, same numerics as the replicated jit.
    from vit_tpu.ops.dispatch import get_ops

    optimizer = optax.sgd(1e-2, momentum=0.9)
    params0, opt0 = trainer.init_train_state(jax.random.key(5), tiny_cfg, optimizer)
    rng = np.random.default_rng(5)
    images = jnp.asarray(
        rng.normal(size=(8, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 8), jnp.int32)
    ops = get_ops("fused_train")
    p1, _, l1 = jax.jit(
        trainer.make_train_step(tiny_cfg, optimizer, ops, remat=False)
    )(params0, opt0, images, labels)

    mesh = make_mesh({"dp": 4}, jax.devices()[:4])
    from vit_tpu.parallel import replicate

    p_s = jax.device_put(jax.device_get(params0), replicate(mesh))
    rep_tree = jax.tree.map(lambda _: replicate(mesh), params0)
    o_sh = trainer._opt_state_shardings(opt0, params0, rep_tree, mesh, zero1=True)
    o_s = jax.device_put(jax.device_get(opt0), o_sh)
    step = trainer.jit_train_step_dp_shard_map(
        tiny_cfg, optimizer, mesh, ops, remat=False,
        zero1_like=(params0, opt0),
    )
    p2, o2, l2 = step(
        p_s, o_s,
        jax.device_put(images, batch_sharding(mesh, 4)),
        jax.device_put(labels, batch_sharding(mesh, 1)),
    )
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(jax.device_get(p2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fsdp_param_shardings_cover_params(tiny_cfg):
    # FSDP (ZeRO-3): every param leaf with a free dp-divisible axis carries
    # 'dp' on top of its TP rule; TP axes are preserved.
    from vit_tpu.parallel.sharding import fsdp_param_shardings

    params = vit.init_params(jax.random.key(0), tiny_cfg)
    mesh = make_mesh({"dp": 4, "tp": 2})
    shs = fsdp_param_shardings(mesh, params)
    # wqkv keeps tp on the packed output axis AND gains dp
    sp = tuple(shs["blocks"]["wqkv"].spec)
    assert "tp" in sp and "dp" in sp
    n_dp = sum(
        "dp" in tuple(s.spec) for s in jax.tree.leaves(shs)
    )
    # the big leaves all shard; tiny odd ones may stay replicated
    assert n_dp >= 10


def test_fsdp_train_step_matches_unsharded(tiny_cfg):
    # FSDP must be placement-only: XLA all-gathers weights just-in-time,
    # reduce-scatters grads — same params after one step as single-device.
    optimizer = optax.sgd(1e-2, momentum=0.9)
    params0, opt0 = trainer.init_train_state(jax.random.key(6), tiny_cfg, optimizer)
    rng = np.random.default_rng(6)
    images = jnp.asarray(
        rng.normal(size=(8, 3, tiny_cfg.image_size, tiny_cfg.image_size)),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(0, tiny_cfg.num_classes, 8), jnp.int32)
    p1, _, loss1 = jax.jit(
        trainer.make_train_step(tiny_cfg, optimizer, remat=False)
    )(params0, opt0, images, labels)

    from vit_tpu.parallel.sharding import fsdp_param_shardings

    mesh = make_mesh({"dp": 4, "tp": 2})
    p_sh = fsdp_param_shardings(mesh, params0)
    p_s = jax.device_put(jax.device_get(params0), p_sh)
    o_s = jax.device_put(
        jax.device_get(opt0),
        trainer._opt_state_shardings(opt0, p_s, p_sh, mesh),
    )
    step = trainer.jit_train_step_for_mesh(
        tiny_cfg, optimizer, mesh, p_s, o_s, remat=False, fsdp=True
    )
    p2, o2, loss2 = step(
        p_s, o_s,
        jax.device_put(images, batch_sharding(mesh, 4)),
        jax.device_put(labels, batch_sharding(mesh, 1)),
    )
    assert abs(float(loss1) - float(loss2)) < 1e-5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(jax.device_get(p2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # updated params keep the dp-sharded placement (ZeRO-3, not a gather)
    assert any(
        "dp" in tuple(x.sharding.spec)
        for x in jax.tree.leaves(p2) if hasattr(x, "sharding")
    )
