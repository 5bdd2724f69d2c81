"""Lockstep (multi-host) serving tests (runtime/multihost_serving.py).

Single process here, so process_count == 1: the lockstep server degenerates
to blocking local batching, but the whole mesh flow — global batch assembly
via make_array_from_process_local_data, dp-sharded outputs, local-shard
readback — runs for real on the virtual 8-device mesh.
"""

import jax
import numpy as np
import pytest

from vit_tpu.io import images as iio
from vit_tpu.parallel import make_mesh
from vit_tpu.runtime import InferenceEngine
from vit_tpu.runtime.multihost_serving import LockstepServer

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs 4 (virtual) devices"
)


@pytest.fixture(scope="module")
def mesh_engine(tiny_cfg, tiny_params):
    mesh = make_mesh({"dp": 4}, jax.devices()[:4])
    return InferenceEngine(
        tiny_cfg, tiny_params, dtype="float32", batch_pad=8, mesh=mesh
    )


@pytest.fixture(scope="module")
def plain_engine(tiny_cfg, tiny_params):
    return InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=8)


def test_lockstep_matches_direct_engine(mesh_engine, plain_engine, tiny_cfg):
    reqs = [iio.synth_images(n, tiny_cfg, seed=20 + n) for n in (1, 3, 2, 4)]
    with LockstepServer(mesh_engine, local_batch=8) as srv:
        srv.warmup()
        futures = [srv.submit(r, return_probs=(i == 0))
                   for i, r in enumerate(reqs)]
        results = [f.result(timeout=120) for f in futures]
    for i, (r, (labels, top, probs)) in enumerate(zip(reqs, results)):
        want_labels, want_top = plain_engine.classify(r)
        np.testing.assert_array_equal(labels, want_labels)
        np.testing.assert_allclose(top, want_top, atol=1e-5)
        if i == 0:
            assert probs.shape == (len(r), tiny_cfg.num_classes)
        else:
            assert probs is None


def test_lockstep_fixed_tick_batches(mesh_engine, tiny_cfg):
    # requests beyond one tick's local_batch carry to the next tick
    reqs = [iio.synth_images(3, tiny_cfg, seed=i) for i in range(4)]  # 12 imgs
    with LockstepServer(mesh_engine, local_batch=8) as srv:
        srv.warmup()
        futures = [srv.submit(r) for r in reqs]
        for f in futures:
            f.result(timeout=120)
    # 12 request images + 1 warmup image (warmup on a running server routes
    # through the tick loop to preserve cross-host program order)
    assert srv.stats.images == 13
    assert srv.stats.batches >= 2  # 12 images can't fit one 8-image tick


def test_lockstep_validates_request_size(mesh_engine, tiny_cfg):
    with LockstepServer(mesh_engine, local_batch=4) as srv:
        with pytest.raises(ValueError, match="exceeds local_batch"):
            srv.submit(iio.synth_images(5, tiny_cfg))


def test_lockstep_requires_dp_mesh(plain_engine):
    with pytest.raises(ValueError, match="'dp' mesh"):
        LockstepServer(plain_engine, local_batch=4)


def test_lockstep_device_staged_payloads(mesh_engine, plain_engine, tiny_cfg):
    """jax.Array payloads take the on-device assembly path (no host
    round-trip) and still produce correct results."""
    import jax.numpy as jnp

    imgs = iio.synth_images(5, tiny_cfg, seed=42)
    staged = jax.device_put(jnp.asarray(imgs, mesh_engine.compute_dtype))
    with LockstepServer(mesh_engine, local_batch=8) as srv:
        srv.warmup()
        labels, top, _ = srv.classify(staged, timeout=120)
    want_labels, want_top = plain_engine.classify(imgs)
    np.testing.assert_array_equal(labels, want_labels)
    np.testing.assert_allclose(top, want_top, atol=1e-5)


def test_lockstep_kernel_path(tiny_cfg, tiny_params):
    """Lockstep serving over the fused Pallas path (dp shard_map)."""
    mesh = make_mesh({"dp": 4}, jax.devices()[:4])
    eng = InferenceEngine(
        tiny_cfg, tiny_params, dtype="float32", batch_pad=8, mesh=mesh,
        ops="fused",
    )
    ref = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=8,
                          ops="fused")
    imgs = iio.synth_images(6, tiny_cfg, seed=33)
    with LockstepServer(eng, local_batch=8) as srv:
        srv.warmup()
        labels, top, _ = srv.classify(imgs, timeout=120)
    want_labels, want_top = ref.classify(imgs)
    np.testing.assert_array_equal(labels, want_labels)
    np.testing.assert_allclose(top, want_top, atol=1e-5)


def test_lockstep_queued_deadline_fails_fast(mesh_engine, tiny_cfg):
    """A queued request whose deadline expired is failed by the tick
    gatherer (DeadlineExceededError), and the server keeps serving."""
    from vit_tpu.runtime.serving import DeadlineExceededError

    imgs = iio.synth_images(2, tiny_cfg, seed=4)
    with LockstepServer(mesh_engine, local_batch=8) as srv:
        srv.classify(imgs)  # warm
        fut = srv.submit(imgs, deadline_ms=0.0)
        with pytest.raises(DeadlineExceededError):
            fut.result(timeout=60)
        labels, _, _ = srv.classify(imgs, timeout=60)
        assert labels.shape == (2,)
    assert srv.stats.deadline_expired == 1
    assert srv.stats.latency.count >= 2  # per-request latency recorded


def test_local_rows_dedups_replicating_axis(tiny_cfg, tiny_params):
    """On a dp x tp mesh a P('dp')-sharded output has tp addressable
    REPLICAS per dp index; _local_rows must keep one shard per distinct
    row range or the completer slices wrong labels for any batch past
    the first dp shard."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    arr = jax.device_put(
        np.arange(8, dtype=np.int32), NamedSharding(mesh, P("dp"))
    )
    assert len(arr.addressable_shards) == 4  # 2 dp x 2 tp replicas
    eng = InferenceEngine(
        tiny_cfg, tiny_params, dtype="float32", batch_pad=8, mesh=mesh,
        ops="fused",
    )
    srv = LockstepServer(eng, local_batch=8)
    np.testing.assert_array_equal(srv._local_rows(arr), np.arange(8))


def test_lockstep_serves_correct_rows_on_dp_tp_mesh(tiny_cfg, tiny_params):
    """End-to-end: two requests spanning past the first dp shard on a
    dp=2/tp=2 engine must classify like the unsharded engine."""
    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    eng = InferenceEngine(
        tiny_cfg, tiny_params, dtype="float32", batch_pad=8, mesh=mesh,
        ops="fused",
    )
    ref = InferenceEngine(tiny_cfg, tiny_params, dtype="float32",
                          batch_pad=8, ops="fused")
    imgs = iio.synth_images(6, tiny_cfg, seed=44)
    with LockstepServer(eng, local_batch=8) as srv:
        f1 = srv.submit(imgs[:3])
        f2 = srv.submit(imgs[3:])
        l1, _, _ = f1.result(timeout=300)
        l2, _, _ = f2.result(timeout=300)
    want, _ = ref.classify(imgs)
    np.testing.assert_array_equal(np.concatenate([l1, l2]), want)
