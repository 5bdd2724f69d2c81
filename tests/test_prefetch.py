"""Async prefetch pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.runtime.prefetch import batched, prefetch_to_device


def test_prefetch_yields_all_batches_in_order():
    data = [np.full((4, 8), i, np.float32) for i in range(7)]
    out = list(prefetch_to_device(iter(data), size=2))
    assert len(out) == 7
    for i, x in enumerate(out):
        assert isinstance(x, jax.Array)
        np.testing.assert_array_equal(np.asarray(x), data[i])


def test_prefetch_with_sharding():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from vit_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh({"dp": 8})
    data = [np.ones((16, 4), np.float32) * i for i in range(3)]
    out = list(
        prefetch_to_device(iter(data), size=2, sharding=batch_sharding(mesh, 2))
    )
    assert len(out) == 3
    assert not out[0].sharding.is_fully_replicated


def test_prefetch_propagates_errors():
    def gen():
        yield np.zeros((2, 2), np.float32)
        raise RuntimeError("boom")

    it = prefetch_to_device(gen(), size=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_batched_slicing():
    data = np.arange(10)
    batches = list(batched(data, 4))
    assert [len(b) for b in batches] == [4, 4, 2]
    batches = list(batched(data, 4, drop_remainder=True))
    assert [len(b) for b in batches] == [4, 4]


def test_prefetch_overlaps_compute():
    # Functional check that it composes with a jitted consumer.
    @jax.jit
    def f(x):
        return jnp.sum(x)

    data = (np.full((8, 8), i, np.float32) for i in range(5))
    total = sum(float(f(x)) for x in prefetch_to_device(data, size=3))
    assert total == sum(i * 64 for i in range(5))


def test_prefetch_early_exit_releases_producer():
    import threading
    import time as _time

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield np.full((2, 2), i, np.float32)

    before = threading.active_count()
    it = prefetch_to_device(gen(), size=2)
    next(it)
    it.close()  # consumer abandons the generator
    deadline = _time.time() + 5
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before  # producer thread exited
    assert len(produced) < 100  # and it did not drain the whole iterator
