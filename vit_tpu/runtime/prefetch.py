"""Async host->HBM input prefetch.

The reference stages every tensor synchronously through
``CL_MEM_COPY_HOST_PTR`` / blocking reads around each op
(ViT_opencl.c:133-141,173).  The TPU-native replacement: a small
double-buffered pipeline that overlaps the host->device transfer of batch
i+1 with the device compute of batch i (``jax.device_put`` is async; a
background thread keeps the queue full).

Usage::

    for batch in prefetch_to_device(batch_iter, size=2, sharding=dp_shard):
        out = step(params, batch)
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional

import jax


def prefetch_to_device(
    iterator: Iterable[Any],
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
    place=None,
) -> Iterator[Any]:
    """Yield device-resident batches, staying ``size`` transfers ahead.

    Each item may be an array or a pytree of arrays; items are placed with
    ``jax.device_put`` (async on TPU) from a producer thread so host I/O,
    PCIe transfer, and device compute overlap.  ``place`` overrides the
    placement callable — e.g. ``jax.make_array_from_process_local_data``
    wrappers for multi-host global batches.
    """
    if size < 1:
        raise ValueError("prefetch size must be >= 1")
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _SENTINEL = object()
    err: list = []
    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that aborts when the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterator:
                if place is not None:
                    placed = place(item)
                elif sharding is not None:
                    placed = jax.device_put(item, sharding)
                else:
                    placed = jax.device_put(item)
                if not _put(placed):
                    return  # consumer abandoned the generator
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            _put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # Early exit (break / GeneratorExit): unblock and stop the producer,
        # then drop any staged device batches so HBM is released.
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        # Join so an in-flight device_put completes before interpreter
        # teardown — a daemon thread dying inside the device runtime
        # aborts the process (std::terminate) on some backends.
        t.join(timeout=60.0)
        if t.is_alive():
            import sys

            print(
                "warning: prefetch producer still blocked in the device "
                "runtime after 60s (wedged transfer?) — interpreter "
                "teardown may abort the process",
                file=sys.stderr,
            )


def batched(array_like, batch_size: int, drop_remainder: bool = False):
    """Slice a large array (e.g. the full input-100.bin batch) into
    fixed-size minibatches for the prefetcher."""
    n = len(array_like)
    end = n - (n % batch_size) if drop_remainder else n
    for i in range(0, end, batch_size):
        yield array_like[i : i + batch_size]
