"""Batch-queue inference serving.

The reference's driver is a one-shot loop: load a fixed batch, run, write a
file (Main.c:45-72).  This generalizes it into a production shape: a
daemon that accepts concurrent variable-size requests, coalesces them into
padded device batches (dynamic batching), and keeps the chip busy with a
two-stage dispatch/readback pipeline — JAX's async dispatch plays the role
the reference's cl_event chains played, but across *requests*.

Throughput design:
  - requests coalesce up to ``max_batch`` images or ``max_delay_ms``,
    whichever comes first (latency/throughput knob);
  - batches pad to the engine's padding grain, so the jit cache stays at
    one or two programs (no per-size recompiles);
  - the dispatcher thread stages + dispatches batch i+1 while the completer
    thread blocks on batch i's host readback (``pipeline_depth`` in-flight
    batches), the same overlap runtime/prefetch.py gives input streams.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class ServerStats:
    requests: int = 0
    images: int = 0
    batches: int = 0

    @property
    def images_per_batch(self) -> float:
        return self.images / max(self.batches, 1)


class _Request:
    __slots__ = ("images", "future")

    def __init__(self, images: np.ndarray):
        self.images = images
        self.future: Future = Future()


_STOP = object()


class InferenceServer:
    """Dynamic-batching server around an InferenceEngine.

    ``submit(images) -> Future[(labels, top_probs, probs)]`` is thread-safe;
    ``classify`` is the blocking convenience wrapper.
    """

    def __init__(
        self,
        engine,
        max_batch: int = 64,
        max_delay_ms: float = 5.0,
        pipeline_depth: int = 2,
    ):
        if max_batch < 1 or pipeline_depth < 1:
            raise ValueError("max_batch and pipeline_depth must be >= 1")
        self.engine = engine
        self.max_batch = max_batch
        self.max_delay = max_delay_ms / 1e3
        self.stats = ServerStats()
        self._q: "queue.Queue" = queue.Queue()
        self._inflight: "queue.Queue" = queue.Queue(maxsize=pipeline_depth)
        self._dispatcher: Optional[threading.Thread] = None
        self._completer: Optional[threading.Thread] = None
        self._running = False

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> "InferenceServer":
        if self._running:
            return self
        self._running = True
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._completer = threading.Thread(target=self._complete_loop, daemon=True)
        self._dispatcher.start()
        self._completer.start()
        return self

    def stop(self) -> None:
        if not self._running:
            return
        self._running = False
        self._q.put(_STOP)
        self._dispatcher.join()
        self._completer.join()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- request API --------------------------------------------------------

    def submit(self, images) -> Future:
        """Enqueue a (n, C, H, W) request; resolves to (labels, top_probs,
        probs) for those n images."""
        images = np.asarray(images)
        if images.ndim != 4:
            raise ValueError(f"expected (n, C, H, W), got {images.shape}")
        if not self._running:
            raise RuntimeError("server not started")
        req = _Request(images)
        self._q.put(req)
        return req.future

    def classify(self, images, timeout: Optional[float] = None):
        return self.submit(images).result(timeout)

    # -- internals ----------------------------------------------------------

    def _gather(self) -> Optional[List[_Request]]:
        """Collect requests up to max_batch images or max_delay."""
        import time

        first = self._q.get()
        if first is _STOP:
            return None
        reqs = [first]
        total = len(first.images)
        deadline = time.perf_counter() + self.max_delay
        while total < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is _STOP:
                self._q.put(_STOP)  # re-signal for the outer loop
                break
            reqs.append(nxt)
            total += len(nxt.images)
        return reqs

    def _dispatch_loop(self) -> None:
        from vit_tpu.ops import reference

        engine = self.engine
        while True:
            reqs = self._gather()
            if reqs is None:
                break
            try:
                batch = (
                    reqs[0].images
                    if len(reqs) == 1
                    else np.concatenate([r.images for r in reqs], axis=0)
                )
                x, n = engine._stage(batch)
                logits = engine._forward(engine.params, x)[:n]
                probs = reference.softmax(logits)  # async on device
                self._inflight.put((probs, reqs))  # backpressure
            except Exception as e:  # config errors etc. -> fail the batch
                for r in reqs:
                    r.future.set_exception(e)
        self._inflight.put(_STOP)

    def _complete_loop(self) -> None:
        while True:
            item = self._inflight.get()
            if item is _STOP:
                break
            probs_dev, reqs = item
            try:
                probs = np.asarray(probs_dev)  # host sync for this batch
            except Exception as e:
                for r in reqs:
                    r.future.set_exception(e)
                continue
            self.stats.batches += 1
            off = 0
            for r in reqs:
                n = len(r.images)
                p = probs[off : off + n]
                off += n
                labels = p.argmax(-1)
                r.future.set_result(
                    (labels, p[np.arange(n), labels], p)
                )
                self.stats.requests += 1
                self.stats.images += n


def measure_throughput(
    server: InferenceServer,
    request_sizes: List[int],
    cfg,
    seed: int = 0,
) -> Tuple[float, int]:
    """Drive the server with a pre-generated stream of variable-size synth
    requests; returns (images/sec, total_images).  Used by the serve CLI's
    --selftest to compare against bench.py's static-batch number."""
    import time

    from vit_tpu.io import images as iio

    pool = iio.synth_images(max(request_sizes), cfg, seed=seed)
    requests = [np.asarray(pool[:n]) for n in request_sizes]
    # warm up (compiles the padded-size programs)
    server.classify(requests[0])
    t0 = time.perf_counter()
    futures = [server.submit(r) for r in requests]
    for f in futures:
        f.result()
    dt = time.perf_counter() - t0
    total = sum(request_sizes)
    return total / dt, total
