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

import bisect
import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np

# Prometheus-style latency buckets (seconds): 1ms .. 10s + +Inf
LATENCY_BUCKETS = (
    0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5,
    5.0, 10.0,
)


class LatencyHistogram:
    """Thread-safe fixed-bucket latency histogram (Prometheus exposition
    shape: cumulative ``le`` buckets + sum + count) with quantile
    estimation by linear interpolation inside the containing bucket."""

    def __init__(self, buckets=LATENCY_BUCKETS):
        self.buckets = tuple(buckets)
        self._counts = [0] * (len(self.buckets) + 1)  # last = +Inf
        self.sum = 0.0
        self.count = 0
        self._lock = threading.Lock()

    def record(self, seconds: float) -> None:
        i = bisect.bisect_left(self.buckets, seconds)
        with self._lock:
            self._counts[i] += 1
            self.sum += seconds
            self.count += 1

    def quantile(self, q: float) -> float:
        """Estimated q-quantile in seconds (0 when empty; the last finite
        bucket bound when the quantile falls in the +Inf bucket)."""
        with self._lock:
            total = self.count
            counts = list(self._counts)
        if total == 0:
            return 0.0
        rank = q * total
        cum = 0.0
        lo = 0.0
        for i, ub in enumerate(self.buckets):
            prev = cum
            cum += counts[i]
            if cum >= rank:
                frac = (rank - prev) / max(counts[i], 1)
                return lo + (ub - lo) * frac
            lo = ub
        return self.buckets[-1]

    def snapshot(self):
        """(cumulative_bucket_counts aligned to self.buckets + inf, sum,
        count) — consistent under the lock, for /metrics exposition."""
        with self._lock:
            cum = []
            c = 0
            for v in self._counts:
                c += v
                cum.append(c)
            return cum, self.sum, self.count


@dataclasses.dataclass
class ServerStats:
    requests: int = 0
    images: int = 0
    batches: int = 0
    deadline_expired: int = 0
    latency: LatencyHistogram = dataclasses.field(
        default_factory=LatencyHistogram
    )

    @property
    def images_per_batch(self) -> float:
        return self.images / max(self.batches, 1)


class _Request:
    __slots__ = ("images", "future", "return_probs", "submit_t", "deadline")

    def __init__(self, images, return_probs: bool, deadline: Optional[float] = None):
        self.images = images
        self.return_probs = return_probs
        self.submit_t = time.perf_counter()
        self.deadline = deadline  # absolute perf_counter time, or None
        self.future: Future = Future()


_STOP = object()


class ServerOverloadedError(RuntimeError):
    """Raised by ``submit`` when the pending-image backlog exceeds the
    server's ``max_queue_images`` — load-shedding instead of unbounded
    queue growth under overload (HTTP daemons map this to 503)."""


class DeadlineExceededError(RuntimeError):
    """A request's submit deadline passed while it was still QUEUED (not
    yet dispatched to the chip): the dispatcher fails it instead of
    spending device time on an answer the client stopped waiting for
    (HTTP daemons map this to 504).  In-flight batches are never
    cancelled — the chip has already paid for them."""


def make_serve_fn(engine, out_shardings=None):
    """forward + device-side softmax/argmax/top-prob as ONE jitted program.

    Eager softmax/argmax would be one dispatch RPC each (20-50 ms through
    this environment's tunnel, serializing the dispatcher); one program =
    one dispatch per batch.  ``out_shardings`` (applied to all three
    outputs) lets multi-host servers keep outputs dp-sharded so each host
    reads back only its own rows."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.ops import reference

    def _postprocess(logits):
        probs = reference.softmax(logits)
        labels = jnp.argmax(probs, axis=-1)
        top = jnp.take_along_axis(probs, labels[:, None], axis=-1)[:, 0]
        return labels, top, probs

    kw = {}
    if out_shardings is not None:
        kw["out_shardings"] = (out_shardings,) * 3
    # trace the engine's RAW forward and re-apply its per-compile options
    # (e.g. the ToMe chain's raised scoped-VMEM limit) on THIS top-level
    # jit: JAX rejects compiler_options on a nested jit outright
    opts = getattr(engine, "forward_compiler_options", None)
    if opts:
        kw["compiler_options"] = opts
    inner = getattr(engine, "_forward_fn", engine._forward)
    return jax.jit(
        lambda params, x: _postprocess(inner(params, x)), **kw
    )


def start_async_readback(*arrs) -> None:
    """Begin device->host copies now so the transfer RTT overlaps the next
    batches' compute instead of serializing the completer."""
    for arr in arrs:
        if arr is None:
            continue
        try:
            arr.copy_to_host_async()
        except AttributeError:
            pass


class _ServerBase:
    """Lifecycle + request API + completer shared by the single-host
    dynamic-batching server and the multi-host lockstep server.  Subclasses
    provide ``_dispatch_loop`` (and may override ``_validate``/``_to_host``)."""

    def __init__(self, engine, pipeline_depth: int,
                 max_queue_images: "Optional[int]" = None):
        if pipeline_depth < 1:
            raise ValueError("pipeline_depth must be >= 1")
        self.engine = engine
        self.stats = ServerStats()
        self.max_queue_images = max_queue_images
        self._pending = 0  # images submitted but not yet resolved
        self._pending_lock = threading.Lock()
        self._q: "queue.Queue" = queue.Queue()
        self._inflight: "queue.Queue" = queue.Queue(maxsize=pipeline_depth)
        self._dispatcher: Optional[threading.Thread] = None
        self._completer: Optional[threading.Thread] = None
        self._carry: Optional[_Request] = None  # request that overflowed a batch
        self._running = False

    # -- lifecycle ----------------------------------------------------------

    def start(self):
        if self._running:
            return self
        self._running = True
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._completer = threading.Thread(target=self._complete_loop, daemon=True)
        self._dispatcher.start()
        self._completer.start()
        return self

    def stop(self) -> None:
        # flip + _STOP under the same lock submit() enqueues under: any
        # request that saw _running=True is already in the queue AHEAD of
        # _STOP (FIFO), so nothing can land behind it and hang its caller
        with self._pending_lock:
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

    def submit(self, images, return_probs: bool = False,
               deadline_ms: Optional[float] = None) -> Future:
        """Enqueue a (n, C, H, W) request; resolves to (labels, top_probs,
        probs) for those n images — ``probs`` is None unless
        ``return_probs`` (argmax/top-prob are computed on device so only
        ~8 bytes/image cross the wire, not the 1000-class distribution).
        Device-resident payloads (jax.Array) stay on device end-to-end.

        ``deadline_ms``: fail the request with DeadlineExceededError if it
        is still queued (not yet dispatched) this long after submit."""
        import jax

        if not isinstance(images, jax.Array):
            images = np.asarray(images)
        if images.ndim != 4:
            raise ValueError(f"expected (n, C, H, W), got {images.shape}")
        cfg = self.engine.cfg
        want = (cfg.in_channels, cfg.image_size, cfg.image_size)
        if tuple(images.shape[1:]) != want:
            # reject HERE, per request: a wrong-shape payload coalesced
            # into a batch would otherwise fail np.concatenate in the
            # dispatch loop and 500 every innocent request in that batch
            raise ValueError(
                f"expected images of shape (n, {want[0]}, {want[1]}, "
                f"{want[2]}) for {cfg.name}, got {tuple(images.shape)}"
            )
        self._validate(images)
        n = len(images)
        deadline = (
            time.perf_counter() + deadline_ms / 1e3
            if deadline_ms is not None else None
        )
        req = _Request(images, return_probs, deadline)
        with self._pending_lock:
            # running-check and enqueue are one atomic section vs stop():
            # see stop() — prevents a request landing behind _STOP and
            # never resolving
            if not self._running:
                raise RuntimeError("server not started")
            if (self.max_queue_images is not None
                    and self._pending + n > self.max_queue_images):
                raise ServerOverloadedError(
                    f"backlog {self._pending} + {n} images exceeds "
                    f"max_queue_images={self.max_queue_images}"
                )
            self._pending += n
            self._q.put(req)
        return req.future

    def classify(self, images, timeout: Optional[float] = None,
                 return_probs: bool = False):
        return self.submit(images, return_probs).result(timeout)

    # -- hooks ---------------------------------------------------------------

    def _validate(self, images) -> None:
        pass

    def _release_pending(self, reqs) -> None:
        with self._pending_lock:
            self._pending -= sum(len(r.images) for r in reqs)

    @staticmethod
    def _resolve(fut: Future, result=None, exc=None) -> None:
        """set_result/set_exception that tolerates a client-cancelled
        future — an InvalidStateError here would kill the completer thread
        and wedge the bounded in-flight pipeline."""
        try:
            if exc is not None:
                fut.set_exception(exc)
            else:
                fut.set_result(result)
        except Exception:  # concurrent.futures.InvalidStateError
            pass

    def _expired(self, req: "_Request") -> bool:
        """If the request's submit deadline has passed while still queued,
        fail it (DeadlineExceededError) and return True.  Called by the
        dispatcher as it pulls requests into a batch — dispatched work is
        never cancelled."""
        if req.deadline is None or time.perf_counter() < req.deadline:
            return False
        self._resolve(
            req.future,
            exc=DeadlineExceededError(
                f"request of {len(req.images)} images spent longer than its "
                "deadline in the queue"
            ),
        )
        self._release_pending([req])
        self.stats.deadline_expired += 1
        return True

    def _to_host(self, arr) -> np.ndarray:
        return np.asarray(arr)  # host sync for this batch

    def _dispatch_loop(self) -> None:
        raise NotImplementedError

    # -- completer -----------------------------------------------------------

    def _complete_loop(self) -> None:
        while True:
            item = self._inflight.get()
            if item is _STOP:
                break
            labels_dev, top_dev, probs_dev, reqs = item
            try:
                labels = self._to_host(labels_dev)
                top = self._to_host(top_dev)
                probs = self._to_host(probs_dev) if probs_dev is not None else None
            except Exception as e:
                for r in reqs:
                    self._resolve(r.future, exc=e)
                self._release_pending(reqs)
                continue
            # Snapshot the stats object once and record the WHOLE batch's
            # stats BEFORE resolving any future: a selftest thread swaps
            # ``self.stats`` the moment classify() returns, and stats
            # recorded after a _resolve would leak into the fresh SLO window.
            stats = self.stats
            stats.batches += 1
            done_t = time.perf_counter()
            for r in reqs:
                stats.requests += 1
                stats.images += len(r.images)
                stats.latency.record(done_t - r.submit_t)
            off = 0
            for r in reqs:
                n = len(r.images)
                p = (
                    probs[off : off + n]
                    if (probs is not None and r.return_probs)
                    else None
                )
                self._resolve(
                    r.future, (labels[off : off + n], top[off : off + n], p)
                )
                off += n
            self._release_pending(reqs)


class InferenceServer(_ServerBase):
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
        max_queue_images: "Optional[int]" = None,
    ):
        if max_batch < 1:
            raise ValueError("max_batch and pipeline_depth must be >= 1")
        if max_queue_images is None:
            max_queue_images = 8 * max_batch  # bounded backlog by default
        super().__init__(engine, pipeline_depth, max_queue_images)
        self.max_batch = max_batch
        self.max_delay = max_delay_ms / 1e3
        self._serve_fn = make_serve_fn(engine)

    def _validate(self, images) -> None:
        # a request past max_batch would dispatch a padded size outside
        # the warmed jit cache — a surprise multi-minute compile through
        # this environment's tunnel; make the client split it instead
        if len(images) > self.max_batch:
            raise ValueError(
                f"request of {len(images)} images exceeds "
                f"max_batch={self.max_batch}; split into smaller requests"
            )

    def swap_params(self, params) -> None:
        """Zero-downtime weight reload: stage the new checkpoint through the
        engine's dtype/quantization/placement policy, then swap it in
        atomically.  No drain, no recompile (same shapes -> same compiled
        programs): batches already dispatched finish on the old weights,
        the next `_gather`'d batch serves the new ones.  Raises ValueError
        (and keeps serving the old weights) on a shape/structure mismatch."""
        self.engine.swap_params(params)

    # -- internals ----------------------------------------------------------

    def _gather(self) -> Optional[List[_Request]]:
        """Collect requests up to (never past) max_batch images or
        max_delay.  A request that would overflow the batch is carried to
        the next one, so padded batch sizes stay within the warmed jit
        cache (each new padded size is a fresh ~minutes compile through
        this environment's tunnel).  Requests whose submit deadline expired
        while queued are failed here instead of batched."""
        first = None
        while first is None:
            first = self._carry or self._q.get()
            self._carry = None
            if first is _STOP:
                return None
            if self._expired(first):
                first = None
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
            if self._expired(nxt):
                continue
            if total + len(nxt.images) > self.max_batch:
                self._carry = nxt
                break
            reqs.append(nxt)
            total += len(nxt.images)
        return reqs

    def warmup(self) -> None:
        """Compile every padded batch size the server can dispatch (one
        program per padding-grain multiple up to max_batch) before serving
        traffic — the production analog of the reference compiling
        kernel.cl at startup (ViT_opencl.c:89-96)."""
        engine = self.engine
        cfg = engine.cfg
        grain = engine.batch_pad
        sizes = sorted({min(s, self.max_batch) for s in
                        range(grain, self.max_batch + grain, grain)})
        for s in sizes:
            x = np.zeros((s, cfg.in_channels, cfg.image_size, cfg.image_size),
                         np.float32)
            staged, n = engine._stage(x)
            _, top, _ = self._serve_fn(engine.params, staged)
            # a scalar host readback is the only reliable compile/run sync
            # on remote backends (block_until_ready can return early
            # through this environment's tunnel — docs/performance.md)
            float(top.sum())

    def _dispatch_loop(self) -> None:
        engine = self.engine
        while True:
            reqs = self._gather()
            if reqs is None:
                break
            try:
                import jax
                import jax.numpy as jnp

                if len(reqs) == 1:
                    batch = reqs[0].images
                elif any(isinstance(r.images, jax.Array) for r in reqs):
                    batch = jnp.concatenate(
                        [jnp.asarray(r.images) for r in reqs], axis=0
                    )
                else:
                    batch = np.concatenate([r.images for r in reqs], axis=0)
                x, n = engine._stage(batch)
                # device-side argmax/top-prob: the readback per batch is
                # ~8 B/image instead of 4 KB/image (num_classes fp32);
                # padded tail rows are never read (offsets cover real
                # images only)
                labels, top, probs = self._serve_fn(engine.params, x)
                want_probs = any(r.return_probs for r in reqs)
                if not want_probs:
                    probs = None
                start_async_readback(labels, top, probs)
                self._inflight.put((labels, top, probs, reqs))  # backpressure
            except Exception as e:  # config errors etc. -> fail the batch
                for r in reqs:
                    self._resolve(r.future, exc=e)
                self._release_pending(reqs)
        self._inflight.put(_STOP)


def _prepare_selftest(
    server: InferenceServer,
    request_sizes: List[int],
    cfg,
    seed: int,
    device_staged: bool,
) -> list:
    """Shared selftest setup: build the synth request stream, optionally
    pre-place it on device, warm the jit cache, and open a fresh SLO
    window.  Returns the list of request payloads.

    ``device_staged`` pre-places every request payload on the device,
    measuring the serving loop itself (batching + pipeline + compute)
    without the host->device transfer — on this environment's remote TPU
    tunnel (~13 MB/s) the wire otherwise dominates by 50x, which no
    batching can hide; a local PCIe deployment sits near the staged number.
    """
    from vit_tpu.io import images as iio

    pool = iio.synth_images(max(request_sizes), cfg, seed=seed)
    requests = [np.asarray(pool[:n]) for n in request_sizes]
    if device_staged:
        import jax
        import jax.numpy as jnp

        requests = [
            jax.device_put(jnp.asarray(r, server.engine.compute_dtype))
            for r in requests
        ]
        # block_until_ready can return before remote execution completes
        # through this environment's tunnel (CLAUDE.md); a scalar readback
        # over every staged array is the real barrier, keeping in-flight
        # transfers out of the timed window
        float(sum(jnp.sum(r[..., 0, 0]) for r in requests))
    server.warmup()  # compile every padded size outside the timed window
    server.classify(requests[0])
    server.stats = ServerStats()  # SLO window excludes warmup traffic
    return requests


def measure_throughput(
    server: InferenceServer,
    request_sizes: List[int],
    cfg,
    seed: int = 0,
    device_staged: bool = False,
) -> Tuple[float, int]:
    """Drive the server with a pre-generated stream of variable-size synth
    requests; returns (images/sec, total_images).  Used by the serve CLI's
    --selftest to compare against bench.py's static-batch number.

    See ``_prepare_selftest`` for the ``device_staged`` semantics.
    """
    requests = _prepare_selftest(server, request_sizes, cfg, seed, device_staged)
    # the whole stream is enqueued at t=0 BY DESIGN (backlog-drain
    # measurement): suspend load-shedding for the burst so a default
    # max_queue_images can't shed the benchmark's own traffic mid-submit
    cap, server.max_queue_images = server.max_queue_images, None
    try:
        t0 = time.perf_counter()
        futures = [server.submit(r) for r in requests]
        for f in futures:
            f.result()
        dt = time.perf_counter() - t0
    finally:
        server.max_queue_images = cap
    total = sum(request_sizes)
    return total / dt, total


def measure_steady_state(
    server: InferenceServer,
    request_sizes: List[int],
    cfg,
    rate_rps: float,
    seed: int = 0,
    device_staged: bool = False,
) -> Tuple[float, int, float]:
    """Drive the server with paced Poisson arrivals at ``rate_rps``
    requests/sec; returns (images/sec achieved, total_images, offered_rps).

    ``measure_throughput`` enqueues the whole stream at t=0, so its latency
    histogram measures backlog drain under saturation (throughput x queue
    depth).  This variant spaces submissions with seeded exponential
    inter-arrival gaps — below capacity, the recorded p50/p99 is the true
    per-request service latency (queueing + batching delay + compute +
    readback), the number an SLO is actually written against.  Offered load
    at or above capacity degenerates to the saturation measurement.
    """
    if rate_rps <= 0:
        raise ValueError(f"rate_rps must be > 0, got {rate_rps}")
    requests = _prepare_selftest(server, request_sizes, cfg, seed, device_staged)
    gaps = np.random.default_rng(seed).exponential(
        1.0 / rate_rps, len(requests)
    )
    # suspend load-shedding like measure_throughput: at/above-capacity
    # offered load must degenerate to the saturation measurement (the
    # documented behavior), not raise ServerOverloadedError out of the
    # submit loop once the backlog crosses max_queue_images
    cap, server.max_queue_images = server.max_queue_images, None
    try:
        t0 = time.perf_counter()
        arrivals = t0 + np.cumsum(gaps)
        futures = []
        for due, r in zip(arrivals, requests):
            delay = due - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            futures.append(server.submit(r))
        for f in futures:
            f.result()
        dt = time.perf_counter() - t0
    finally:
        server.max_queue_images = cap
    total = sum(request_sizes)
    offered = len(requests) / float(arrivals[-1] - t0)
    return total / dt, total, offered
