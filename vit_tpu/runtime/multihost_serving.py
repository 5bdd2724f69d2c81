"""Multi-host (pod) serving: lockstep tick dispatch.

The single-host daemon (runtime/serving.py) coalesces requests freely
because one process owns the chip.  On a pod, every process must enter the
same XLA program in the same order, so free-form dynamic batching would
need a cross-host scheduler.  This module uses the standard lockstep
alternative: every host runs a ``LockstepServer`` over the SAME global
mesh, and on each tick every host contributes a fixed-size local slice
(padded with zeros) to ONE global data-parallel batch.  Because the jitted
program is shape-static, no batch metadata ever crosses hosts — each host
pads locally, reads back only its own addressable output shard, and the
collective compute itself is the synchronization barrier.

Idle ticks: dispatching the full forward on all-zero batches would burn
the pod while no traffic flows, so each tick first runs a scalar
``psum(local_queue_depth)`` — one tiny collective — and skips the forward
when no host has work.  With one process (this environment), the server
degenerates to blocking on the local queue, and the whole flow is
exercised on the virtual CPU mesh in tests.

The reference has no serving at all (its driver is a one-shot loop,
Main.c:45-72); this is the pod-scale extension of runtime/serving.py.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import List, Optional

import numpy as np

from vit_tpu.runtime.serving import ServerStats, _Request, _STOP


class LockstepServer:
    """Fixed-tick, fixed-local-batch server over a global (possibly
    multi-host) mesh.

    Args:
      engine: an InferenceEngine built over the global mesh (its 'dp' axis
        must span ``local_batch * jax.process_count()`` evenly).
      local_batch: images this host contributes per tick (the global batch
        is ``local_batch * process_count``; shape-static, compiled once).
      tick_ms: lockstep period — how often idle hosts poll the any-work
        collective.  Irrelevant at process_count == 1 (the server blocks
        on its queue instead).
      pipeline_depth: in-flight batches (dispatch/readback overlap).
    """

    def __init__(
        self,
        engine,
        local_batch: int = 32,
        tick_ms: float = 10.0,
        pipeline_depth: int = 2,
    ):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vit_tpu.ops import reference

        if local_batch < 1 or pipeline_depth < 1:
            raise ValueError("local_batch and pipeline_depth must be >= 1")
        if engine.mesh is None or "dp" not in engine.mesh.axis_names:
            raise ValueError("LockstepServer needs an engine with a 'dp' mesh")
        self.engine = engine
        self.local_batch = local_batch
        self.tick = tick_ms / 1e3
        self.stats = ServerStats()
        self._procs = jax.process_count()
        self.global_batch = local_batch * self._procs
        dp = engine.mesh.shape["dp"]
        if self.global_batch % dp:
            raise ValueError(
                f"global batch {self.global_batch} (local {local_batch} x "
                f"{self._procs} hosts) must divide dp={dp}"
            )
        self._q: "queue.Queue" = queue.Queue()
        self._inflight: "queue.Queue" = queue.Queue(maxsize=pipeline_depth)
        self._carry: Optional[_Request] = None
        self._running = False
        self._dispatcher: Optional[threading.Thread] = None
        self._completer: Optional[threading.Thread] = None

        mesh = engine.mesh
        self._batch_sharding = NamedSharding(mesh, P("dp"))
        out_shard = NamedSharding(mesh, P("dp"))

        def _postprocess(logits):
            probs = reference.softmax(logits)
            labels = jnp.argmax(probs, axis=-1)
            top = jnp.take_along_axis(probs, labels[:, None], axis=-1)[:, 0]
            return labels, top, probs

        # one dispatch per tick; dp-sharded outputs so each host's readback
        # touches only its locally-addressable shard (no cross-host gather)
        self._serve_fn = jax.jit(
            lambda params, x: _postprocess(engine._forward(params, x)),
            out_shardings=(out_shard, out_shard, out_shard),
        )

        if self._procs > 1:
            # tiny any-work collective: a replicated scalar sum over the
            # per-host queue depths, so idle ticks skip the full forward.
            # The counts vector lays out over the full 'dp' axis (one entry
            # per dp shard, each host filling its dp/procs slots) — pods
            # have uniform devices-per-host, so dp % procs == 0.
            if dp % self._procs:
                raise ValueError(f"dp={dp} must divide across {self._procs} hosts")
            self._depth_local = dp // self._procs
            self._any_work = jax.jit(
                lambda counts: counts.sum(),
                out_shardings=NamedSharding(mesh, P()),
            )
            self._depth_sharding = NamedSharding(mesh, P("dp"))

    # -- lifecycle ------------------------------------------------------------

    def start(self) -> "LockstepServer":
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

    # -- request API ------------------------------------------------------------

    def submit(self, images, return_probs: bool = False) -> Future:
        """Enqueue an (n, C, H, W) request from THIS host; n must fit one
        tick (n <= local_batch).  Resolves to (labels, top_probs, probs)
        for those n images."""
        images = np.asarray(images)
        if images.ndim != 4:
            raise ValueError(f"expected (n, C, H, W), got {images.shape}")
        if len(images) > self.local_batch:
            raise ValueError(
                f"request of {len(images)} exceeds local_batch={self.local_batch}"
            )
        if not self._running:
            raise RuntimeError("server not started")
        req = _Request(images, return_probs)
        self._q.put(req)
        return req.future

    def classify(self, images, timeout: Optional[float] = None,
                 return_probs: bool = False):
        return self.submit(images, return_probs).result(timeout)

    def warmup(self) -> None:
        """Compile the (single) tick program before traffic.  Every host
        must call this together — it dispatches the global forward once."""
        labels, top, _ = self._dispatch(
            np.zeros(self._local_shape(), np.float32)
        )
        float(self._local_rows(top).sum())  # host sync (tunnel-safe)

    # -- internals ------------------------------------------------------------

    def _local_shape(self):
        cfg = self.engine.cfg
        return (self.local_batch, cfg.in_channels, cfg.image_size, cfg.image_size)

    def _gather_tick(self) -> Optional[List[_Request]]:
        """Pull requests for one tick (never past local_batch images).
        Single-process: blocks until work arrives.  Multi-host: returns
        (possibly empty) immediately after the tick window so the host
        stays in lockstep."""
        reqs: List[_Request] = []
        total = 0
        first = self._carry
        self._carry = None
        if first is None:
            try:
                first = self._q.get(
                    timeout=self.tick if self._procs > 1 else None
                )
            except queue.Empty:
                return reqs  # idle tick (multi-host keeps ticking)
        if first is _STOP:
            return None
        reqs.append(first)
        total = len(first.images)
        while total < self.local_batch:
            try:
                nxt = self._q.get_nowait()
            except queue.Empty:
                break
            if nxt is _STOP:
                self._q.put(_STOP)
                break
            if total + len(nxt.images) > self.local_batch:
                self._carry = nxt
                break
            reqs.append(nxt)
            total += len(nxt.images)
        return reqs

    def _dispatch(self, local: np.ndarray):
        """Join the global batch and run one tick's forward."""
        import jax

        engine = self.engine
        x = jax.make_array_from_process_local_data(
            self._batch_sharding,
            local.astype(engine.compute_dtype),
            (self.global_batch,) + local.shape[1:],
        )
        return self._serve_fn(engine.params, x)

    def _dispatch_loop(self) -> None:
        while True:
            reqs = self._gather_tick()
            if reqs is None:
                break
            if self._procs > 1:
                # lockstep any-work scalar: every host dispatches this each
                # tick; skip the forward when the pod is idle
                import jax

                counts = jax.make_array_from_process_local_data(
                    self._depth_sharding,
                    np.full((self._depth_local,), len(reqs), np.int32),
                    (self._depth_local * self._procs,),
                )
                if int(self._any_work(counts)) == 0:
                    continue
            elif not reqs:
                continue
            try:
                local = np.zeros(self._local_shape(), np.float32)
                off = 0
                for r in reqs:
                    local[off : off + len(r.images)] = r.images
                    off += len(r.images)
                labels, top, probs = self._dispatch(local)
                if not any(r.return_probs for r in reqs):
                    probs = None
                for arr in (labels, top) + ((probs,) if probs is not None else ()):
                    try:
                        arr.copy_to_host_async()
                    except AttributeError:
                        pass
                self._inflight.put((labels, top, probs, reqs))
            except Exception as e:
                for r in reqs:
                    r.future.set_exception(e)
        self._inflight.put(_STOP)

    def _local_rows(self, arr) -> np.ndarray:
        """This host's rows of a dp-sharded output, in global index order."""
        shards = sorted(
            arr.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    def _complete_loop(self) -> None:
        while True:
            item = self._inflight.get()
            if item is _STOP:
                break
            labels_dev, top_dev, probs_dev, reqs = item
            try:
                labels = self._local_rows(labels_dev)
                top = self._local_rows(top_dev)
                probs = (
                    self._local_rows(probs_dev) if probs_dev is not None else None
                )
            except Exception as e:
                for r in reqs:
                    r.future.set_exception(e)
                continue
            self.stats.batches += 1
            off = 0
            for r in reqs:
                n = len(r.images)
                p = (
                    probs[off : off + n]
                    if (probs is not None and r.return_probs)
                    else None
                )
                r.future.set_result(
                    (labels[off : off + n], top[off : off + n], p)
                )
                off += n
                self.stats.requests += 1
                self.stats.images += n
