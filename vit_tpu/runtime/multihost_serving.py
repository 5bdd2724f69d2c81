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
the pod while no traffic flows, so each tick first runs one tiny
collective over per-host (work, stopping) counters and skips the forward
when no host has work.  The same collective is the shutdown rendezvous: a
host whose ``stop()`` was called keeps ticking (contributing zero work and
a stop flag, still joining any forward another host triggers) until EVERY
host has flagged stop — without this, the first host to exit would leave
the others blocked forever inside a collective.  With one process (this
environment), the server degenerates to blocking on the local queue, and
the whole flow is exercised on the virtual CPU mesh in tests.

The reference has no serving at all (its driver is a one-shot loop,
Main.c:45-72); this is the pod-scale extension of runtime/serving.py.
"""

from __future__ import annotations

import queue
import time
from typing import List, Optional

import numpy as np

from vit_tpu.runtime.serving import (
    _STOP,
    _Request,
    _ServerBase,
    make_serve_fn,
    start_async_readback,
)


class LockstepServer(_ServerBase):
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
        max_queue_images: "Optional[int]" = None,
    ):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        if local_batch < 1:
            raise ValueError("local_batch and pipeline_depth must be >= 1")
        if engine.mesh is None or "dp" not in engine.mesh.axis_names:
            raise ValueError("LockstepServer needs an engine with a 'dp' mesh")
        super().__init__(engine, pipeline_depth,
                 max_queue_images if max_queue_images is not None
                 else 8 * local_batch)
        self.local_batch = local_batch
        self.tick = tick_ms / 1e3
        self._procs = jax.process_count()
        self.global_batch = local_batch * self._procs
        mesh = engine.mesh
        dp = mesh.shape["dp"]
        if self.global_batch % dp:
            raise ValueError(
                f"global batch {self.global_batch} (local {local_batch} x "
                f"{self._procs} hosts) must divide dp={dp}"
            )

        self._batch_sharding = NamedSharding(mesh, P("dp"))
        # dp-sharded outputs: each host's readback touches only its
        # locally-addressable shard (no cross-host gather)
        self._serve_fn = make_serve_fn(
            engine, out_shardings=NamedSharding(mesh, P("dp"))
        )

        if self._procs > 1:
            # per-tick control collective: (dp_total, 2) int32 of
            # [queued-work, stopping] rows, one row per dp shard (each host
            # filling its dp/procs rows) — pods have uniform
            # devices-per-host, so dp % procs == 0.  column sums are tiny
            # and replicated; they drive idle-skip and shutdown rendezvous.
            if dp % self._procs:
                raise ValueError(f"dp={dp} must divide across {self._procs} hosts")
            self._ctrl_rows = dp // self._procs
            self._dp_total = dp
            self._ctrl_sum = jax.jit(
                lambda c: c.sum(axis=0),
                out_shardings=NamedSharding(mesh, P()),
            )
            self._ctrl_sharding = NamedSharding(mesh, P("dp"))

    # -- request API ------------------------------------------------------------

    def _validate(self, images) -> None:
        if len(images) > self.local_batch:
            raise ValueError(
                f"request of {len(images)} exceeds local_batch={self.local_batch}"
            )

    def warmup(self) -> None:
        """Compile the (single) tick program before traffic.  Every host
        must call this together.  If the server is already running, the
        warmup is routed through the tick loop itself — dispatching
        directly from another thread would interleave collectives in
        different orders on different hosts (lockstep violation)."""
        cfg = self.engine.cfg
        if self._running:
            self.classify(
                np.zeros((1, cfg.in_channels, cfg.image_size, cfg.image_size),
                         np.float32)
            )
            return
        labels, top, _ = self._dispatch(
            [_Request(np.zeros(self._local_shape(), np.float32), False)]
        )
        float(self._local_rows(top).sum())  # host sync (tunnel-safe)
        if self._procs > 1:
            # the control collective is its own jit program: compile it
            # now too, or the first real tick stalls every queued request
            # behind a multi-second compile (symmetric across hosts —
            # every host runs warmup before start())
            self._tick_control(0, False)

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
        first = None
        while first is None:
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
            if self._expired(first):  # deadline passed while queued
                first = None
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
            if self._expired(nxt):
                continue
            if total + len(nxt.images) > self.local_batch:
                self._carry = nxt
                break
            reqs.append(nxt)
            total += len(nxt.images)
        return reqs

    def _dispatch(self, reqs: List[_Request]):
        """Assemble this host's padded slice of the global batch and run
        one tick's forward."""
        import jax
        import jax.numpy as jnp

        engine = self.engine
        if self._procs == 1 and any(
            isinstance(r.images, jax.Array) for r in reqs
        ):
            # device-resident payloads stay on device (mirrors
            # InferenceServer.submit's contract; keeps --staged selftests
            # off this environment's ~13 MB/s tunnel wire)
            parts = [jnp.asarray(r.images, engine.compute_dtype) for r in reqs]
            pad = self.local_batch - sum(len(p) for p in parts)
            if pad:
                parts.append(
                    jnp.zeros((pad,) + self._local_shape()[1:], engine.compute_dtype)
                )
            x = jax.device_put(
                jnp.concatenate(parts, axis=0), self._batch_sharding
            )
        else:
            local = np.zeros(self._local_shape(), np.float32)
            off = 0
            for r in reqs:
                local[off : off + len(r.images)] = np.asarray(r.images)
                off += len(r.images)
            x = jax.make_array_from_process_local_data(
                self._batch_sharding,
                local.astype(engine.compute_dtype),
                (self.global_batch,) + local.shape[1:],
            )
        return self._serve_fn(engine.params, x)

    def _tick_control(self, n_work: int, stopping: bool):
        """One control collective: -> (global work, hosts-all-stopped)."""
        import jax

        row = np.array([[n_work, 1 if stopping else 0]], np.int32)
        counts = jax.make_array_from_process_local_data(
            self._ctrl_sharding,
            np.repeat(row, self._ctrl_rows, axis=0),
            (self._dp_total, 2),
        )
        work, stopped = (int(v) for v in np.asarray(self._ctrl_sum(counts)))
        return work, stopped == self._dp_total

    def _dispatch_loop(self) -> None:
        stopping = False
        while True:
            if stopping:
                reqs: List[_Request] = []
                time.sleep(self.tick)
            else:
                got = self._gather_tick()
                if got is None:  # local stop requested
                    stopping = True
                    reqs = []
                    if self._procs == 1:
                        break  # no peers to rendezvous with
                else:
                    reqs = got
            if self._procs > 1:
                # lockstep control tick: skip the forward when the pod is
                # idle; exit only when EVERY host has flagged stop (a
                # stopping host keeps joining forwards others trigger)
                work, all_stopped = self._tick_control(
                    sum(len(r.images) for r in reqs), stopping
                )
                if all_stopped:
                    break
                if work == 0:
                    continue
            elif not reqs:
                continue
            cancelled = [r for r in reqs
                         if not r.future.set_running_or_notify_cancel()]
            if cancelled:
                self._release_pending(cancelled)
                reqs = [r for r in reqs if r not in cancelled]
            if self._procs == 1 and not reqs:
                # every gathered request was client-cancelled; with no
                # peers to stay in lockstep with, skip the all-zeros
                # forward entirely (multi-host must still dispatch)
                continue
            try:
                labels, top, probs = self._dispatch(reqs)
                if not reqs:
                    continue  # joined the collective for other hosts' work
                if not any(r.return_probs for r in reqs):
                    probs = None
                start_async_readback(labels, top, probs)
                self._inflight.put((labels, top, probs, reqs))
            except Exception as e:
                for r in reqs:
                    self._resolve(r.future, exc=e)
                self._release_pending(reqs)
        self._inflight.put(_STOP)

    def _local_rows(self, arr) -> np.ndarray:
        """This host's rows of a dp-sharded output, in global index order.

        One shard per distinct row range: a replicating mesh axis (tp)
        gives every dp index multiple addressable replicas, and naively
        concatenating them duplicates rows — the completer would then
        slice the WRONG labels for any batch past the first dp shard."""
        by_start = {}
        for s in arr.addressable_shards:
            start = s.index[0].start or 0
            if start not in by_start:
                by_start[start] = s
        return np.concatenate(
            [np.asarray(by_start[k].data) for k in sorted(by_start)], axis=0
        )

    def _to_host(self, arr) -> np.ndarray:
        return self._local_rows(arr)
