"""Profiling utilities: phase timers + MXU roofline.

Replaces the reference's clock()-printf instrumentation (Main.c:55-60,
ViT_opencl.c:745-779, plus the vestigial accumulator globals in
Network.h:23-32) with (a) a context-manager phase timer that actually
aggregates, (b) an MXU-utilization roofline calculator (the metric BASELINE
gates on), and (c) a hook into jax.profiler for real traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

from vit_tpu.config import ViTConfig

# Peak specs per chip. v5e: 197 TFLOP/s bf16, 98.5 TFLOP/s fp32-ish via
# bf16x3 passes is lower in practice; HBM ~819 GB/s.
CHIP_PEAKS_TFLOPS = {
    "v5e_bf16": 197.0,
    "v5e_fp32": 49.0,  # HIGHEST precision ≈ 6 bf16 passes; conservative
    "v6e_bf16": 918.0,
}


def timing_spread_stateful(fn, iters, state=(), samples=3):
    """>=3 independent timing samples -> (median, min, max, state).

    ``fn(iters, *state) -> (seconds_per_iter, *state)`` threads state so
    donated buffers (train params/optimizer) survive between samples.

    One sample can't distinguish a regression from environment variance
    (shared chip / tunnel / host load — see docs/performance.md's
    cross-run-variance note): every bench in this repo quotes the median
    and carries min/max so each artifact records its own noise floor.
    """
    dts = []
    for _ in range(samples):
        dt, *state = fn(iters, *state)
        dts.append(dt)
    dts.sort()
    return dts[len(dts) // 2], dts[0], dts[-1], tuple(state)


def timing_spread(fn, iters, samples=3):
    """``timing_spread_stateful`` for stateless timed fns
    (``fn(iters) -> seconds_per_iter``) -> (median, min, max)."""
    return timing_spread_stateful(lambda n: (fn(n),), iters, (), samples)[:3]


def device_preflight(timeout_s=None, probe=None):
    """True iff a trivial device matmul completes within ``timeout_s``
    (default: $VIT_TPU_PREFLIGHT_S or 900; <=0 skips the probe -> True).
    The default was 420 s; measured 2026-08-21, the FIRST client
    connection after a tunnel recovery can take 146-347 s just to
    establish, so 420 left too little margin for the probe itself.

    The TPU in this environment sits behind a remote tunnel that can wedge
    for hours after a killed job (docs/performance.md): a benchmark started
    against a wedged backend hangs forever and produces NO artifact.  A
    bounded probe turns that failure mode into an explicit error report.
    The probe runs in a daemon thread because a hung device RPC cannot be
    cancelled from Python — on timeout the thread is abandoned, so the
    caller should exit rather than retry in-process.  ``probe`` is
    injectable for tests."""
    import os
    import threading

    if timeout_s is None:
        timeout_s = float(os.environ.get("VIT_TPU_PREFLIGHT_S", "900"))
    if timeout_s <= 0:
        return True

    if probe is None:
        def probe():
            import jax.numpy as jnp

            x = jnp.ones((256, 256), jnp.float32)
            float(jnp.sum(x @ x))  # scalar readback: the only reliable sync

    done = threading.Event()

    def run():
        probe()
        done.set()

    t = threading.Thread(target=run, daemon=True, name="device-preflight")
    t.start()
    return done.wait(timeout_s)


def forward_timing(forward, iters, warm=3, samples=3):
    """THE recipe for timing a ``forward() -> array`` call chain ->
    (median, min, max) seconds per call.

    Each timed window folds every output into a device-side accumulator and
    closes with ONE scalar readback — through the TPU tunnel
    ``block_until_ready`` returns early, so the readback is the only
    reliable sync, and it costs a ~20-50 ms RTT that must be amortized over
    ``iters`` (docs/performance.md).  ``warm`` runs the FULL timed
    expression first (the accumulator's sum/add ops have their own
    first-use compile which must not land inside the timing).  Shared by
    bench.py and scripts/bench_*.py so the sync discipline can't drift
    between benches (same rule as :func:`train_step_timing`).
    """
    import jax.numpy as jnp

    def timed(n):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = acc + jnp.sum(forward()).astype(jnp.float32)
        float(acc)  # single host sync closes the timed window
        return (time.perf_counter() - t0) / n

    timed(warm)
    return timing_spread(timed, iters, samples)


def train_step_timing(step, params, opt_state, x, y, iters,
                      warm=2, samples=3):
    """Donation-safe train-step timing -> (median, min, max, last_loss).

    THE one recipe for timing a jitted ``step(params, opt_state, x, y) ->
    (params, opt_state, loss)`` compiled with ``donate_argnums=(0, 1)``:
    state threads through every call (donated buffers are consumed), the
    loss readback is the host sync that closes each timed window (through
    the TPU tunnel ``block_until_ready`` returns early — see
    docs/performance.md), warm-up covers compile + first-use, and the
    measurement is >=3 independent samples via ``timing_spread_stateful``.
    Shared by bench.py and scripts/bench_train*.py so the discipline
    can't drift between the round artifact and the docs tables.
    """
    loss_box = [None]

    def run(n, p, o):
        t0 = time.perf_counter()
        for _ in range(n):
            p, o, loss = step(p, o, x, y)
        loss_box[0] = float(loss)  # host sync closes the timed window
        return (time.perf_counter() - t0) / n, p, o

    _, params, opt_state = run(warm, params, opt_state)
    dt, dt_min, dt_max, _ = timing_spread_stateful(
        run, iters, (params, opt_state), samples
    )
    return dt, dt_min, dt_max, loss_box[0]


class PhaseTimer:
    """Accumulating wall-clock phase timer.

    Usage::

        timer = PhaseTimer()
        with timer.phase("attn"):
            out = jax.block_until_ready(f(x))
        print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {total*1e3:10.2f} ms total  {total/n*1e3:8.2f} ms/call  x{n}")
        return "\n".join(lines)


def roofline(
    cfg: ViTConfig,
    batch: int,
    seconds: float,
    chip: str = "v5e",
    dtype: str = "bf16",
    n_chips: int = 1,
) -> Dict[str, float]:
    """Achieved FLOP/s and MXU utilization for a timed forward pass."""
    flops = cfg.flops_per_image() * batch
    achieved = flops / seconds
    key = f"{chip}_{dtype}"
    if key not in CHIP_PEAKS_TFLOPS:
        # this is the metric BASELINE gates on: a typo'd chip/dtype must
        # not silently compute utilization against the v5e bf16 peak
        raise KeyError(
            f"no peak for {key!r}; known: {sorted(CHIP_PEAKS_TFLOPS)}"
        )
    peak = CHIP_PEAKS_TFLOPS[key]
    peak_total = peak * 1e12 * n_chips
    return {
        "flops": float(flops),
        "tflops_per_sec": achieved / 1e12,
        "mxu_utilization": achieved / peak_total,
        "images_per_sec": batch / seconds,
        "images_per_sec_per_chip": batch / seconds / n_chips,
    }


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
