"""Profiler utilities tests (PhaseTimer + MXU roofline)."""

import time

from vit_tpu.config import VIT_B_16
from vit_tpu.runtime.profiler import PhaseTimer, roofline


def test_phase_timer_accumulates():
    t = PhaseTimer()
    for _ in range(3):
        with t.phase("work"):
            time.sleep(0.01)
    assert t.counts["work"] == 3
    assert t.totals["work"] >= 0.03
    assert "work" in t.report() and "x3" in t.report()


def test_roofline_math():
    # 100 images in 32.7ms on a 197-TFLOP/s chip
    stats = roofline(VIT_B_16, batch=100, seconds=0.0327, chip="v5e", dtype="bf16")
    assert abs(stats["images_per_sec"] - 100 / 0.0327) < 1e-6
    assert stats["flops"] == VIT_B_16.flops_per_image() * 100
    assert 0.5 < stats["mxu_utilization"] < 0.6  # the measured round-1 point


def test_flops_per_image_magnitude():
    # ViT-B/16 forward ~35 GFLOP (2x the ~17.5 GMAC literature number)
    assert 3.0e10 < VIT_B_16.flops_per_image() < 4.0e10


def test_timing_spread_median_and_bounds():
    from vit_tpu.runtime.profiler import timing_spread

    vals = iter([0.3, 0.1, 0.2])

    def fn(iters):
        assert iters == 7
        return next(vals)

    med, lo, hi = timing_spread(fn, 7)
    assert (med, lo, hi) == (0.2, 0.1, 0.3)


def test_timing_spread_stateful_threads_state():
    from vit_tpu.runtime.profiler import timing_spread_stateful

    def fn(iters, a, b):
        # state threads through every sample (donated-buffer pattern)
        return 0.25 * (a + 1), a + 1, b * 2

    med, lo, hi, state = timing_spread_stateful(fn, 5, (0, 1))
    assert state == (3, 8)
    assert (lo, med, hi) == (0.25, 0.5, 0.75)


def test_forward_timing_warm_plus_samples_and_bounds():
    import jax.numpy as jnp

    from vit_tpu.runtime.profiler import forward_timing

    calls = []

    def fwd():
        calls.append(1)
        return jnp.ones((4,), jnp.bfloat16)

    med, lo, hi = forward_timing(fwd, iters=2, warm=1, samples=3)
    # warm window runs the full timed expression once; then 3 samples x 2
    assert len(calls) == 1 + 3 * 2
    assert 0 <= lo <= med <= hi


def test_device_preflight_passes_on_live_backend():
    from vit_tpu.runtime.profiler import device_preflight

    # default probe: a real (CPU here) matmul + readback completes fast
    assert device_preflight(timeout_s=120.0) is True


def test_device_preflight_times_out_on_hung_probe():
    from vit_tpu.runtime.profiler import device_preflight

    def hung():
        time.sleep(30)

    assert device_preflight(timeout_s=0.2, probe=hung) is False


def test_device_preflight_env_zero_disables(monkeypatch):
    from vit_tpu.runtime.profiler import device_preflight

    monkeypatch.setenv("VIT_TPU_PREFLIGHT_S", "0")

    def boom():
        raise AssertionError("probe must not run when disabled")

    assert device_preflight(probe=boom) is True


def test_roofline_rejects_unknown_chip_dtype():
    """The gated metric must not silently fall back to the v5e bf16 peak
    for a typo'd chip/dtype."""
    import pytest

    from vit_tpu.config import VIT_B_16
    from vit_tpu.runtime.profiler import roofline

    with pytest.raises(KeyError, match="v6e_fp32"):
        roofline(VIT_B_16, 8, 0.01, chip="v6e", dtype="fp32")
