#!/usr/bin/env python
"""Per-kernel timings of the fused-block forward kernels (bf16 vs int8).

Each kernel is timed inside a 12-layer ``lax.scan`` in ONE jit (mirrors the
in-model execution; per-dispatch tunnel overhead otherwise dominates
isolated calls).  Used to locate where the int8 path loses its 2x MXU rate
(VERDICT r1 #3) and which kernel bounds the bf16 headline (#4).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vit_tpu.runtime.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.ops.pallas import fused_block as FB
from vit_tpu.ops.pallas import quant_kernels as QK
from vit_tpu.runtime.profiler import forward_timing

L = 12


def timeit_scan(body, x, weights, iters=30):
    """Time scan(body, x, weights) / L per-layer, one jit.

    Median of >=3 samples (timing_spread) like every other bench; the
    per-layer spread is small but the median resists a one-off host stall
    landing in the docs' kernel table."""

    def fn(x, weights):
        out, _ = jax.lax.scan(lambda c, w: (body(c, w), None), x, weights)
        return out

    f = jax.jit(fn)
    dt, _, _ = forward_timing(lambda: f(x, weights), iters)
    return dt / L


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--which", default="a,b,c,a8,c8")
    args = ap.parse_args()

    # parse first: --help must never touch the device (the preflight can
    # legitimately block for VIT_TPU_PREFLIGHT_S on a wedged tunnel)
    from vit_tpu.runtime.profiler import device_preflight

    if not device_preflight():  # bounded: a wedged tunnel must not hang us
        sys.exit("device preflight timed out — wedged TPU tunnel? "
                 "(docs/performance.md)")
    which = set(args.which.split(","))

    b, t, d, f, nh = args.batch, 197, 768, 3072, 12
    rows = b * t
    eps = 1e-6
    ks = jax.random.split(jax.random.key(0), 12)
    x = jax.random.normal(ks[0], (rows, d), jnp.bfloat16)
    s1 = jnp.ones((L, d), jnp.bfloat16)
    b1ln = jnp.zeros((L, d), jnp.bfloat16)
    wqkv = jax.random.normal(ks[1], (L, d, 3 * d), jnp.bfloat16) * 0.03
    bqkv = jnp.zeros((L, 3 * d), jnp.bfloat16)
    wo = jax.random.normal(ks[2], (L, d, d), jnp.bfloat16) * 0.03
    bo = jnp.zeros((L, d), jnp.bfloat16)
    w1 = jax.random.normal(ks[3], (L, d, f), jnp.bfloat16) * 0.03
    b1 = jnp.zeros((L, f), jnp.bfloat16)
    w2 = jax.random.normal(ks[4], (L, f, d), jnp.bfloat16) * 0.03
    b2 = jnp.zeros((L, d), jnp.bfloat16)

    def q(w):
        a = np.asarray(w, np.float32)
        s = np.maximum(np.abs(a).max(1, keepdims=True) / 127.0, 1e-12)
        qv = np.clip(np.round(a / s), -127, 127).astype(np.int8)
        return jnp.asarray(qv), jnp.asarray(s[:, 0].astype(np.float32))

    wqkv_q, wqkv_s = q(wqkv)
    w1_q, w1_s = q(w1)
    w2_q, w2_s = q(w2)

    fl_a = 2 * rows * d * 3 * d + 4 * b * t * t * d
    fl_b = 2 * rows * d * d
    fl_c = 4 * rows * d * f

    if "a" in which:
        dt = timeit_scan(
            lambda c, w: FB.ln_qkv_attn(c, w[0], w[1], w[2], w[3], nh, t, eps),
            x, (s1, b1ln, wqkv, bqkv),
        )
        print(f"A  bf16 ln_qkv_attn:  {dt*1e3:7.3f} ms/layer  {fl_a/dt/1e12:6.1f} TF/s")
    if "a8" in which:
        dt = timeit_scan(
            lambda c, w: QK.ln_qkv_attn_q8(c, w[0], w[1], w[2], w[3], w[4], nh, t, eps),
            x, (s1, b1ln, wqkv_q, wqkv_s, bqkv),
        )
        print(f"A  int8 ln_qkv_attn:  {dt*1e3:7.3f} ms/layer  {fl_a/dt/1e12:6.1f} TF/s")
    if "a8qk" in which:
        dt = timeit_scan(
            lambda c, w: QK.ln_qkv_attn_q8a(
                c, w[0], w[1], w[2], w[3], w[4], nh, t, eps, quant_pv=False
            ),
            x, (s1, b1ln, wqkv_q, wqkv_s, bqkv),
        )
        print(f"A  int8+q8(QK^T):     {dt*1e3:7.3f} ms/layer  {fl_a/dt/1e12:6.1f} TF/s")
    if "a8a" in which:
        dt = timeit_scan(
            lambda c, w: QK.ln_qkv_attn_q8a(
                c, w[0], w[1], w[2], w[3], w[4], nh, t, eps, quant_pv=True
            ),
            x, (s1, b1ln, wqkv_q, wqkv_s, bqkv),
        )
        print(f"A  int8+q8(attn):     {dt*1e3:7.3f} ms/layer  {fl_a/dt/1e12:6.1f} TF/s")
    if "awide" in which:
        # VERDICT r4 item 7: the dh=128 floor-thesis measurement.  Same
        # tensor shapes and FLOPs as kernel A (d=768, packed 3*d columns)
        # but 6 heads x head_dim 128 — the attention dots contract all 128
        # MXU lanes instead of B/16's 64.  One row either confirms the
        # round-3 conclusion ("breaking 26.8 ms means wider heads",
        # docs/performance.md kernel-A floor) or kills it.
        dt = timeit_scan(
            lambda c, w: FB.ln_qkv_attn(c, w[0], w[1], w[2], w[3], 6, t, eps),
            x, (s1, b1ln, wqkv, bqkv),
        )
        print(f"A  bf16 dh=128 (6h):  {dt*1e3:7.3f} ms/layer  {fl_a/dt/1e12:6.1f} TF/s")
    if "b" in which:
        dt = timeit_scan(
            lambda c, w: FB.out_residual(c, c, w[0], w[1]),
            x, (wo, bo),
        )
        print(f"B  bf16 out_residual: {dt*1e3:7.3f} ms/layer  {fl_b/dt/1e12:6.1f} TF/s")
    if "c" in which:
        dt = timeit_scan(
            lambda c, w: FB.ln_mlp_residual(c, w[0], w[1], w[2], w[3], w[4], w[5], eps),
            x, (s1, b1ln, w1, b1, w2, b2),
        )
        print(f"C  bf16 ln_mlp:       {dt*1e3:7.3f} ms/layer  {fl_c/dt/1e12:6.1f} TF/s")
    if "c8" in which:
        dt = timeit_scan(
            lambda c, w: QK.out_ln_mlp_residual_q8(
                c, c, w[0], w[1], w[2], w[3], w[4], w[5], w[6], w[7], w[8],
                w[9], eps
            ),
            x, (wo, bo, s1, b1ln, w1_q, w1_s, b1, w2_q, w2_s, b2),
        )
        print(f"BC int8 merged:       {dt*1e3:7.3f} ms/layer  {(fl_b+fl_c)/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
