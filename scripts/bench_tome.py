#!/usr/bin/env python
"""ToMe token-merging throughput on one chip (bf16, kernel path).

The round-3 floor study fixed the bf16 batch-100 headline at ~26.8 ms for
FIXED arithmetic (docs/performance.md); ToMe (ops/tome.py) shrinks T per
layer, so this measures throughput beyond that floor as a function of r.
Run alone (shared chip).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vit_tpu.runtime.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vit_tpu.config import get_config
from vit_tpu.io import synth_images, weights as wio
from vit_tpu.models import tome as tome_model
from vit_tpu.ops import tome
from vit_tpu.runtime.profiler import forward_timing, roofline


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="vit_b_16")
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--r", default="0,8,13",
                    help="comma-separated merge counts per layer "
                    "(r=0..16 measured clean at B/16, L/16, DeiT under "
                    "the chunked schedule — docs/performance.md round 4)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--ops", default="fused", choices=["fused", "quant"],
                    help="'quant' composes ToMe with the W8A8 kernels "
                    "(models/tome.forward_quant) — the two throughput "
                    "levers stack")
    ap.add_argument("--smoke", action="store_true",
                    help="CPU smoke: tiny config, 2 iters (CI gate)")
    args = ap.parse_args(argv)

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    else:
        from vit_tpu.runtime.profiler import device_preflight

        if not device_preflight():
            sys.exit("device preflight timed out — wedged TPU tunnel? "
                     "(docs/performance.md)")

    cfg = get_config(args.config)
    if args.smoke:
        import dataclasses

        # 65 tokens: ABOVE merge_counts' floor so the smoke actually
        # exercises the per-layer merge wiring, not just the 3-kernel path
        cfg = dataclasses.replace(
            cfg, depth=2, embed_dim=64, num_heads=4, image_size=64,
            patch_size=8, name="tome_smoke",
        )
        args.batch, args.iters = 4, 2
    if cfg.distilled:
        # DeiT (dist token + dual heads) has no reference-format synth
        # tensors; random-init works for throughput
        from vit_tpu.models import vit as vit_mod

        params = vit_mod.init_params(jax.random.key(0), cfg)
    else:
        params = wio.params_from_tensors(
            wio.synth_reference_tensors(cfg, 0), cfg
        )
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32 if args.smoke else jnp.bfloat16),
        params,
    )
    fwd_fn = tome_model.forward_fused
    if args.ops == "quant":
        from vit_tpu.ops import quant

        params = quant.quantize_params(params)
        fwd_fn = tome_model.forward_quant
    x = jnp.asarray(synth_images(args.batch, cfg, seed=0),
                    jnp.float32 if args.smoke else jnp.bfloat16)

    jit_kw = {}
    opts = tome_model.fused_compiler_options()
    if opts:
        # without this the 36-kernel unrolled chain hard-faults the TPU
        # worker (models/tome.fused_compiler_options)
        jit_kw["compiler_options"] = opts
    for r in [int(v) for v in args.r.split(",")]:
        fwd = jax.jit(
            lambda p, xx, _r=r: fwd_fn(p, xx, cfg, _r),
            **jit_kw,
        )
        dt, dt_min, dt_max = forward_timing(
            lambda: fwd(params, x), args.iters
        )
        counts = tome_model.schedule(cfg, r)  # the chunked default
        final_t = cfg.seq_len - sum(counts)
        stats = roofline(cfg, args.batch, dt, chip="v5e", dtype="bf16")
        print(
            f"{cfg.name} batch={args.batch} ops={args.ops} r={r:3d} "
            f"(T {cfg.seq_len}->{final_t:3d}): {dt*1e3:7.2f} ms  "
            f"{stats['images_per_sec_per_chip']:8.1f} img/s  "
            f"(spread {args.batch/dt_max:.1f}-{args.batch/dt_min:.1f})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
