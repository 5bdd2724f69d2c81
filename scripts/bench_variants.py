#!/usr/bin/env python
"""Variant-config throughput on one chip (bf16 fused path).

Refreshes docs/performance.md's variant table; run alone (shared chip).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vit_tpu.runtime.compile_cache import enable_compilation_cache

enable_compilation_cache()

from vit_tpu.config import get_config
from vit_tpu.io import synth_images, weights as wio
from vit_tpu.runtime import InferenceEngine
from vit_tpu.runtime.profiler import forward_timing, roofline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--configs", default="vit_b_16_384:32,vit_l_16:64,vit_h_14:32",
        help="comma list of NAME:BATCH[:OPS] (OPS: fused default, quant "
        "= W8A8 kernels — e.g. vit_b_16_wide:100:quant stacks the "
        "dh=128 lane-occupancy and int8 MXU-rate levers)",
    )
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    # parse first: --help must never touch the device (the preflight can
    # legitimately block for VIT_TPU_PREFLIGHT_S on a wedged tunnel)
    from vit_tpu.runtime.profiler import device_preflight

    if not device_preflight():  # bounded: a wedged tunnel must not hang us
        sys.exit("device preflight timed out — wedged TPU tunnel? "
                 "(docs/performance.md)")

    for spec in args.configs.split(","):
        parts = spec.split(":")
        name, batch = parts[0], int(parts[1])
        ops = parts[2] if len(parts) > 2 else "fused"
        cfg = get_config(name)
        if cfg.distilled:
            # DeiT: the reference tensor layout has no distillation token
            import jax

            from vit_tpu.models import vit

            params = vit.init_params(jax.random.key(0), cfg)
        else:
            params = wio.params_from_tensors(
                wio.synth_reference_tensors(cfg, 0), cfg
            )
        engine = InferenceEngine(cfg, params, dtype="bfloat16", ops=ops,
                                 batch_pad=batch)
        x, _ = engine._stage(synth_images(batch, cfg, seed=0))

        dt, dt_min, dt_max = forward_timing(
            lambda: engine._forward(engine.params, x), args.iters
        )
        stats = roofline(cfg, batch, dt, chip="v5e", dtype="bf16")
        print(
            f"{name} batch={batch} ops={ops}: {dt*1e3:7.2f} ms  "
            f"{stats['images_per_sec_per_chip']:7.1f} img/s  "
            f"(spread {batch/dt_max:.1f}-{batch/dt_min:.1f})  "
            f"{stats['mxu_utilization']*100:4.1f}% MXU"
        )


if __name__ == "__main__":
    main()
