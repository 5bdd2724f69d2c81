#!/usr/bin/env python
"""On-chip training benchmark for high-resolution configs (round-3 #1).

Measures the fused_train step at ViT-B/16 @384 (577 tokens — megakernel
VJP path) and at @512 (1025 tokens — past VMEM_ATTENTION_MAX_T, the
blockwise flash-attention VJP path), with the xla+remat step at @512 as
the comparison point.  Run alone (shared chip; see docs/performance.md).
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vit_tpu.runtime.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_tpu.config import VIT_B_16, get_config
from vit_tpu.ops.dispatch import get_ops
from vit_tpu.runtime import trainer
from vit_tpu.runtime.profiler import train_step_timing


def bench_step(cfg, batch, ops_name, iters, remat=False):
    optimizer = optax.adamw(1e-3)
    params, opt_state = trainer.init_train_state(
        jax.random.key(1), cfg, optimizer
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(batch, cfg.in_channels, cfg.image_size,
                         cfg.image_size)), jnp.float32
    )
    y = jnp.asarray(rng.integers(0, cfg.num_classes, batch), jnp.int32)
    step = jax.jit(
        trainer.make_train_step(
            cfg, optimizer, get_ops(ops_name), remat=remat,
            compute_dtype=jnp.bfloat16,
        ),
        donate_argnums=(0, 1),
        # Raised-VMEM options only where the backward Pallas kernels need
        # them; the xla comparison row must compile under default settings
        # (same rule as bench_train.py) or the baseline isn't comparable.
        compiler_options=(
            trainer.kernel_backward_compiler_options()
            if ops_name != "xla" else None
        ),
    )

    t0 = time.perf_counter()
    dt, dt_min, dt_max, loss = train_step_timing(
        step, params, opt_state, x, y, iters, warm=2
    )
    print(f"  compile+warm+timed {time.perf_counter() - t0:.1f}s")
    assert np.isfinite(loss), loss
    print(
        f"  {cfg.name} b{batch} {ops_name}{'+remat' if remat else ''}: "
        f"{dt*1e3:7.1f} ms/step  {batch/dt:7.1f} img/s  "
        f"(spread {batch/dt_max:.1f}-{batch/dt_min:.1f})  loss {loss:.4f}"
    )
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    # parse first: --help must never touch the device (the preflight can
    # legitimately block for VIT_TPU_PREFLIGHT_S on a wedged tunnel)
    from vit_tpu.runtime.profiler import device_preflight

    if not device_preflight():  # bounded: a wedged tunnel must not hang us
        sys.exit("device preflight timed out — wedged TPU tunnel? "
                 "(docs/performance.md)")
    print("backend:", jax.default_backend())

    cfg384 = get_config("vit_b_16_384")
    print("ViT-B/16 @384 (577 tokens, megakernel-VJP path):")
    bench_step(cfg384, 32, "fused_train", args.iters)

    cfg512 = dataclasses.replace(
        VIT_B_16, image_size=512, name="vit_b_16_512"
    )
    print("ViT-B/16 @512 (1025 tokens, flash-attention-VJP path):")
    bench_step(cfg512, 16, "fused_train", args.iters)
    if not args.skip_xla:
        print("ViT-B/16 @512 xla+remat comparison:")
        bench_step(cfg512, 16, "xla", args.iters, remat=True)


if __name__ == "__main__":
    main()
