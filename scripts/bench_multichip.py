#!/usr/bin/env python
"""Pod benchmark: multi-chip throughput in the BENCH JSON-line format.

This environment exposes ONE real TPU chip, so multi-chip numbers cannot
be measured here — the ICI claims in docs/performance.md stay analytic
until a pod exists.  This script is staged so that the moment one does,
one command produces the artifact (round-2 verdict "what's missing" #2):

    python scripts/bench_multichip.py                 # on a v5e-8 pod

measures BASELINE.json config 5 (ViT-H/14 data-parallel over all chips
with device-staged inputs) plus a dp x tp ViT-B/16 case, printing one
BENCH-format JSON line per config:

    {"metric": "images/sec, vit_h_14 dp=8 batch=256", "value": ...,
     "unit": "images/sec", "per_chip": ..., "mxu_utilization": ..., ...}

CI keeps it honest off-hardware: ``--smoke`` runs the same code on the
8-device virtual CPU mesh with a tiny config (tests/test_variants.py),
so the measurement path cannot rot while waiting for chips.
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_config(name, cfg, mesh_axes, batch, iters, ops, dtype="bfloat16"):
    """-> one BENCH-format dict for `cfg` over a mesh of `mesh_axes`."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.io import synth_images, weights as wio
    from vit_tpu.parallel import make_mesh
    from vit_tpu.runtime import InferenceEngine
    from vit_tpu.runtime.profiler import roofline

    n_chips = 1
    for v in mesh_axes.values():
        n_chips *= v
    mesh = make_mesh(mesh_axes, jax.devices()[:n_chips])
    params = wio.params_from_tensors(wio.synth_reference_tensors(cfg, 0), cfg)
    engine = InferenceEngine(
        cfg, params, dtype=dtype, ops=ops, mesh=mesh, batch_pad=batch
    )
    x, _ = engine._stage(synth_images(batch, cfg, seed=0))

    def timed(n):
        # device-side accumulator + one scalar readback: the only reliable
        # sync on remote backends (docs/performance.md)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = acc + jnp.sum(engine._forward(engine.params, x))
        float(acc)
        return (time.perf_counter() - t0) / n

    timed(2)  # warm (compile incl. the accumulator ops)
    dts = sorted(timed(iters) for _ in range(3))
    dt = dts[1]
    stats = roofline(cfg, batch, dt, chip="v5e",
                     dtype="bf16" if dtype == "bfloat16" else "fp32",
                     n_chips=n_chips)
    mesh_desc = "x".join(f"{k}{v}" for k, v in mesh_axes.items())
    return {
        "metric": f"images/sec, {name} {mesh_desc} batch={batch}",
        "value": round(batch / dt, 2),
        "unit": "images/sec",
        "vs_baseline": round(stats["mxu_utilization"] / 0.50, 4),
        "batch_latency_ms": round(dt * 1e3, 3),
        "batch_latency_ms_spread": [round(dts[0] * 1e3, 3),
                                    round(dts[-1] * 1e3, 3)],
        "images_per_sec_per_chip": round(batch / dt / n_chips, 2),
        "mxu_utilization": round(stats["mxu_utilization"], 4),
        "n_chips": n_chips,
        "mesh": dict(mesh_axes),
        "ops_impl": ops,
        "dtype": dtype,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--per-chip-batch", type=int, default=32,
        help="batch per data-parallel shard (global batch = this x dp; "
        "in the dp x tp case each dp shard spans tp chips)",
    )
    ap.add_argument(
        "--smoke", action="store_true",
        help="CI mode: tiny config on the virtual CPU mesh (no TPU needed)",
    )
    args = ap.parse_args(argv)

    if args.smoke:
        # must land before the first jax import or the virtual mesh is 1-wide
        # (under pytest the conftest has already done this — appending again
        # is a no-op on an initialized backend)
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )

    import jax

    from vit_tpu.config import VIT_B_16, get_config

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    else:
        from vit_tpu.runtime.compile_cache import enable_compilation_cache

        enable_compilation_cache()

    n_dev = jax.device_count()
    if n_dev < 2:
        print(
            json.dumps({
                "error": f"{n_dev} device(s) visible — this benchmark needs "
                "a multi-chip pod; run bench.py for single-chip numbers",
                "awaiting_hardware": True,
            })
        )
        return 1

    if args.smoke:
        tiny = dataclasses.replace(
            VIT_B_16, depth=2, embed_dim=64, num_heads=4, image_size=32,
            patch_size=16, num_classes=11, name="vit_tiny_smoke",
        )
        cases = [
            ("vit_tiny_smoke", tiny, {"dp": min(n_dev, 8)}, "xla", 2),
            ("vit_tiny_smoke", tiny,
             {"dp": min(n_dev, 8) // 2, "tp": 2}, "fused", 2),
        ]
        iters = 2
    else:
        # BASELINE.json config 5: H/14 DP over the pod, plus dp x tp B/16
        # (the kernel-TP path whose ICI profile is otherwise analytic)
        cases = [
            ("vit_h_14", get_config("vit_h_14"), {"dp": n_dev}, "fused",
             args.per_chip_batch),
            ("vit_b_16", get_config("vit_b_16"),
             {"dp": n_dev // 2, "tp": 2}, "fused", args.per_chip_batch),
        ]
        iters = args.iters

    rc = 0
    for name, cfg, mesh_axes, ops, pcb in cases:
        n_chips = 1
        for v in mesh_axes.values():
            n_chips *= v
        batch = pcb * mesh_axes.get("dp", 1)
        try:
            result = bench_config(
                name, cfg, mesh_axes, batch, iters, ops,
                dtype="float32" if args.smoke else "bfloat16",
            )
        except Exception as e:  # report, keep the other configs running
            result = {"metric": f"{name} {mesh_axes}", "error": repr(e)}
            rc = 1
        print(json.dumps(result))
    return rc


if __name__ == "__main__":
    sys.exit(main())
