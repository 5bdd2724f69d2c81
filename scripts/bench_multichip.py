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

It also measures the parallelism axes whose ICI behavior is otherwise
analytic (docs/performance.md "Ring-attention SP" / pipeline notes):

  - ring-attention sequence parallelism (dp x sp, B/16 @384 — 577 tokens
    riding the K/V ppermute ring, parallel/sequence.py),
  - GPipe pipeline parallelism (pp over the stacked-layer seam with the
    fused megakernels per stage, parallel/pipeline.py),
  - data-parallel *training* (fused_train megakernels + hand-written
    backward kernels under shard_map, grads pmean'd over ICI).

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
    from vit_tpu.io import synth_images, weights as wio
    from vit_tpu.runtime import InferenceEngine

    mesh, n_chips, mesh_desc = _mesh_and_result_stub(mesh_axes, batch)
    params = wio.params_from_tensors(wio.synth_reference_tensors(cfg, 0), cfg)
    engine = InferenceEngine(
        cfg, params, dtype=dtype, ops=ops, mesh=mesh, batch_pad=batch
    )
    x, _ = engine._stage(synth_images(batch, cfg, seed=0))
    return _forward_result(
        f"images/sec, {name} {mesh_desc} batch={batch}", ops,
        cfg, mesh_axes, n_chips, batch, iters, dtype,
        lambda: engine._forward(engine.params, x),
    )


def _mesh_and_result_stub(mesh_axes, batch):
    import jax

    from vit_tpu.parallel import make_mesh

    n_chips = 1
    for v in mesh_axes.values():
        n_chips *= v
    mesh = make_mesh(mesh_axes, jax.devices()[:n_chips])
    mesh_desc = "x".join(f"{k}{v}" for k, v in mesh_axes.items())
    return mesh, n_chips, mesh_desc


def _forward_result(metric, ops_label, cfg, mesh_axes, n_chips, batch,
                    iters, dtype, forward):
    """Time ``forward()`` (one sharded batch -> array) and build the
    BENCH-format dict — the timing recipe is profiler.forward_timing (the
    accumulator + single-readback sync shared with bench.py) and the JSON
    contract is shared by every inference row (engine-backed and
    builder-backed), so a change lands in all rows at once."""
    from vit_tpu.runtime.profiler import forward_timing, roofline

    dt, dt_min, dt_max = forward_timing(forward, iters, warm=2)
    stats = roofline(cfg, batch, dt, chip="v5e",
                     dtype="bf16" if dtype == "bfloat16" else "fp32",
                     n_chips=n_chips)
    return {
        "metric": metric,
        "value": round(batch / dt, 2),
        "unit": "images/sec",
        "vs_baseline": round(stats["mxu_utilization"] / 0.50, 4),
        "batch_latency_ms": round(dt * 1e3, 3),
        "batch_latency_ms_spread": [round(dt_min * 1e3, 3),
                                    round(dt_max * 1e3, 3)],
        "images_per_sec_per_chip": round(batch / dt / n_chips, 2),
        "mxu_utilization": round(stats["mxu_utilization"], 4),
        "n_chips": n_chips,
        "mesh": dict(mesh_axes),
        "ops_impl": ops_label,
        "dtype": dtype,
    }


def bench_forward_fn(name, kind, cfg, mesh_axes, batch, iters, fwd_builder,
                     dtype="bfloat16"):
    """Time a sharded forward built by ``fwd_builder(cfg, mesh, params)``
    -> (jitted_fn, params) — shared by the SP-ring and PP rows."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.io import synth_images, weights as wio

    mesh, n_chips, mesh_desc = _mesh_and_result_stub(mesh_axes, batch)
    params = wio.params_from_tensors(wio.synth_reference_tensors(cfg, 0), cfg)
    if dtype == "bfloat16":
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    fwd, params = fwd_builder(cfg, mesh, params)
    x = jnp.asarray(synth_images(batch, cfg, seed=0))
    return _forward_result(
        f"images/sec, {name} {kind} {mesh_desc} batch={batch}", kind,
        cfg, mesh_axes, n_chips, batch, iters, dtype,
        lambda: fwd(params, x),
    )


def sp_builder(cfg, mesh, params):
    """Ring-attention SP forward (tokens shard over 'sp', K/V blocks ride
    a ppermute ring with online-softmax combine — parallel/sequence.py)."""
    import jax

    from vit_tpu.parallel.sequence import shard_forward_sp

    return jax.jit(shard_forward_sp(cfg, mesh)), params


def pp_builder(num_microbatches, ops_name):
    """GPipe PP forward over the stacked-layer seam (parallel/pipeline.py);
    params re-placed stage-wise via pp_param_pspecs."""

    def build(cfg, mesh, params):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        from vit_tpu.parallel.pipeline import pp_param_pspecs, shard_forward_pp

        params = jax.device_put(
            params,
            jax.tree.map(
                lambda s: NamedSharding(mesh, s),
                pp_param_pspecs(params, mesh.axis_names),
                is_leaf=lambda x: isinstance(x, PartitionSpec),
            ),
        )
        return jax.jit(shard_forward_pp(cfg, mesh, num_microbatches,
                                        ops_name=ops_name)), params

    return build


def bench_train_dp(name, cfg, mesh_axes, batch, iters, ops_name,
                   dtype="bfloat16"):
    """Data-parallel training step (grads pmean'd over ICI under
    shard_map; fused_train = Pallas forward + hand-written backward
    kernels) -> BENCH dict in images/sec."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.parallel import batch_sharding, replicate
    from vit_tpu.runtime import trainer

    mesh, n_chips, mesh_desc = _mesh_and_result_stub(mesh_axes, batch)
    optimizer = optax.adamw(1e-3)
    p, o = trainer.init_train_state(jax.random.key(1), cfg, optimizer)
    p = jax.device_put(p, replicate(mesh))
    o = jax.device_put(o, replicate(mesh))
    step = trainer.jit_train_step_dp_shard_map(
        cfg, optimizer, mesh, get_ops(ops_name),
        remat=(ops_name == "xla"),
        compute_dtype=jnp.bfloat16 if dtype == "bfloat16" else None,
    )
    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(rng.normal(size=(batch, cfg.in_channels, cfg.image_size,
                                     cfg.image_size)), jnp.float32),
        batch_sharding(mesh, 4),
    )
    labels = jax.device_put(
        jnp.asarray(rng.integers(0, cfg.num_classes, batch), jnp.int32),
        batch_sharding(mesh, 1),
    )

    def t_pass(n, p, o):
        t0 = time.perf_counter()
        for _ in range(n):
            p, o, loss = step(p, o, images, labels)
        float(loss)
        return (time.perf_counter() - t0) / n, p, o

    from vit_tpu.runtime.profiler import timing_spread_stateful

    _, p, o = t_pass(1, p, o)  # warm (compile)
    dt, dt_min, dt_max, _ = timing_spread_stateful(t_pass, iters, (p, o))
    return {
        "metric": f"train images/sec, {name} {mesh_desc} batch={batch} "
                  f"{ops_name}",
        "value": round(batch / dt, 2),
        "unit": "images/sec",
        "step_latency_ms": round(dt * 1e3, 3),
        "step_latency_ms_spread": [round(dt_min * 1e3, 3),
                                   round(dt_max * 1e3, 3)],
        "images_per_sec_per_chip": round(batch / dt / n_chips, 2),
        "n_chips": n_chips,
        "mesh": dict(mesh_axes),
        "ops_impl": ops_name,
        "dtype": dtype,
        "train_step": True,
    }


def bench_train_gspmd(name, cfg, mesh_axes, batch, iters, zero1=False,
                      fsdp=False, dtype="bfloat16"):
    """GSPMD training step with optional ZeRO-1 / FSDP placement
    (parallel/sharding.py) -> BENCH dict in images/sec, plus the measured
    per-device param/optimizer HBM bytes the placement actually uses."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vit_tpu.parallel import batch_sharding, param_shardings
    from vit_tpu.parallel.sharding import fsdp_param_shardings
    from vit_tpu.runtime import trainer

    mesh, n_chips, mesh_desc = _mesh_and_result_stub(mesh_axes, batch)
    optimizer = optax.adamw(1e-3)
    p, o = trainer.init_train_state(jax.random.key(1), cfg, optimizer)
    p_sh = fsdp_param_shardings(mesh, p) if fsdp else param_shardings(mesh, p)
    p = jax.device_put(p, p_sh)
    o = jax.device_put(
        o, trainer._opt_state_shardings(o, p, p_sh, mesh, zero1=zero1)
    )
    step = trainer.jit_train_step_for_mesh(
        cfg, optimizer, mesh, p, o, remat=True,
        compute_dtype=jnp.bfloat16 if dtype == "bfloat16" else None,
        zero1=zero1, fsdp=fsdp,
    )
    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(rng.normal(size=(batch, cfg.in_channels, cfg.image_size,
                                     cfg.image_size)), jnp.float32),
        batch_sharding(mesh, 4),
    )
    labels = jax.device_put(
        jnp.asarray(rng.integers(0, cfg.num_classes, batch), jnp.int32),
        batch_sharding(mesh, 1),
    )

    def dev0_bytes(tree):
        d0 = mesh.devices.flat[0]
        return sum(
            s.data.nbytes
            for leaf in jax.tree.leaves(tree)
            for s in leaf.addressable_shards if s.device == d0
        )

    param_b, opt_b = dev0_bytes(p), dev0_bytes(o)

    def t_pass(n, p, o):
        t0 = time.perf_counter()
        for _ in range(n):
            p, o, loss = step(p, o, images, labels)
        float(loss)
        return (time.perf_counter() - t0) / n, p, o

    from vit_tpu.runtime.profiler import timing_spread_stateful

    _, p, o = t_pass(1, p, o)  # warm (compile)
    dt, dt_min, dt_max, _ = timing_spread_stateful(t_pass, iters, (p, o))
    mode = "fsdp" if fsdp else ("zero1" if zero1 else "gspmd")
    return {
        "metric": f"train images/sec, {name} {mesh_desc} batch={batch} "
                  f"xla+{mode}",
        "value": round(batch / dt, 2),
        "unit": "images/sec",
        "step_latency_ms": round(dt * 1e3, 3),
        "step_latency_ms_spread": [round(dt_min * 1e3, 3),
                                   round(dt_max * 1e3, 3)],
        "images_per_sec_per_chip": round(batch / dt / n_chips, 2),
        "per_device_param_mb": round(param_b / 2**20, 2),
        "per_device_opt_state_mb": round(opt_b / 2**20, 2),
        "n_chips": n_chips,
        "mesh": dict(mesh_axes),
        "ops_impl": f"xla+{mode}",
        "dtype": dtype,
        "train_step": True,
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
        from vit_tpu.runtime.profiler import device_preflight

        enable_compilation_cache()
        if not device_preflight():  # bounded: a wedged tunnel must not hang
            print(json.dumps({
                "error": "device preflight timed out — wedged TPU tunnel? "
                         "(docs/performance.md)",
            }))
            return 1

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
        dtype, iters, w = "float32", 2, min(n_dev, 8)
        cases = [
            ("dp-infer", lambda: bench_config(
                "vit_tiny_smoke", tiny, {"dp": w}, 2 * w, iters, "xla",
                dtype=dtype)),
            ("dpxtp-infer", lambda: bench_config(
                "vit_tiny_smoke", tiny, {"dp": w // 2, "tp": 2}, w, iters,
                "fused", dtype=dtype)),
            # sp shards the 5 tokens over 4 chips (padded ring); pp stages
            # the 2-layer stack; the dp train row runs the fused_train
            # megakernels (interpret mode on CPU) exactly as a pod would.
            # dp clamped like the non-smoke sp_dp: with only 2-3 devices
            # visible (backend initialized before the 8-wide flag landed)
            # w // 4 would build a 0-device mesh and fail the smoke on a
            # device-count artifact rather than real rot.
            ("dpxsp-infer", lambda: bench_forward_fn(
                "vit_tiny_smoke", "sp_ring", tiny,
                {"dp": max(w // 4, 1), "sp": min(w, 4)},
                max(w // 2, 1), iters, sp_builder, dtype=dtype)),
            ("pp-infer", lambda: bench_forward_fn(
                "vit_tiny_smoke", "pp", tiny, {"pp": 2}, 4, iters,
                pp_builder(num_microbatches=2, ops_name="xla"),
                dtype=dtype)),
            ("dp-train", lambda: bench_train_dp(
                "vit_tiny_smoke", tiny, {"dp": w}, 2 * w, 1, "fused_train",
                dtype=dtype)),
            ("zero1-train", lambda: bench_train_gspmd(
                "vit_tiny_smoke", tiny, {"dp": w}, 2 * w, 1, zero1=True,
                dtype=dtype)),
            ("fsdp-train", lambda: bench_train_gspmd(
                "vit_tiny_smoke", tiny, {"dp": w}, 2 * w, 1, fsdp=True,
                dtype=dtype)),
        ]
    else:
        # BASELINE.json config 5: H/14 DP over the pod; dp x tp B/16 (the
        # kernel-TP path); then the rows whose ICI profile is otherwise
        # analytic: the @384 ring-SP forward, the fused-kernel pipeline,
        # and data-parallel fused_train (ICI grad all-reduce).
        pcb, iters = args.per_chip_batch, args.iters
        b16, h14 = get_config("vit_b_16"), get_config("vit_h_14")
        b16_384 = get_config("vit_b_16_384")
        sp_dp = max(n_dev // 4, 1)
        cases = [
            ("dp-infer", lambda: bench_config(
                "vit_h_14", h14, {"dp": n_dev}, pcb * n_dev, iters, "fused")),
            ("dpxtp-infer", lambda: bench_config(
                "vit_b_16", b16, {"dp": n_dev // 2, "tp": 2},
                pcb * (n_dev // 2), iters, "fused")),
            ("dpxsp-infer", lambda: bench_forward_fn(
                "vit_b_16_384", "sp_ring", b16_384,
                {"dp": sp_dp, "sp": min(n_dev, 4)}, pcb * sp_dp, iters,
                sp_builder)),
            ("pp-infer", lambda: bench_forward_fn(
                "vit_b_16", "pp", b16, {"pp": min(n_dev, 4)}, 64, iters,
                pp_builder(num_microbatches=8, ops_name="fused"))),
            ("dp-train", lambda: bench_train_dp(
                "vit_b_16", b16, {"dp": n_dev}, 64 * n_dev,
                max(iters // 2, 5), "fused_train")),
            # ZeRO rows on H/14 (632M params): where sharding the fp32 adam
            # moments (5.1 GB replicated) / params actually moves the HBM
            # needle — per_device_*_mb in the output shows the measured cut.
            ("zero1-train", lambda: bench_train_gspmd(
                "vit_h_14", h14, {"dp": n_dev}, 16 * n_dev,
                max(iters // 2, 5), zero1=True)),
            ("fsdp-train", lambda: bench_train_gspmd(
                "vit_h_14", h14, {"dp": n_dev}, 16 * n_dev,
                max(iters // 2, 5), fsdp=True)),
        ]

    rc = 0
    for kind, thunk in cases:
        try:
            result = thunk()
        except Exception as e:  # report, keep the other configs running
            result = {"metric": kind, "error": repr(e)}
            rc = 1
        print(json.dumps(result))
    return rc


if __name__ == "__main__":
    sys.exit(main())
