#!/usr/bin/env python
"""Scale one model over a device mesh with the library API.

The same ``jax.sharding.Mesh`` code paths a real TPU pod takes, runnable
anywhere on N virtual CPU devices (the reference has no distributed
anything — SURVEY.md §2.3): data parallelism, tensor parallelism through
the fused kernels, pipeline parallelism over the layer stack, and a
data-parallel training step.  Every sharded forward is checked against
the single-device logits.

    python examples/parallel.py --cpu              # 8 virtual devices
    python examples/parallel.py --cpu --devices 4
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual device count (with --cpu)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    # must land before backend init; appending is a no-op once initialized
    if args.cpu and "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    import optax

    from vit_tpu.config import VIT_B_16
    from vit_tpu.io import synth_images, weights as wio
    from vit_tpu.parallel import (
        batch_sharding,
        make_mesh,
        mesh_shape_for,
        replicate,
    )
    from vit_tpu.runtime import InferenceEngine, trainer

    n = min(args.devices, jax.device_count())
    cfg = dataclasses.replace(
        VIT_B_16, depth=2, embed_dim=64, num_heads=4, image_size=32,
        patch_size=16, num_classes=10, name="vit_parallel_example",
    )
    params = wio.params_from_tensors(wio.synth_reference_tensors(cfg, 0), cfg)
    images = synth_images(2 * n, cfg, seed=0)
    worst = 0.0

    # Single-device reference logits every sharded variant must reproduce.
    single = InferenceEngine(cfg, params, dtype="float32", ops="xla")
    want = np.asarray(single.logits(images))

    # 1) Data parallelism: the batch shards over 'dp'; params replicate;
    #    no collectives in the forward at all.
    dp_mesh = make_mesh({"dp": n})
    dp_eng = InferenceEngine(cfg, params, dtype="float32", ops="xla",
                             mesh=dp_mesh)
    dev = float(np.abs(np.asarray(dp_eng.logits(images)) - want).max())
    worst = max(worst, dev)
    print(f"dp={n} (GSPMD):                    max |d| vs single {dev:.2e}")

    # 2) dp x tp: heads / MLP hidden shard over 'tp' inside the fused
    #    Pallas kernels (shard_map, psum epilogues; interpret mode off-TPU).
    if n % 2 == 0:
        mesh = make_mesh(mesh_shape_for(n, tp=2))
        tp_eng = InferenceEngine(cfg, params, dtype="float32", ops="fused",
                                 mesh=mesh)
        dev = float(np.abs(np.asarray(tp_eng.logits(images)) - want).max())
        worst = max(worst, dev)
        print(f"dp={n // 2} x tp=2 (fused kernels):     max |d| vs single {dev:.2e}")

    # 3) Pipeline parallelism: the scan-stacked layer seam splits into
    #    pp stages; microbatches ride a ppermute chain (GPipe).
    if n >= 2:
        from jax.sharding import NamedSharding, PartitionSpec

        from vit_tpu.parallel.pipeline import pp_param_pspecs, shard_forward_pp

        pp_mesh = make_mesh({"pp": 2}, jax.devices()[:2])
        pp_params = jax.device_put(
            params,
            jax.tree.map(
                lambda s: NamedSharding(pp_mesh, s),
                pp_param_pspecs(params),
                is_leaf=lambda x: isinstance(x, PartitionSpec),
            ),
        )
        got = np.asarray(
            jax.jit(shard_forward_pp(cfg, pp_mesh, num_microbatches=2))(
                pp_params, jnp.asarray(images)
            )
        )
        dev = float(np.abs(got - want).max())
        worst = max(worst, dev)
        print(f"pp=2 (GPipe, 2 microbatches):     max |d| vs single {dev:.2e}")

    # 4) Data-parallel training: per-shard grads psum'd over the mesh
    #    inside one jit (what vit-tpu-train --dp wires from flags).
    from vit_tpu.ops.dispatch import get_ops

    optimizer = optax.adamw(1e-3)
    p, o = trainer.init_train_state(jax.random.key(0), cfg, optimizer)
    p = jax.device_put(p, replicate(dp_mesh))
    o = jax.device_put(o, replicate(dp_mesh))
    step = trainer.jit_train_step_dp_shard_map(
        cfg, optimizer, dp_mesh, get_ops("xla"), remat=False
    )
    x = jax.device_put(jnp.asarray(images), batch_sharding(dp_mesh, 4))
    y = jax.device_put(
        jnp.asarray(np.arange(len(images)) % cfg.num_classes, jnp.int32),
        batch_sharding(dp_mesh, 1),
    )
    losses = []
    for _ in range(3):
        p, o, loss = step(p, o, x, y)
        losses.append(float(loss))
    print(f"dp={n} train: loss {losses[0]:.4f} -> {losses[-1]:.4f}")

    # 5) FSDP (ZeRO-3): params, grads, and optimizer state all shard over
    #    'dp' (parallel/sharding.fsdp_param_shardings) — XLA all-gathers
    #    weights just-in-time, reduce-scatters grads.  The per-device bytes
    #    drop ~dp x; the step math is unchanged.
    from vit_tpu.parallel.sharding import fsdp_param_shardings

    p2, o2 = trainer.init_train_state(jax.random.key(0), cfg, optimizer)
    f_sh = fsdp_param_shardings(dp_mesh, p2)
    p2 = jax.device_put(p2, f_sh)
    o2 = jax.device_put(
        o2, trainer._opt_state_shardings(o2, p2, f_sh, dp_mesh)
    )
    fstep = trainer.jit_train_step_for_mesh(
        cfg, optimizer, dp_mesh, p2, o2, remat=False, fsdp=True
    )
    d0 = dp_mesh.devices.flat[0]
    local = sum(
        s.data.nbytes for leaf in jax.tree.leaves(p2)
        for s in leaf.addressable_shards if s.device == d0
    )
    total = sum(leaf.nbytes for leaf in jax.tree.leaves(p2))
    flosses = []
    for _ in range(3):
        p2, o2, loss = fstep(p2, o2, x, y)
        flosses.append(float(loss))
    print(
        f"dp={n} fsdp train: loss {flosses[0]:.4f} -> {flosses[-1]:.4f}  "
        f"(params/device {local / 2**20:.2f} MiB of {total / 2**20:.2f} MiB)"
    )

    ok = (
        worst < 1e-4 and losses[-1] < losses[0] and np.isfinite(losses).all()
        and flosses[-1] < flosses[0] and np.isfinite(flosses).all()
        and local < total
    )
    print("parallel example:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
