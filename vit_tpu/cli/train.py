"""Training driver CLI.

The reference is inference-only; this driver completes the framework: a
sharded (dp x tp) cross-entropy training loop with rematerialization,
running on whatever devices are present (real chips or the virtual CPU
mesh).  Data is an input-100.bin-format batch plus an int32 label file, or
synthetic.

Usage::

    vit-tpu-train --config vit_b_16 --steps 20 --batch 32 --tp 2
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vit-tpu-train")
    p.add_argument("--config", default="vit_b_16")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument(
        "--schedule",
        default="constant",
        choices=["constant", "warmup_cosine"],
        help="learning-rate schedule (warmup = 10%% of steps)",
    )
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    p.add_argument("--dp", type=int, default=None, help="data-parallel size")
    p.add_argument(
        "--pp", type=int, default=1,
        help="pipeline-parallel stages over the layer stack; composes with "
        "--dp/--tp into 3D parallelism (parallel/pipeline.py). Requires "
        "--ops xla (dp x pp) or fused_train (dp x pp x tp)",
    )
    p.add_argument(
        "--microbatches", type=int, default=None,
        help="pipeline microbatches per step (default: 2 x pp)",
    )
    p.add_argument(
        "--sp", type=int, default=1,
        help="sequence-parallel size: tokens shard over an 'sp' ring, "
        "attention runs as ring attention (parallel/sequence.py). Composes "
        "with --dp; requires --ops xla; excludes --pp/--tp",
    )
    p.add_argument("--input", help="input-100.bin-format images (else synthetic)")
    p.add_argument("--labels", help="raw int32 label file matching --input")
    p.add_argument(
        "--data-dir", metavar="DIR",
        help="stream shuffled minibatches from a directory of "
        "input-100.bin-format shards, each with a <stem>.labels.bin int32 "
        "file (io/dataset.py: native threaded gather reads + async "
        "host->HBM prefetch); overrides --input/--labels",
    )
    p.add_argument(
        "--image-dir", metavar="DIR",
        help="train from an ImageNet-style folder-per-class tree of raw "
        "image files (root/<class>/*.jpg, classes = sorted subdir names); "
        "decoded full-frame to the model resolution (train-mode transform "
        "— pair with --augment crop for RandomResizedCrop) and streamed "
        "through the same prefetch pipeline as --data-dir",
    )
    p.add_argument(
        "--data-threads", type=int, default=8,
        help="reader threads for the native gather loader (--data-dir) or "
        "the image decoder pool (--image-dir)",
    )
    p.add_argument("--init-weights", help="warm-start from a Weight_*.bin dir, .npz, .pth, or Orbax checkpoint")
    p.add_argument(
        "--num-classes", type=int, default=None, metavar="K",
        help="transfer learning: fine-tune to K classes — with "
        "--init-weights the pretrained backbone is kept and the "
        "classification head is re-initialized fresh at (D, K)",
    )
    p.add_argument(
        "--freeze-backbone", action="store_true",
        help="linear probe: update only the classification head "
        "(optax.masked over the optimizer); pairs with --init-weights "
        "and --num-classes",
    )
    p.add_argument("--allow-synth-weights", action="store_true")
    p.add_argument("--save", help="save final params to this .npz")
    p.add_argument(
        "--save-reference", metavar="DIR",
        help="export final params as reference-format Weight_{idx}_{name}"
        ".bin files (torchvision layout; loadable by the reference C "
        "engine and by --init-weights)",
    )
    p.add_argument(
        "--save-state", metavar="PATH",
        help="checkpoint the FULL training state (params+optimizer+step) "
        "to this .npz at the end and every --save-every steps",
    )
    p.add_argument(
        "--save-every", type=int, default=0, metavar="N",
        help="with --save-state: also checkpoint every N steps",
    )
    p.add_argument(
        "--resume", metavar="PATH",
        help="resume a --save-state checkpoint (params, optimizer, step)",
    )
    p.add_argument(
        "--grad-clip", type=float, default=0.0, metavar="NORM",
        help="clip gradients to this global L2 norm before the optimizer "
        "(optax.clip_by_global_norm); 1.0 is the usual ViT setting",
    )
    p.add_argument(
        "--skip-nonfinite", action="store_true",
        help="skip optimizer updates when grads are non-finite "
        "(optax.apply_if_finite) instead of aborting on a bad loss",
    )
    p.add_argument(
        "--augment", metavar="LIST", default=None,
        help="comma-separated on-device augmentations applied inside the "
        "jitted train step (runtime/augment.py): any of flip,crop,mixup,"
        "cutmix (e.g. --augment crop,flip,mixup). mixup+cutmix alternate "
        "50/50 per step. Not supported with --pp or --tp>1",
    )
    p.add_argument(
        "--label-smoothing", type=float, default=0.0, metavar="EPS",
        help="label-smoothing epsilon for the cross-entropy loss",
    )
    p.add_argument(
        "--mixup-alpha", type=float, default=0.2,
        help="Beta(a,a) parameter for --augment mixup",
    )
    p.add_argument(
        "--cutmix-alpha", type=float, default=1.0,
        help="Beta(a,a) parameter for --augment cutmix",
    )
    p.add_argument(
        "--grad-accum", type=int, default=1, metavar="K",
        help="accumulate gradients over K scanned microbatches per step "
        "(K x less activation memory, one optimizer update). K must divide "
        "the per-dp-shard batch. Not supported with --pp or --tp>1",
    )
    p.add_argument(
        "--dropout", type=float, default=0.0,
        help="training dropout after the attention/MLP sublayers "
        "(torchvision placement); requires --ops xla",
    )
    p.add_argument(
        "--drop-path", type=float, default=0.0,
        help="stochastic depth: per-sample residual-branch drop, rate "
        "scaled linearly over layers (the standard ViT regularizer); "
        "requires --ops xla",
    )
    p.add_argument(
        "--ema-decay", type=float, default=0.0, metavar="D",
        help="track an exponential moving average of the params "
        "(ema = D*ema + (1-D)*params per step); saved via --save-ema",
    )
    p.add_argument(
        "--save-ema", metavar="PATH",
        help="with --ema-decay: save the EMA params to this .npz at the end",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument(
        "--ops",
        default="auto",
        choices=["auto", "xla", "fused_train", "qat"],
        help="forward path: xla (jnp, GSPMD-shardable), fused_train "
        "(Pallas megakernel forward with custom-VJP backward; dp via "
        "shard_map, tp via the kernel-TP step), or qat (fake-int8 forward "
        "with straight-through backward — trains weights for the int8 "
        "deployment path). auto = fused_train on a TPU backend",
    )
    p.add_argument(
        "--mixed-precision", action="store_true",
        help="bf16 compute with fp32 master weights and optimizer state",
    )
    p.add_argument(
        "--optimizer", default="adamw", choices=["adamw", "fused_adamw"],
        help="adamw (optax) or fused_adamw (in-place Pallas AdamW kernel; "
        "requires --ops fused_train, dp-only)",
    )
    p.add_argument(
        "--no-compile-cache", action="store_true",
        help="disable the persistent XLA compilation cache",
    )
    p.add_argument(
        "--eval-data-dir", metavar="DIR",
        help="held-out labeled .bin shards (same format as --data-dir) "
        "evaluated every --eval-every steps: top-1 on --eval-batches "
        "batches with the current params (the EMA params when --ema-decay "
        "is on), via the fp32 oracle forward",
    )
    p.add_argument(
        "--eval-every", type=int, default=0, metavar="N",
        help="with --eval-data-dir: evaluate every N steps (and at the end)",
    )
    p.add_argument(
        "--eval-batches", type=int, default=4,
        help="batches of --batch images per held-out evaluation",
    )
    p.add_argument(
        "--log-jsonl", metavar="PATH",
        help="append one JSON line per step (step, loss, ms, images/sec) — "
        "machine-readable training metrics",
    )
    p.add_argument(
        "--multihost", action="store_true",
        help="pod mode: initialize jax.distributed and train data-parallel "
        "over every host's devices; --batch is the GLOBAL batch, each host "
        "streams its own disjoint shard of --data-dir (required). Run the "
        "same command on every host",
    )
    p.add_argument("--coordinator", default=None,
                   help="multihost coordinator address (host:port); "
                   "auto-discovered on TPU pods")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from vit_tpu.config import get_config
    from vit_tpu.io import checkpoint as ckpt
    from vit_tpu.io import images as iio
    from vit_tpu.io import weights as wio
    from vit_tpu.io.load_any import load_params_any
    from vit_tpu.parallel import (
        batch_sharding,
        make_mesh,
        mesh_shape_for,
        param_shardings,
        shard_params,
    )
    from vit_tpu.runtime import trainer

    if args.multihost:
        # must run before anything touches the XLA backend
        from vit_tpu.runtime import distributed

        distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        if not (args.data_dir or args.image_dir):
            print("error: --multihost requires --data-dir or --image-dir "
                  "(each host streams its own shard of the dataset)",
                  file=sys.stderr)
            return 2
        if args.tp != 1:
            print("error: --multihost supports dp only (tp=1): checkpoint "
                  "round-trips assume host-replicated params", file=sys.stderr)
            return 2

    if not args.no_compile_cache:
        from vit_tpu.runtime.compile_cache import enable_compilation_cache

        enable_compilation_cache()

    cfg = get_config(args.config)
    load_cfg = cfg  # --init-weights loads under the checkpoint's own head
    if args.num_classes:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, num_classes=args.num_classes)
    n_dev = jax.device_count()
    procs = jax.process_count()
    if args.multihost:
        print(f"multihost: {procs} host(s), {n_dev} global device(s)")
        if args.batch % procs:
            print(f"error: global --batch {args.batch} must divide across "
                  f"{procs} hosts", file=sys.stderr)
            return 2
    if args.sp > 1:
        if args.pp > 1 or args.tp > 1 or args.multihost:
            print("error: --sp composes with --dp only (no --pp/--tp/"
                  "--multihost)", file=sys.stderr)
            return 2
        if args.optimizer == "fused_adamw":
            print("error: --sp supports the plain optax optimizer",
                  file=sys.stderr)
            return 2
        if args.ops not in ("auto", "xla"):
            print("error: --sp requires --ops xla (the ring runs the jnp "
                  "ops)", file=sys.stderr)
            return 2
        args.ops = "xla"
        dp = args.dp or max(n_dev // args.sp, 1)
        mesh_axes = {"dp": dp, "sp": args.sp} if dp > 1 else {"sp": args.sp}
        need = dp * args.sp
        if need > n_dev:
            print(f"error: mesh {mesh_axes} needs {need} devices, have "
                  f"{n_dev}", file=sys.stderr)
            return 2
        if args.batch % dp:
            print(f"error: --batch {args.batch} must be divisible by "
                  f"dp={dp}", file=sys.stderr)
            return 2
        mesh = make_mesh(mesh_axes, jax.devices()[:need])
    elif args.pp > 1:
        if args.multihost:
            print("error: --pp with --multihost is not supported",
                  file=sys.stderr)
            return 2
        if args.mixed_precision or args.optimizer == "fused_adamw":
            print("error: --pp supports the plain optax optimizer at the "
                  "params' dtype (no --mixed-precision/--optimizer "
                  "fused_adamw)", file=sys.stderr)
            return 2
        dp = args.dp or max(n_dev // (args.pp * args.tp), 1)
        mesh_axes = {"dp": dp, "pp": args.pp}
        if args.tp > 1:
            mesh_axes["tp"] = args.tp
        need = dp * args.pp * args.tp
        if need > n_dev:
            print(f"error: mesh {mesh_axes} needs {need} devices, have "
                  f"{n_dev}", file=sys.stderr)
            return 2
        mesh = make_mesh(mesh_axes, jax.devices()[:need])
    else:
        mesh_axes = mesh_shape_for(
            args.dp * args.tp if args.dp else n_dev, tp=args.tp, dp=args.dp
        )
        mesh = make_mesh(
            mesh_axes, jax.devices()[: mesh_axes["dp"] * mesh_axes["tp"]]
        )
    print(f"mesh: {mesh_axes} over {n_dev} device(s), backend={jax.default_backend()}")

    ops_name = args.ops
    if ops_name == "auto":
        ops_name = "fused_train" if jax.default_backend() == "tpu" else "xla"
    if args.pp > 1:
        if ops_name not in ("xla", "fused_train"):
            print("error: --pp supports --ops xla or fused_train",
                  file=sys.stderr)
            return 2
        if args.tp > 1 and ops_name != "fused_train":
            print("error: --pp with --tp requires --ops fused_train "
                  "(the tensor-parallel fused block)", file=sys.stderr)
            return 2
        if cfg.depth % args.pp:
            print(f"error: --pp {args.pp} must divide depth {cfg.depth}",
                  file=sys.stderr)
            return 2
    if args.batch % mesh_axes.get("dp", 1):
        print(f"error: --batch {args.batch} must be divisible by "
              f"dp={mesh_axes.get('dp', 1)}", file=sys.stderr)
        return 2
    from vit_tpu.ops.dispatch import get_ops

    ops = get_ops(ops_name)
    compute_dtype = jnp.bfloat16 if args.mixed_precision else None
    # fused_train's hand-written backward kernels already recompute their
    # intermediates in VMEM; jax.checkpoint on top would redo the whole
    # forward a second time (~+24% measured, docs/performance.md)
    remat = not args.no_remat and ops_name != "fused_train"
    print(
        f"ops: {ops_name}  mixed_precision: {bool(args.mixed_precision)}  "
        f"remat: {remat}"
    )

    use_dropout = bool(args.dropout or args.drop_path)
    if use_dropout:
        if (ops_name not in ("xla", "qat") or args.pp > 1 or args.tp > 1
                or args.sp > 1):
            print("error: --dropout/--drop-path require --ops xla or qat "
                  "on a dp mesh (the regularizers run in the unfused "
                  "blocks)", file=sys.stderr)
            return 2
        import dataclasses

        cfg = dataclasses.replace(
            cfg, dropout=args.dropout, drop_path=args.drop_path
        )
        print(f"dropout: {args.dropout}  drop_path: {args.drop_path}")

    augment_fn = None
    if args.augment or args.grad_accum > 1:
        if args.pp > 1 or args.tp > 1 or args.sp > 1:
            print("error: --augment/--grad-accum support the dp paths only "
                  "(no --pp/--tp/--sp)", file=sys.stderr)
            return 2
    if args.augment:
        from vit_tpu.runtime.augment import make_augment_fn

        augment_fn = make_augment_fn(
            [a.strip() for a in args.augment.split(",") if a.strip()],
            cfg.num_classes,
            label_smoothing=args.label_smoothing,
            mixup_alpha=args.mixup_alpha,
            cutmix_alpha=args.cutmix_alpha,
        )
        print(f"augment: {args.augment} (on-device, inside the step jit)")
    if args.grad_accum > 1:
        print(f"grad-accum: {args.grad_accum} microbatches/step")
    if args.save_ema and not args.ema_decay:
        print("error: --save-ema requires --ema-decay", file=sys.stderr)
        return 2

    if args.schedule == "warmup_cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, max(args.steps // 10, 1), args.steps
        )
    else:
        lr = args.lr
    optimizer = optax.adamw(lr, weight_decay=args.weight_decay)
    if args.grad_clip:
        if args.optimizer == "fused_adamw":
            print("error: --grad-clip requires --optimizer adamw",
                  file=sys.stderr)
            return 2
        optimizer = optax.chain(
            optax.clip_by_global_norm(args.grad_clip), optimizer
        )
        print(f"grad-clip: global norm {args.grad_clip}")
    if args.freeze_backbone:
        if args.optimizer == "fused_adamw":
            print("error: --freeze-backbone requires --optimizer adamw",
                  file=sys.stderr)
            return 2

        def _labels(params):
            # NOTE: optax.masked alone would pass RAW GRADS through for
            # frozen leaves (identity, not zero) — multi_transform with
            # set_to_zero is the correct freeze
            import jax as _jax

            return _jax.tree_util.tree_map_with_path(
                lambda path, _: (
                    "train" if path[0].key == "head" else "freeze"
                ),
                params,
            )

        optimizer = optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()}, _labels
        )
        print("freeze-backbone: training the classification head only")
    if args.skip_nonfinite:
        if args.optimizer == "fused_adamw":
            print("error: --skip-nonfinite requires --optimizer adamw",
                  file=sys.stderr)
            return 2
        optimizer = optax.apply_if_finite(optimizer, max_consecutive_errors=8)
    if args.init_weights:
        # transfer learning: load the backbone under its ORIGINAL head
        # size (load_cfg), then swap in a fresh K-way head
        params = load_params_any(
            args.init_weights, load_cfg, allow_synth=args.allow_synth_weights
        )
        params = jax.tree.map(jnp.asarray, params)
        if args.num_classes:
            from vit_tpu.models.vit import init_params as _init

            fresh = _init(jax.random.key(args.seed ^ 0x4EAD), cfg)
            params = dict(params)
            params["head"] = fresh["head"]
            print(f"transfer learning: fresh {cfg.embed_dim} x "
                  f"{args.num_classes} head over the pretrained backbone")
        opt_state = optimizer.init(params)
    else:
        params, opt_state = trainer.init_train_state(
            jax.random.key(args.seed), cfg, optimizer
        )
    if args.optimizer == "fused_adamw" and (
        ops_name != "fused_train" or mesh_axes.get("tp", 1) != 1
    ):
        print(
            "error: --optimizer fused_adamw requires --ops fused_train "
            "and tp=1",
            file=sys.stderr,
        )
        return 2
    if args.sp > 1:
        # Sequence-parallel training: tokens over the 'sp' ring, grads
        # through the transposed ppermute hops (parallel/sequence.py).
        from jax.sharding import NamedSharding, PartitionSpec

        from vit_tpu.parallel.sequence import make_sp_train_step

        params = jax.device_put(params, NamedSharding(mesh, PartitionSpec()))
        opt_state = jax.device_put(
            opt_state, NamedSharding(mesh, PartitionSpec())
        )
        step = make_sp_train_step(
            cfg, optimizer, mesh, label_smoothing=args.label_smoothing,
            compute_dtype=compute_dtype, remat=remat,
        )
        print(f"sequence parallel: ring size {args.sp}")
    elif args.pp > 1:
        # Pipeline (optionally 3D: dp x pp x tp) training over the
        # stacked-layer seam (parallel/pipeline.py).
        from jax.sharding import NamedSharding, PartitionSpec

        from vit_tpu.parallel.pipeline import make_pp_train_step, pp_param_pspecs

        m = args.microbatches or 2 * args.pp
        local_b = args.batch // mesh_axes["dp"]
        if args.batch % mesh_axes["dp"] or local_b % m:
            print(
                f"error: --batch {args.batch} must divide dp="
                f"{mesh_axes['dp']} and the per-shard batch {local_b} must "
                f"divide --microbatches {m}",
                file=sys.stderr,
            )
            return 2
        params = jax.device_put(
            params,
            jax.tree.map(
                lambda s: NamedSharding(mesh, s),
                pp_param_pspecs(params, mesh.axis_names),
                is_leaf=lambda x: isinstance(x, PartitionSpec),
            ),
        )
        opt_state = optimizer.init(params)  # inherits the pp placement
        step = make_pp_train_step(
            cfg, optimizer, mesh, num_microbatches=m, ops_name=ops_name,
            label_smoothing=args.label_smoothing,
        )
        print(f"pipeline: {args.pp} stage(s), {m} microbatches")
    elif ops_name == "fused_train" and mesh_axes["tp"] != 1:
        # Tensor-parallel training through the fused kernels: shard_map
        # forward with custom-VJP pallas calls (trainer.jit_train_step_kernel_tp).
        params = shard_params(params, mesh)
        opt_state = jax.device_put(
            opt_state,
            trainer._opt_state_shardings(
                opt_state, params, param_shardings(mesh, params), mesh
            ),
        )
        step = trainer.jit_train_step_kernel_tp(
            cfg, optimizer, mesh, params, opt_state,
            remat=remat, compute_dtype=compute_dtype,
            label_smoothing=args.label_smoothing,
        )
    elif ops_name == "fused_train":
        # dp-only: params/optimizer replicated, batch over dp, per-shard
        # grads pmean'd under shard_map.
        from vit_tpu.parallel import replicate

        params = jax.device_put(params, replicate(mesh))
        fused_adamw = None
        if args.optimizer == "fused_adamw":
            fused_adamw = {"lr": lr, "weight_decay": args.weight_decay}
            opt_state = trainer.init_fused_adamw_state(params)
        opt_state = jax.device_put(opt_state, replicate(mesh))
        step = trainer.jit_train_step_dp_shard_map(
            cfg, optimizer, mesh, ops,
            remat=remat, compute_dtype=compute_dtype,
            fused_adamw=fused_adamw,
            label_smoothing=args.label_smoothing,
            augment_fn=augment_fn, grad_accum=args.grad_accum,
        )
    else:
        params = shard_params(params, mesh)
        opt_state = jax.device_put(
            opt_state,
            trainer._opt_state_shardings(
                opt_state, params, param_shardings(mesh, params), mesh
            ),
        )
        step = trainer.jit_train_step_for_mesh(
            cfg, optimizer, mesh, params, opt_state, ops=ops,
            remat=remat, compute_dtype=compute_dtype,
            label_smoothing=args.label_smoothing,
            augment_fn=augment_fn, grad_accum=args.grad_accum,
            use_dropout=use_dropout,
        )

    start_step = 0
    if args.resume:
        params_r, opt_r, start_step = ckpt.load_train_state(
            args.resume, jax.device_get(opt_state)
        )
        params = jax.device_put(jax.tree.map(jnp.asarray, params_r),
                                jax.tree.map(lambda a: a.sharding, params))
        opt_state = jax.device_put(opt_r,
                                   jax.tree.map(lambda a: a.sharding, opt_state))
        print(f"resumed from {args.resume} at step {start_step}")

    rng = np.random.default_rng(args.seed)
    stream = None
    if args.data_dir or args.image_dir:
        # Streaming pipeline: shard-indexed dataset (native threaded gather
        # reads) or raw-image folder (threaded decode + preprocessing),
        # shuffled per epoch, double-buffered host->HBM prefetch so host IO
        # and transfer overlap device compute.
        from vit_tpu.io import native
        from vit_tpu.io.dataset import BinShardDataset, ImageFolderDataset
        from vit_tpu.runtime.prefetch import prefetch_to_device

        if args.data_dir:
            ds = BinShardDataset(
                args.data_dir, require_labels=True, threads=args.data_threads
            )
            data_desc = (
                f"{len(ds)} images in {len(ds.paths)} shard(s), "
                f"{'native' if native.gather_available() else 'numpy'} reader"
            )
        else:
            # mode='train': keep the full frame on host (no center crop) so
            # the on-device RandomResizedCrop samples from the whole image
            ds = ImageFolderDataset(
                args.image_dir, cfg.image_size, threads=args.data_threads,
                mode="train",
            )
            if len(ds.class_names) > cfg.num_classes:
                print(
                    f"error: {len(ds.class_names)} class folders > "
                    f"{cfg.num_classes} model classes ({cfg.name})",
                    file=sys.stderr,
                )
                return 2
            data_desc = (
                f"{len(ds)} raw images in {len(ds.class_names)} class "
                "folders, PIL decoder"
            )
        local_batch = args.batch // procs if args.multihost else args.batch
        if len(ds) < args.batch:
            print(
                f"error: {len(ds)} image(s) < --batch {args.batch}; "
                "reduce --batch or provide more data",
                file=sys.stderr,
            )
            return 2
        print(
            f"data: {data_desc}, "
            f"{args.data_threads} threads"
        )
        img_sh, lab_sh = batch_sharding(mesh, 4), batch_sharding(mesh, 1)
        if args.multihost:
            # every host reads a disjoint slice of the SAME epoch
            # permutation and contributes its rows of ONE global batch
            pid = jax.process_index()

            def _place(item):
                x, y = item
                gx = jax.make_array_from_process_local_data(
                    img_sh, np.ascontiguousarray(x), (args.batch, *x.shape[1:])
                )
                gy = jax.make_array_from_process_local_data(
                    lab_sh, np.ascontiguousarray(y), (args.batch,)
                )
                return gx, gy

            stream = prefetch_to_device(
                ds.batches(local_batch, shuffle=True, seed=args.seed,
                           shard=(pid, procs), skip_batches=start_step),
                size=2,
                place=_place,
            )
        else:
            stream = prefetch_to_device(
                ds.batches(local_batch, shuffle=True, seed=args.seed,
                           skip_batches=start_step),
                size=2,
                sharding=(img_sh, lab_sh),
            )
    elif args.input:
        images = iio.load_image_bin(args.input)
        if args.labels:
            labels = np.fromfile(args.labels, dtype="<i4")
            if len(labels) < len(images):
                print(f"error: {len(labels)} labels < {len(images)} images "
                      f"in {args.labels}", file=sys.stderr)
                return 2
            labels = labels[: len(images)]
            if labels.size and (labels.min() < 0
                                or labels.max() >= cfg.num_classes):
                print(f"error: labels outside [0, {cfg.num_classes}) in "
                      f"{args.labels} (min {labels.min()}, max "
                      f"{labels.max()})", file=sys.stderr)
                return 2
        else:
            print(
                "warning: --input given without --labels; pairing real images "
                "with RANDOM labels (smoke-test only — pass --labels to "
                "fine-tune on real data)",
                file=sys.stderr,
            )
            labels = rng.integers(0, cfg.num_classes, len(images)).astype(np.int32)
    else:
        images = iio.synth_images(args.batch, cfg, seed=args.seed)
        labels = rng.integers(0, cfg.num_classes, args.batch).astype(np.int32)

    if stream is None:
        if len(images) < args.batch:
            print(
                f"error: {len(images)} image(s) < --batch {args.batch}; "
                "reduce --batch or provide more data",
                file=sys.stderr,
            )
            return 2
        n = (len(images) // args.batch) * args.batch  # drop ragged remainder
        images, labels = images[:n], labels[:n]

    run_eval = None
    if args.eval_data_dir:
        # Held-out evaluation: a fixed n_eval-image slice, fp32 oracle
        # forward (one compiled program; batch-sized chunks), scored on
        # the EMA params when tracked.
        if not args.eval_every:
            print("error: --eval-data-dir requires --eval-every N",
                  file=sys.stderr)
            return 2
        from vit_tpu.io.dataset import BinShardDataset as _EvalDS
        from vit_tpu.models import vit as vit_mod

        eval_ds = _EvalDS(args.eval_data_dir, require_labels=True)
        n_eval = min(len(eval_ds), args.eval_batches * args.batch)
        n_eval -= n_eval % args.batch
        if n_eval == 0:
            print(f"error: {len(eval_ds)} eval image(s) < --batch "
                  f"{args.batch}", file=sys.stderr)
            return 2
        eval_x = eval_ds.read(range(n_eval))
        eval_y = eval_ds.labels()[:n_eval]
        eval_fn = jax.jit(vit_mod.logits_fn(cfg))

        def run_eval(p):
            correct = 0
            for i in range(0, n_eval, args.batch):
                logits = np.asarray(
                    eval_fn(p, jnp.asarray(eval_x[i : i + args.batch]))
                )
                correct += int(
                    (logits.argmax(-1) == eval_y[i : i + args.batch]).sum()
                )
            return correct / n_eval

        print(f"eval: {n_eval} held-out images every {args.eval_every} "
              "steps")

    def _ema_sidecar(state_path):
        from pathlib import Path

        return Path(state_path).with_suffix(".ema.npz")

    def save_state(s):
        if jax.process_index() != 0:
            return  # params are host-replicated; one writer suffices
        ckpt.save_train_state(
            jax.device_get(params), jax.device_get(opt_state), s,
            args.save_state,
        )
        if ema is not None:
            # the EMA is part of the training state: without it a resume
            # would restart the average from the current params
            ckpt.save_npz(jax.device_get(ema), _ema_sidecar(args.save_state))
        print(f"saved training state (step {s}) to {args.save_state}")

    ema = ema_update = None
    if args.ema_decay:
        ema = jax.tree.map(jnp.copy, params)
        if args.resume and _ema_sidecar(args.resume).exists():
            ema_r = ckpt.load_npz(_ema_sidecar(args.resume))
            ema = jax.device_put(jax.tree.map(jnp.asarray, ema_r),
                                 jax.tree.map(lambda a: a.sharding, ema))
            print(f"resumed EMA from {_ema_sidecar(args.resume)}")
        ema_update = trainer.make_ema_update(args.ema_decay)
        print(f"ema: decay {args.ema_decay}")

    step_needs_rng = augment_fn is not None or use_dropout
    aug_key = jax.random.key(args.seed ^ 0xA46) if step_needs_rng else None

    # Preemption safety: TPU VMs get SIGTERM on eviction; checkpoint the
    # full training state and exit cleanly so --resume continues the run.
    import signal

    preempted = {"flag": False}

    def _on_term(signum, frame):
        preempted["flag"] = True

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_term)
    except ValueError:  # not the main thread (embedded use) — skip
        prev_handler = None

    last_step = start_step
    for s in range(start_step, start_step + args.steps):
        if stream is not None:
            xb, yb = next(stream)
        else:
            i0 = (s * args.batch) % max(n - args.batch + 1, 1)
            xb = jax.device_put(
                jnp.asarray(images[i0 : i0 + args.batch]), batch_sharding(mesh, 4)
            )
            yb = jax.device_put(
                jnp.asarray(labels[i0 : i0 + args.batch]), batch_sharding(mesh, 1)
            )
        t0 = time.perf_counter()
        if step_needs_rng:
            params, opt_state, loss = step(
                params, opt_state, xb, yb, jax.random.fold_in(aug_key, s)
            )
        else:
            params, opt_state, loss = step(params, opt_state, xb, yb)
        if ema_update is not None:
            ema = ema_update(ema, params)
        loss = float(loss)
        dt = time.perf_counter() - t0
        print(f"step {s:4d}  loss {loss:.4f}  {dt:.2f}s")
        if args.log_jsonl and jax.process_index() == 0:
            import json

            with open(args.log_jsonl, "a") as fh:
                fh.write(json.dumps({
                    "step": s, "loss": round(loss, 6),
                    "ms": round(dt * 1e3, 2),
                    "images_per_sec": round(args.batch / dt, 2),
                }) + "\n")
        if not np.isfinite(loss):
            if args.skip_nonfinite:
                print(f"step {s}: non-finite loss; update skipped", file=sys.stderr)
            else:
                print("non-finite loss; aborting", file=sys.stderr)
                if stream is not None:
                    stream.close()  # don't strand the prefetch thread
                return 1
        if run_eval is not None and (s + 1) % args.eval_every == 0:
            acc = run_eval(ema if ema is not None else params)
            which = "ema" if ema is not None else "params"
            print(f"step {s:4d}  eval top-1 {acc:.4f} ({which})")
            if args.log_jsonl and jax.process_index() == 0:
                import json

                with open(args.log_jsonl, "a") as fh:
                    fh.write(json.dumps(
                        {"step": s, "eval_top1": round(acc, 6)}
                    ) + "\n")
        if args.save_state and args.save_every and (s + 1) % args.save_every == 0:
            save_state(s + 1)
        last_step = s + 1
        if preempted["flag"]:
            if args.save_state:
                print(
                    f"SIGTERM: checkpointing at step {last_step} and "
                    "exiting (resume with --resume)", file=sys.stderr,
                )
            else:
                print(
                    f"SIGTERM: exiting at step {last_step} (no --save-state"
                    " given; nothing checkpointed)", file=sys.stderr,
                )
            break

    if prev_handler is not None:
        signal.signal(signal.SIGTERM, prev_handler)
    if stream is not None:
        stream.close()  # stop the prefetch producer thread
    if args.save_state:
        save_state(last_step)
    if args.save and jax.process_index() == 0:
        ckpt.save_npz(jax.device_get(params), args.save)
        print(f"saved params to {args.save}")
    if args.save_ema and ema is not None and jax.process_index() == 0:
        ckpt.save_npz(jax.device_get(ema), args.save_ema)
        print(f"saved EMA params to {args.save_ema}")
    if args.save_reference and jax.process_index() == 0:
        wio.save_reference_weights(
            wio.tensors_from_params(jax.device_get(params), cfg),
            args.save_reference, cfg,
        )
        print(f"exported reference-format weights to {args.save_reference}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
