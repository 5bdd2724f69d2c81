"""Training-run construction for the vit-tpu-train CLI.

Everything that happens before the first step: multihost init, mesh
selection, ops/optimizer/params/step construction, resume, the data
stream, and the held-out evaluator.  ``prepare(args)`` returns a
:class:`TrainSetup`; invalid flag combinations raise :class:`SetupError`
(the CLI prints the message and exits 2).  Split out of cli/train.py
(round-3 maintainability task).
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Any, Callable, Optional

import numpy as np


class SetupError(Exception):
    """Invalid flag combination / environment; exit code in ``code``."""

    def __init__(self, message: str, code: int = 2):
        super().__init__(message)
        self.code = code


@dataclasses.dataclass
class TrainSetup:
    """Everything the step loop (cli/train_loop.py) needs."""

    cfg: Any
    mesh: Any
    mesh_axes: dict
    ops_name: str
    step: Callable
    params: Any
    opt_state: Any
    start_step: int
    stream: Optional[Any]  # prefetch iterator, or None for static data
    images: Optional[np.ndarray]  # static data (stream is None)
    labels: Optional[np.ndarray]
    n_static: int  # len(images) after ragged-batch truncation
    run_eval: Optional[Callable]
    ema: Any
    ema_update: Optional[Callable]
    step_needs_rng: bool
    aug_key: Any
    mae_cfg: Any = None  # MAEConfig when --mae (models/mae.py)


def _build_mesh(args, cfg, n_dev, procs):
    import jax

    from vit_tpu.parallel import make_mesh, mesh_shape_for

    if args.sp > 1:
        if args.pp > 1 or args.tp > 1 or args.multihost:
            raise SetupError(
                "error: --sp composes with --dp only (no --pp/--tp/--multihost)"
            )
        if args.optimizer == "fused_adamw":
            raise SetupError("error: --sp supports the plain optax optimizer")
        if args.ops not in ("auto", "xla", "fused_train"):
            raise SetupError(
                "error: --sp requires --ops xla or fused_train (the ring "
                "itself is XLA collectives; fused_train runs each shard's "
                "out_proj/MLP through the split Pallas kernels)"
            )
        if args.ops == "auto":
            args.ops = "xla"
        dp = args.dp or max(n_dev // args.sp, 1)
        mesh_axes = {"dp": dp, "sp": args.sp} if dp > 1 else {"sp": args.sp}
        need = dp * args.sp
        if need > n_dev:
            raise SetupError(
                f"error: mesh {mesh_axes} needs {need} devices, have {n_dev}"
            )
        if args.batch % dp:
            raise SetupError(
                f"error: --batch {args.batch} must be divisible by dp={dp}"
            )
        return make_mesh(mesh_axes, jax.devices()[:need]), mesh_axes
    if args.pp > 1:
        if args.multihost:
            raise SetupError("error: --pp with --multihost is not supported")
        if args.mixed_precision or args.optimizer == "fused_adamw":
            raise SetupError(
                "error: --pp supports the plain optax optimizer at the "
                "params' dtype (no --mixed-precision/--optimizer fused_adamw)"
            )
        dp = args.dp or max(n_dev // (args.pp * args.tp), 1)
        mesh_axes = {"dp": dp, "pp": args.pp}
        if args.tp > 1:
            mesh_axes["tp"] = args.tp
        need = dp * args.pp * args.tp
        if need > n_dev:
            raise SetupError(
                f"error: mesh {mesh_axes} needs {need} devices, have {n_dev}"
            )
        return make_mesh(mesh_axes, jax.devices()[:need]), mesh_axes
    try:
        mesh_axes = mesh_shape_for(
            args.dp * args.tp if args.dp else n_dev, tp=args.tp, dp=args.dp
        )
        mesh = make_mesh(
            mesh_axes, jax.devices()[: mesh_axes["dp"] * mesh_axes["tp"]]
        )
    except ValueError as e:  # keep the module's SetupError/exit-2 contract
        raise SetupError(f"error: {e}") from e
    return mesh, mesh_axes


def _resolve_ops(args, cfg, mesh_axes):
    import jax

    ops_name = args.ops
    if ops_name == "auto":
        if getattr(args, "distill_teacher", None) and args.tp > 1:
            # the kernel-TP train step has no teacher leg; GSPMD xla
            # partitions the separate-head forward over tp
            ops_name = "xla"
        else:
            ops_name = "fused_train" if jax.default_backend() == "tpu" else "xla"
    if args.pp > 1:
        if ops_name not in ("xla", "fused_train"):
            raise SetupError("error: --pp supports --ops xla or fused_train")
        if args.tp > 1 and ops_name != "fused_train":
            raise SetupError(
                "error: --pp with --tp requires --ops fused_train "
                "(the tensor-parallel fused block)"
            )
        if cfg.depth % args.pp:
            raise SetupError(
                f"error: --pp {args.pp} must divide depth {cfg.depth}"
            )
    if args.batch % mesh_axes.get("dp", 1):
        raise SetupError(
            f"error: --batch {args.batch} must be divisible by "
            f"dp={mesh_axes.get('dp', 1)}"
        )
    return ops_name


_DECAY_KEYS = {"kernel", "wqkv", "wo", "w1", "w2"}


def decay_mask(params):
    """True where weight decay applies (the GEMM weights); False for
    LayerNorm scales/biases, every bias, and the cls/pos embeddings —
    the standard ViT recipe (the stacked-blocks layout makes an ndim
    heuristic wrong: stacked biases are 2-D)."""
    import jax

    def rule(path, _leaf):
        last = path[-1]
        key = last.key if hasattr(last, "key") else str(last)
        return key in _DECAY_KEYS

    return jax.tree_util.tree_map_with_path(rule, params)


def _build_optimizer(args, lr):
    import optax

    if args.wd_exempt_norm_bias:
        if args.optimizer == "fused_adamw":
            raise SetupError(
                "error: --wd-exempt-norm-bias requires --optimizer adamw"
            )
        optimizer = optax.adamw(
            lr, weight_decay=args.weight_decay, mask=decay_mask
        )
        print("weight decay: GEMM kernels only (norm/bias/embeddings exempt)")
    else:
        optimizer = optax.adamw(lr, weight_decay=args.weight_decay)
    if args.grad_clip:
        if args.optimizer == "fused_adamw":
            raise SetupError("error: --grad-clip requires --optimizer adamw")
        optimizer = optax.chain(
            optax.clip_by_global_norm(args.grad_clip), optimizer
        )
        print(f"grad-clip: global norm {args.grad_clip}")
    if args.freeze_backbone:
        if args.optimizer == "fused_adamw":
            raise SetupError(
                "error: --freeze-backbone requires --optimizer adamw"
            )

        def _labels(params):
            # NOTE: optax.masked alone would pass RAW GRADS through for
            # frozen leaves (identity, not zero) — multi_transform with
            # set_to_zero is the correct freeze
            import jax as _jax

            return _jax.tree_util.tree_map_with_path(
                # distilled (DeiT) trees: head_dist is averaged into the
                # classifier output (vit.apply_head), so a frozen head_dist
                # would mix 50% frozen-random logits into every prediction
                lambda path, _: (
                    "train" if path[0].key in ("head", "head_dist")
                    else "freeze"
                ),
                params,
            )

        optimizer = optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()}, _labels
        )
        print("freeze-backbone: training the classification head(s) only "
              "(distilled configs train head AND head_dist — apply_head "
              "averages them)")
    if args.skip_nonfinite:
        if args.optimizer == "fused_adamw":
            raise SetupError(
                "error: --skip-nonfinite requires --optimizer adamw"
            )
        optimizer = optax.apply_if_finite(optimizer, max_consecutive_errors=8)
    return optimizer


def _build_step(args, cfg, mesh, mesh_axes, ops_name, ops, optimizer, lr,
                params, opt_state, compute_dtype, remat, augment_fn,
                use_dropout, teacher_fwd=None, mae_cfg=None, forward_fn=None):
    """Place params/opt_state for the chosen parallelism and build the
    jitted train step.  Returns (step, params, opt_state)."""
    import jax
    import jax.numpy as jnp  # noqa: F401  (kept for parity with callers)

    from vit_tpu.parallel import param_shardings, shard_params
    from vit_tpu.runtime import trainer

    zero1 = bool(getattr(args, "zero1", False))
    if zero1 and (args.pp > 1 or args.sp > 1):
        raise SetupError(
            "error: --zero1 composes with dp/tp GSPMD and fused_train "
            "placements only; --pp/--sp own their optimizer placement"
        )
    fsdp = bool(getattr(args, "fsdp", False))
    if fsdp and (args.pp > 1 or args.sp > 1 or ops_name not in ("xla", "qat")):
        raise SetupError(
            "error: --fsdp needs the GSPMD op paths (--ops xla/qat) and "
            "excludes --pp/--sp (the kernel paths and the pp/sp schedules "
            "require whole local weights per device)"
        )
    if zero1 and args.optimizer == "fused_adamw":
        raise SetupError(
            "error: --zero1 with --optimizer fused_adamw would all-gather "
            "the sharded moments around the (unpartitionable) Pallas AdamW "
            "kernel every step, defeating the sharding; use the optax "
            "optimizers with --zero1"
        )

    if mae_cfg is not None:
        # MAE pretraining: no labels — adapt to the loop's
        # (params, opt_state, images, labels, rng) calling convention.
        if ops_name == "fused_train":
            from vit_tpu.parallel import replicate

            params = jax.device_put(params, replicate(mesh))
            zero1_like = (params, opt_state) if zero1 else None
            raw = trainer.jit_mae_step_dp_shard_map(
                cfg, mae_cfg, optimizer, mesh, ops,
                compute_dtype=compute_dtype, zero1_like=zero1_like,
            )
            opt_state = jax.device_put(
                opt_state,
                trainer._opt_state_shardings(
                    opt_state, params,
                    jax.tree.map(lambda _: replicate(mesh), params), mesh,
                    zero1=zero1,
                ) if zero1 else replicate(mesh),
            )
        else:
            params, opt_state = _place_gspmd(
                params, opt_state, mesh, zero1, fsdp
            )
            raw = trainer.jit_mae_step_for_mesh(
                cfg, mae_cfg, optimizer, mesh, params, opt_state, ops=ops,
                compute_dtype=compute_dtype, zero1=zero1, fsdp=fsdp,
            )

        def step(p, o, images, _labels, rng):
            return raw(p, o, images, rng)

        return step, params, opt_state
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
            compute_dtype=compute_dtype, remat=remat, ops_name=ops_name,
        )
        print(f"sequence parallel: ring size {args.sp} (ops {ops_name})")
    elif args.pp > 1:
        # Pipeline (optionally 3D: dp x pp x tp) training over the
        # stacked-layer seam (parallel/pipeline.py).
        from jax.sharding import NamedSharding, PartitionSpec

        from vit_tpu.parallel.pipeline import (
            make_pp_train_step,
            pp_param_pspecs,
        )

        m = args.microbatches or 2 * args.pp
        local_b = args.batch // mesh_axes["dp"]
        if args.batch % mesh_axes["dp"] or local_b % m:
            raise SetupError(
                f"error: dp={mesh_axes['dp']} must divide --batch "
                f"{args.batch}, and --microbatches {m} must divide the "
                f"per-shard batch {local_b}"
            )
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
            label_smoothing=args.label_smoothing, use_dropout=use_dropout,
        )
        print(f"pipeline: {args.pp} stage(s), {m} microbatches")
    elif ops_name == "fused_train" and mesh_axes["tp"] != 1:
        # Tensor-parallel training through the fused kernels: shard_map
        # forward with custom-VJP pallas calls
        # (trainer.jit_train_step_kernel_tp).
        params = shard_params(params, mesh)
        opt_state = jax.device_put(
            opt_state,
            trainer._opt_state_shardings(
                opt_state, params, param_shardings(mesh, params), mesh,
                zero1=zero1,
            ),
        )
        step = trainer.jit_train_step_kernel_tp(
            cfg, optimizer, mesh, params, opt_state,
            remat=remat, compute_dtype=compute_dtype,
            label_smoothing=args.label_smoothing, zero1=zero1,
        )
    elif ops_name == "fused_train":
        # dp-only: params/optimizer replicated, batch over dp, per-shard
        # grads pmean'd under shard_map.
        from vit_tpu.parallel import replicate
        from vit_tpu.runtime import trainer as _tr

        params = jax.device_put(params, replicate(mesh))
        fused_adamw = None
        if args.optimizer == "fused_adamw":
            fused_adamw = {"lr": lr, "weight_decay": args.weight_decay}
            opt_state = _tr.init_fused_adamw_state(params)
        zero1_like = (params, opt_state) if zero1 else None
        opt_state = jax.device_put(
            opt_state,
            trainer._opt_state_shardings(
                opt_state, params,
                jax.tree.map(lambda _: replicate(mesh), params), mesh,
                zero1=True,
            ) if zero1 else replicate(mesh),
        )
        distill = None
        if teacher_fwd is not None:
            distill = dict(
                teacher_fwd=teacher_fwd, alpha=args.distill_alpha,
                hard=not args.distill_soft, tau=args.distill_tau,
            )
        step = trainer.jit_train_step_dp_shard_map(
            cfg, optimizer, mesh, ops,
            remat=remat, compute_dtype=compute_dtype,
            fused_adamw=fused_adamw,
            label_smoothing=args.label_smoothing,
            augment_fn=augment_fn, grad_accum=args.grad_accum,
            use_dropout=use_dropout, forward_fn=forward_fn,
            zero1_like=zero1_like, distill=distill,
        )
    else:
        # GSPMD placement shared by the plain and distillation steps (the
        # frozen teacher rides as a replicated closure constant).
        params, opt_state = _place_gspmd(params, opt_state, mesh, zero1, fsdp)
        if teacher_fwd is not None:
            step = trainer.jit_distill_step_for_mesh(
                cfg, optimizer, mesh, params, opt_state, teacher_fwd,
                ops=ops, remat=remat, compute_dtype=compute_dtype,
                alpha=args.distill_alpha, hard=not args.distill_soft,
                tau=args.distill_tau, label_smoothing=args.label_smoothing,
                zero1=zero1, fsdp=fsdp,
            )
        else:
            step = trainer.jit_train_step_for_mesh(
                cfg, optimizer, mesh, params, opt_state, ops=ops,
                remat=remat, compute_dtype=compute_dtype,
                label_smoothing=args.label_smoothing,
                augment_fn=augment_fn, grad_accum=args.grad_accum,
                use_dropout=use_dropout, forward_fn=forward_fn,
                zero1=zero1, fsdp=fsdp,
            )
    return step, params, opt_state


def _place_gspmd(params, opt_state, mesh, zero1, fsdp):
    """device_put params + optimizer state for the GSPMD train paths:
    TP/replication rules, optionally ZeRO-1 (opt state over dp) or FSDP
    (params AND opt state over dp, parallel/sharding.fsdp_param_shardings)."""
    import jax

    from vit_tpu.parallel import param_shardings
    from vit_tpu.parallel.sharding import fsdp_param_shardings
    from vit_tpu.runtime import trainer

    p_sh = (
        fsdp_param_shardings(mesh, params) if fsdp
        else param_shardings(mesh, params)
    )
    params = jax.device_put(params, p_sh)
    opt_state = jax.device_put(
        opt_state,
        trainer._opt_state_shardings(
            opt_state, params, p_sh, mesh, zero1=zero1 and not fsdp
        ),
    )
    return params, opt_state


def _build_data(args, cfg, mesh, start_step, procs, rng):
    """-> (stream, images, labels): a prefetch stream (others None) or a
    static (images, labels) pair."""
    import jax

    from vit_tpu.io import images as iio
    from vit_tpu.parallel import batch_sharding

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
                args.data_dir, require_labels=True, threads=args.data_threads,
                num_classes=cfg.num_classes,
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
                raise SetupError(
                    f"error: {len(ds.class_names)} class folders > "
                    f"{cfg.num_classes} model classes ({cfg.name})"
                )
            data_desc = (
                f"{len(ds)} raw images in {len(ds.class_names)} class "
                "folders, PIL decoder"
            )
        local_batch = args.batch // procs if args.multihost else args.batch
        if len(ds) < args.batch:
            raise SetupError(
                f"error: {len(ds)} image(s) < --batch {args.batch}; "
                "reduce --batch or provide more data"
            )
        print(f"data: {data_desc}, {args.data_threads} threads")
        img_sh, lab_sh = batch_sharding(mesh, 4), batch_sharding(mesh, 1)
        if args.multihost:
            # every host reads a disjoint slice of the SAME epoch
            # permutation and contributes its rows of ONE global batch
            pid = jax.process_index()

            def _place(item):
                x, y = item
                gx = jax.make_array_from_process_local_data(
                    img_sh, np.ascontiguousarray(x),
                    (args.batch, *x.shape[1:])
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
        return stream, None, None
    if args.input:
        images = iio.load_image_bin(args.input)
        if args.labels:
            labels = np.fromfile(args.labels, dtype="<i4")
            if len(labels) < len(images):
                raise SetupError(
                    f"error: {len(labels)} labels < {len(images)} images "
                    f"in {args.labels}"
                )
            labels = labels[: len(images)]
            if labels.size and (labels.min() < 0
                                or labels.max() >= cfg.num_classes):
                raise SetupError(
                    f"error: labels outside [0, {cfg.num_classes}) in "
                    f"{args.labels} (min {labels.min()}, max "
                    f"{labels.max()})"
                )
        else:
            print(
                "warning: --input given without --labels; pairing real "
                "images with RANDOM labels (smoke-test only — pass "
                "--labels to fine-tune on real data)",
                file=sys.stderr,
            )
            labels = rng.integers(
                0, cfg.num_classes, len(images)
            ).astype(np.int32)
        return None, images, labels
    images = iio.synth_images(args.batch, cfg, seed=args.seed)
    labels = rng.integers(0, cfg.num_classes, args.batch).astype(np.int32)
    return None, images, labels


def _build_eval(args, cfg, mesh):
    """Held-out evaluation: a fixed n_eval-image slice, fp32 oracle
    forward (one compiled program; batch-sized chunks), scored on the EMA
    params when tracked."""
    import jax
    import jax.numpy as jnp

    if not args.eval_every:
        raise SetupError("error: --eval-data-dir requires --eval-every N")
    from vit_tpu.io.dataset import BinShardDataset as _EvalDS
    from vit_tpu.models import vit as vit_mod

    eval_ds = _EvalDS(args.eval_data_dir, require_labels=True,
                      num_classes=cfg.num_classes)
    n_eval = min(len(eval_ds), args.eval_batches * args.batch)
    n_eval -= n_eval % args.batch
    if n_eval == 0:
        raise SetupError(
            f"error: {len(eval_ds)} eval image(s) < --batch {args.batch}"
        )
    eval_x = eval_ds.read(range(n_eval))
    eval_y = eval_ds.labels()[:n_eval]
    eval_fn = jax.jit(vit_mod.logits_fn(cfg))

    multihost = jax.process_count() > 1
    if multihost:
        # params live replicated on the GLOBAL multi-host mesh; a
        # host-local jnp.asarray batch would mix process-local and global
        # arrays inside one jit (incompatible-devices error on a real
        # pod).  Every host reads the same eval slice, so place each
        # batch replicated on the global mesh, mirroring the training
        # stream's placement.
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())

        def _place_eval(x_np):
            return jax.make_array_from_process_local_data(
                rep, np.ascontiguousarray(x_np), x_np.shape
            )
    else:
        def _place_eval(x_np):
            return jnp.asarray(x_np)

    def run_eval(p):
        correct = 0
        for i in range(0, n_eval, args.batch):
            logits = np.asarray(
                eval_fn(p, _place_eval(eval_x[i : i + args.batch]))
            )
            correct += int(
                (logits.argmax(-1) == eval_y[i : i + args.batch]).sum()
            )
        return correct / n_eval

    print(f"eval: {n_eval} held-out images every {args.eval_every} steps")
    return run_eval


def prepare(args) -> TrainSetup:
    import jax
    import jax.numpy as jnp
    import optax

    from vit_tpu.config import get_config
    from vit_tpu.io import checkpoint as ckpt
    from vit_tpu.io.load_any import load_params_any
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
            raise SetupError(
                "error: --multihost requires --data-dir or --image-dir "
                "(each host streams its own shard of the dataset)"
            )
        if args.tp != 1:
            raise SetupError(
                "error: --multihost supports dp only (tp=1): checkpoint "
                "round-trips assume host-replicated params"
            )

    from vit_tpu.cli.common import resolve_compile_cache

    resolve_compile_cache(args)

    cfg = get_config(args.config)
    load_cfg = cfg  # --init-weights loads under the checkpoint's own head
    if args.num_classes:
        cfg = dataclasses.replace(cfg, num_classes=args.num_classes)
    n_dev = jax.device_count()
    procs = jax.process_count()
    if args.multihost:
        print(f"multihost: {procs} host(s), {n_dev} global device(s)")
        if args.batch % procs:
            raise SetupError(
                f"error: global --batch {args.batch} must divide across "
                f"{procs} hosts"
            )
    mesh, mesh_axes = _build_mesh(args, cfg, n_dev, procs)
    print(
        f"mesh: {mesh_axes} over {n_dev} device(s), "
        f"backend={jax.default_backend()}"
    )
    ops_name = _resolve_ops(args, cfg, mesh_axes)

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
        # xla/qat: regularizers in the unfused jnp blocks; fused_train:
        # in-kernel dropout + stochastic depth (the megakernels regenerate
        # the masks in the backward — ops/pallas/trainable.py).  Composes
        # with dp meshes and with --pp pipelines (absolute-layer seeds and
        # drop-path rates shard over 'pp' with the block stack —
        # parallel/pipeline.py); --tp/--sp have no regularized kernels.
        if (ops_name not in ("xla", "qat", "fused_train")
                or args.tp > 1 or args.sp > 1):
            raise SetupError(
                "error: --dropout/--drop-path require --ops xla, qat, or "
                "fused_train on a dp or dp x pp mesh (no --tp/--sp)"
            )
        if args.pp > 1 and ops_name == "qat":
            raise SetupError(
                "error: --dropout/--drop-path with --pp support --ops "
                "xla or fused_train"
            )
        if ops_name == "fused_train" and cfg.seq_len > 1024:
            raise SetupError(
                "error: --dropout/--drop-path through the fused kernels "
                f"support seq_len <= 1024 (got {cfg.seq_len}); use "
                "--ops xla for very long sequences"
            )
        cfg = dataclasses.replace(
            cfg, dropout=args.dropout, drop_path=args.drop_path
        )
        print(f"dropout: {args.dropout}  drop_path: {args.drop_path}")

    tome_forward = None
    if args.tome_chunk is not None and not args.tome:
        # distinguish "--tome absent" from an explicit "--tome 0" so the
        # message doesn't claim a flag the user passed is missing
        raise SetupError(
            "error: --tome-chunk requires --tome > 0"
            if args.tome is not None
            else "error: --tome-chunk requires --tome"
        )
    if args.tome:
        from vit_tpu.models import tome as tome_mod

        if (ops_name not in ("fused_train", "xla")
                or args.pp > 1 or args.tp > 1 or args.sp > 1):
            raise SetupError(
                "error: --tome training requires --ops fused_train or xla "
                "on a dp mesh"
            )
        if args.mae or args.distill_teacher:
            raise SetupError(
                "error: --tome training does not compose with --mae/"
                "--distill-teacher (the merged-token forward has no hooks "
                "for them)"
            )
        chunk = args.tome_chunk
        if chunk is not None and chunk < 1:
            raise SetupError("error: --tome-chunk must be >= 1")
        try:
            counts = tome_mod.schedule(
                cfg, args.tome,
                tome_mod.TRAIN_MERGE_CHUNK if chunk is None else chunk,
            )
        except ValueError as e:
            raise SetupError(f"error: {e}")
        fwd_impl = (
            tome_mod.forward_train if ops_name == "fused_train"
            else tome_mod.forward_xla
        )

        if use_dropout:
            # regularized merged-token training (the ToMe paper's recipe):
            # both impls regenerate bit-identical masks from the rng
            def tome_forward(p, x, rng, _r=args.tome, _f=fwd_impl, _cfg=cfg,
                             _counts=tuple(counts)):
                return _f(p, x, _cfg, _r, counts=list(_counts),
                          dropout_rng=rng)
        else:
            def tome_forward(p, x, _r=args.tome, _f=fwd_impl, _cfg=cfg,
                             _counts=tuple(counts)):
                return _f(p, x, _cfg, _r, counts=list(_counts))

        final_t = cfg.seq_len - sum(counts)
        print(
            f"tome training: r={args.tome} (chunk "
            f"{tome_mod.TRAIN_MERGE_CHUNK if chunk is None else chunk}, "
            f"final {final_t} tokens)"
        )

    mae_cfg = None
    if args.mae:
        from vit_tpu.models import mae as mae_mod

        if (args.distill_teacher or args.augment or args.label_smoothing
                or args.dropout or args.drop_path or args.pp > 1
                or args.sp > 1 or args.grad_accum > 1 or args.num_classes
                or args.freeze_backbone or args.eval_data_dir
                or args.init_weights or args.save_reference
                or args.optimizer == "fused_adamw"):
            raise SetupError(
                "error: --mae is self-supervised pretraining on a dp/tp "
                "mesh — it excludes the label-dependent and layout-"
                "specific flags (--distill-teacher/--augment/--label-"
                "smoothing/--dropout/--drop-path/--pp/--sp/--grad-accum/"
                "--num-classes/--freeze-backbone/--eval-data-dir/"
                "--init-weights/--save-reference/--optimizer fused_adamw); "
                "use --resume for warm starts and --save-backbone + "
                "--init-weights for downstream fine-tuning"
            )
        if ops_name not in ("xla", "fused_train"):
            raise SetupError(
                f"error: --mae supports --ops xla or fused_train "
                f"(got {ops_name})"
            )
        if ops_name == "fused_train" and mesh_axes.get("tp", 1) != 1:
            raise SetupError(
                "error: --mae with --tp>1 requires --ops xla (the MAE "
                "kernel path is dp-only shard_map)"
            )
        try:
            dim, depth, heads = (
                int(v) for v in args.mae_decoder.split(",")
            )
        except ValueError:
            raise SetupError(
                f"error: --mae-decoder must be DIM,DEPTH,HEADS "
                f"(got {args.mae_decoder!r})"
            )
        mae_cfg = mae_mod.MAEConfig(
            mask_ratio=args.mask_ratio, decoder_dim=dim,
            decoder_depth=depth, decoder_heads=heads,
            norm_pix_loss=not args.no_norm_pix,
        )
        try:
            mae_mod.check_config(cfg)
            keep = mae_cfg.len_keep(cfg)
            mae_cfg.decoder_cfg(cfg)
        except ValueError as e:
            raise SetupError(f"error: {e}")
        print(
            f"mae: mask_ratio {args.mask_ratio} ({keep}/{cfg.num_patches} "
            f"patches visible), decoder {dim}x{depth} ({heads} heads), "
            f"norm_pix {not args.no_norm_pix}"
        )
    elif args.save_backbone:
        raise SetupError("error: --save-backbone requires --mae")
    else:
        # the other MAE-only flags would otherwise be silently ignored
        mae_only = [
            name for name, off in (
                ("--mask-ratio", args.mask_ratio == 0.75),
                ("--mae-decoder", args.mae_decoder == "512,8,16"),
                ("--no-norm-pix", not args.no_norm_pix),
            ) if not off
        ]
        if mae_only:
            raise SetupError(
                f"error: {'/'.join(mae_only)} require --mae"
            )

    teacher_fwd = None
    if args.distill_teacher_int8 and not args.distill_teacher:
        raise SetupError(
            "error: --distill-teacher-int8 modifies the teacher path — "
            "pass --distill-teacher WEIGHTS too"
        )
    if args.distill_teacher:
        if not cfg.distilled:
            raise SetupError(
                f"error: --distill-teacher needs a distilled student "
                f"--config (deit_*), got {cfg.name}"
            )
        if ops_name not in ("xla", "qat", "fused_train"):
            raise SetupError(
                "error: --distill-teacher requires --ops xla, qat, or "
                "fused_train"
            )
        if ops_name == "fused_train" and args.tp > 1:
            raise SetupError(
                "error: --distill-teacher with --tp > 1 requires --ops "
                "xla or qat (the kernel-TP train step has no teacher leg); "
                "fused_train distillation runs on a dp mesh"
            )
        if (args.pp > 1 or args.sp > 1 or args.multihost or args.augment
                or args.grad_accum > 1 or args.dropout or args.drop_path):
            raise SetupError(
                "error: --distill-teacher composes with --dp/--tp only "
                "(no --pp/--sp/--multihost/--augment/--grad-accum/--dropout)"
            )
        t_cfg = (
            get_config(args.distill_config) if args.distill_config
            else dataclasses.replace(
                cfg, distilled=False, name=f"{cfg.name}_teacher"
            )
        )
        if t_cfg.num_classes != cfg.num_classes:
            t_cfg = dataclasses.replace(t_cfg, num_classes=cfg.num_classes)
        if t_cfg.image_size != cfg.image_size:
            raise SetupError(
                f"error: teacher config {t_cfg.name} is {t_cfg.image_size}px "
                f"but the student trains at {cfg.image_size}px"
            )
        t_params = load_params_any(
            args.distill_teacher, t_cfg, allow_synth=args.allow_synth_weights
        )
        # npz/Orbax loads skip config validation: a teacher trained with a
        # different head width would otherwise silently clamp its argmax
        # labels into the student's class range (XLA clamps gathers)
        t_classes = int(np.asarray(t_params["head"]["bias"]).shape[0])
        if t_classes != cfg.num_classes:
            raise SetupError(
                f"error: teacher head has {t_classes} classes but the "
                f"student trains {cfg.num_classes} — the distillation "
                "targets must share the student's label space"
            )
        # The teacher leg is frozen inference inside the step jit — on the
        # fused_train path it runs the inference megakernels (measured
        # ~2.1x the xla per-op rate), or opt-in the W8A8 quant kernels
        # (--distill-teacher-int8: another ~2x on the teacher leg, under
        # the int8 path's labels-preserved/looser-logits contract); the
        # GSPMD paths (xla/qat, tp-capable) keep the partitionable jnp
        # forward.  Logit parity between the teacher tables is gated in
        # tests/test_deit.py (1e-4 fused; int8 label-agreement).
        if args.distill_teacher_int8 and ops_name != "fused_train":
            raise SetupError(
                "error: --distill-teacher-int8 requires --ops fused_train "
                "(the W8A8 kernels run under the dp shard_map step)"
            )
        t_tag = ""
        if ops_name == "fused_train" and args.distill_teacher_int8:
            from vit_tpu.ops import quant as _q

            # quantize from full precision FIRST, then cast the
            # non-quantized leaves (engine._prepare_params order)
            t_params = _q.quantize_params(t_params)
            if compute_dtype is not None:
                t_params = _q.cast_quantized_params(t_params, compute_dtype)
            t_ops = get_ops("quant")
            t_tag = " [teacher on W8A8 kernels]"
        else:
            if compute_dtype is not None:
                from vit_tpu.models.vit import cast_params

                t_params = cast_params(t_params, compute_dtype)
            t_ops = get_ops("fused") if ops_name == "fused_train" else None
            if t_ops is not None:
                t_tag = " [teacher on fused kernels]"
        t_params = jax.tree.map(jnp.asarray, t_params)

        from vit_tpu.models import vit as _vit

        def teacher_fwd(x, _p=t_params, _c=t_cfg, _o=t_ops):
            if _o is None:
                return _vit.forward(_p, x, _c)
            return _vit.forward(_p, x, _c, _o)

        mode = (
            f"soft KD (tau={args.distill_tau})" if args.distill_soft
            else "hard (CE vs teacher argmax)"
        )
        print(
            f"distillation: teacher {t_cfg.name} from "
            f"{args.distill_teacher}, alpha={args.distill_alpha}, {mode}"
            + t_tag
        )

    augment_fn = None
    if args.augment or args.grad_accum > 1:
        if args.pp > 1 or args.tp > 1 or args.sp > 1:
            raise SetupError(
                "error: --augment/--grad-accum support the dp paths only "
                "(no --pp/--tp/--sp)"
            )
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
        raise SetupError("error: --save-ema requires --ema-decay")

    if args.schedule == "warmup_cosine":
        # The loop runs args.steps MORE steps from the restored counter
        # (train_loop.py), so a resumed run's schedule horizon must extend
        # past the restored step — with the horizon at a bare args.steps,
        # every resumed step would evaluate past decay end and silently
        # train at lr = end_value = 0.0.
        horizon = args.steps + (ckpt.peek_step(args.resume) if args.resume else 0)
        lr = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, max(horizon // 10, 1), horizon
        )
    else:
        lr = args.lr
    optimizer = _build_optimizer(args, lr)

    if mae_cfg is not None:
        from vit_tpu.models import mae as mae_mod

        params = mae_mod.init_mae_params(
            jax.random.key(args.seed), cfg, mae_cfg
        )
        opt_state = optimizer.init(params)
    elif args.init_weights:
        # transfer learning: load the backbone under its ORIGINAL head
        # size (load_cfg), then swap in a fresh K-way head
        params = load_params_any(
            args.init_weights, load_cfg, allow_synth=args.allow_synth_weights
        )
        params = jax.tree.map(jnp.asarray, params)
        if args.num_classes:
            from vit_tpu.models.vit import init_head as _init_head

            params = dict(params)
            # head-only init: sampling the full ~86M-param model just to
            # keep one (embed_dim x K) leaf wasted startup time and RAM
            params["head"] = _init_head(jax.random.key(args.seed ^ 0x4EAD), cfg)
            if "head_dist" in params:
                # distilled backbone: the distillation head must match the
                # new class count too (apply_head averages the two)
                params["head_dist"] = _init_head(
                    jax.random.key(args.seed ^ 0xD157), cfg
                )
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
        raise SetupError(
            "error: --optimizer fused_adamw requires --ops fused_train "
            "and tp=1"
        )

    step, params, opt_state = _build_step(
        args, cfg, mesh, mesh_axes, ops_name, ops, optimizer, lr, params,
        opt_state, compute_dtype, remat, augment_fn, use_dropout,
        teacher_fwd=teacher_fwd, mae_cfg=mae_cfg, forward_fn=tome_forward,
    )

    start_step = 0
    if args.resume:
        params_r, opt_r, start_step = ckpt.load_train_state(
            args.resume, jax.device_get(opt_state)
        )
        params = jax.device_put(jax.tree.map(jnp.asarray, params_r),
                                jax.tree.map(lambda a: a.sharding, params))
        opt_state = jax.device_put(
            opt_r, jax.tree.map(lambda a: a.sharding, opt_state)
        )
        print(f"resumed from {args.resume} at step {start_step}")

    rng = np.random.default_rng(args.seed)
    stream, images, labels = _build_data(
        args, cfg, mesh, start_step, procs, rng
    )
    try:
        n_static = 0
        if stream is None:
            if len(images) < args.batch:
                raise SetupError(
                    f"error: {len(images)} image(s) < --batch {args.batch}; "
                    "reduce --batch or provide more data"
                )
            n_static = (len(images) // args.batch) * args.batch  # drop ragged
            images, labels = images[:n_static], labels[:n_static]

        run_eval = _build_eval(args, cfg, mesh) if args.eval_data_dir else None

        ema = ema_update = None
        if args.ema_decay:
            from vit_tpu.cli.train_loop import ema_sidecar
            from vit_tpu.io import checkpoint as _ckpt

            ema = jax.tree.map(jnp.copy, params)
            if args.resume and ema_sidecar(args.resume).exists():
                ema_r = _ckpt.load_npz(ema_sidecar(args.resume))
                ema = jax.device_put(jax.tree.map(jnp.asarray, ema_r),
                                     jax.tree.map(lambda a: a.sharding, ema))
                print(f"resumed EMA from {ema_sidecar(args.resume)}")
            ema_update = trainer.make_ema_update(args.ema_decay)
            print(f"ema: decay {args.ema_decay}")
    except BaseException:
        # a SetupError after the stream was built (e.g. bad --eval flags)
        # must not strand the prefetch producer thread
        if stream is not None:
            stream.close()
        raise

    step_needs_rng = augment_fn is not None or use_dropout or args.mae
    aug_key = jax.random.key(args.seed ^ 0xA46) if step_needs_rng else None

    return TrainSetup(
        cfg=cfg, mesh=mesh, mesh_axes=mesh_axes, ops_name=ops_name,
        step=step, params=params, opt_state=opt_state, start_step=start_step,
        stream=stream, images=images, labels=labels, n_static=n_static,
        run_eval=run_eval, ema=ema, ema_update=ema_update,
        step_needs_rng=step_needs_rng, aug_key=aug_key, mae_cfg=mae_cfg,
    )
