#!/usr/bin/env python
"""On-chip train-step benchmark + backward-kernel parity (VERDICT r1 #2).

Compares the kernel-VJP fused_train step against the round-1 recompute-VJP
and the xla path at ViT-B/16 batch-64 bf16 adamw; verifies compiled-mode
grads against the jnp autodiff on a small fp32 batch first.

Run alone (the chip is shared; see docs/performance.md pitfalls).
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
import optax

from vit_tpu.config import get_config
from vit_tpu.models import vit
from vit_tpu.ops.dispatch import get_ops
from vit_tpu.runtime import trainer
from vit_tpu.runtime.profiler import train_step_timing


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="vit_b_16",
                    help="model config name (vit_b_16, vit_l_16, vit_h_14, "
                    "...); reproduces the family timings in "
                    "docs/performance.md, e.g. --config vit_l_16 --batch 16 "
                    "--paths fused_train")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--paths", default="fused_train,xla",
                    help="comma list: fused_train / xla / qat "
                    "(+'+fadamw' suffix for the in-place AdamW kernel); "
                    "'reg' = fused_train + in-kernel dropout 0.1 + "
                    "drop-path 0.1 (regularizer overhead); 'mae' = MAE "
                    "pretraining step (mask 0.75, paper decoder) on the "
                    "fused kernels; 'tome:R[:CHUNK]' = train-time ToMe at "
                    "r=R (optional merge-schedule chunk override; default "
                    "models/tome.TRAIN_MERGE_CHUNK=2 — the measured "
                    "fwd+bwd-chain envelope; 3 and 6 hard-fault); "
                    "'tome_reg:R[:CHUNK]' = ToMe + dropout 0.1 + "
                    "drop-path 0.1 (the ToMe paper's recipe through the "
                    "regularized split kernels); 'tome_dp:R[:CHUNK]' = "
                    "ToMe + drop-path 0.1 only (clean kernels + "
                    "stochastic-depth lerp); 'tome_xla:R[:CHUNK]' / "
                    "'tome_xla_reg:R[:CHUNK]' = the same merged-token "
                    "step at the xla tier (pure jnp forward_xla - no "
                    "Pallas, runs where the kernel tier's backend "
                    "envelope faults); "
                    "'distill[:xla|:fused|"
                    ":int8]' = DeiT-B student on fused_train with the "
                    "frozen teacher on the named table (the teacher-leg "
                    "step-time delta)")
    args = ap.parse_args()

    # parse first: --help must never touch the device (the preflight can
    # legitimately block for VIT_TPU_PREFLIGHT_S on a wedged tunnel)
    from vit_tpu.runtime.profiler import device_preflight

    if not device_preflight():  # bounded: a wedged tunnel must not hang us
        sys.exit("device preflight timed out — wedged TPU tunnel? "
                 "(docs/performance.md)")

    cfg = get_config(args.config)
    print("backend:", jax.default_backend(), " config:", cfg.name)

    rng = np.random.default_rng(0)
    if not args.skip_parity:
        # compiled-mode grad parity, fp32, small batch
        params = vit.init_params(jax.random.key(0), cfg, jnp.float32)
        imgs = jnp.asarray(
            rng.normal(size=(4, cfg.in_channels, cfg.image_size, cfg.image_size)),
            jnp.float32,
        )
        labels = jnp.asarray(rng.integers(0, cfg.num_classes, 4), jnp.int32)

        def loss(ops_name):
            ops = get_ops(ops_name)
            def f(p):
                logits = vit.forward(p, imgs, cfg, ops)
                return trainer.cross_entropy_loss(logits, labels)
            return f

        opts = trainer.kernel_backward_compiler_options()
        g_new = jax.jit(jax.grad(loss("fused_train")), compiler_options=opts)(params)
        g_ref = jax.jit(jax.grad(loss("xla")))(params)
        devs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g_new, g_ref
        )
        worst = max(jax.tree.leaves(devs))
        print(f"compiled grad parity (fp32, batch 4): max dev = {worst:.3e}")
        assert worst < 1e-4, devs

    # timing: bf16 mixed precision, adamw
    optimizer = optax.adamw(1e-3)
    imgs = jnp.asarray(
        rng.normal(
            size=(args.batch, cfg.in_channels, cfg.image_size, cfg.image_size)
        ),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, args.batch), jnp.int32)

    for ops_name in args.paths.split(","):
        if ops_name == "mae":
            # MAE pretraining (VERDICT r4 item 4): the masked encoder runs
            # ~25% of the tokens through the same fused kernels — measure
            # the per-image win over supervised fused_train.
            from vit_tpu.models import mae as mae_mod

            mcfg = mae_mod.MAEConfig()  # mask 0.75, paper decoder 512x8
            params = mae_mod.init_mae_params(jax.random.key(1), cfg, mcfg)
            opt_state = optimizer.init(params)
            raw = trainer.make_mae_train_step(
                cfg, mcfg, optimizer, get_ops("fused_train"),
                compute_dtype=jnp.bfloat16,
            )
            key = jax.random.key(0)
            step = jax.jit(
                lambda p, o, x, _y: raw(p, o, x, key),
                donate_argnums=(0, 1),
                compiler_options=trainer.kernel_backward_compiler_options(),
            )
            dt, dt_min, dt_max, lv = train_step_timing(
                step, params, opt_state, imgs, labels, args.iters, warm=3
            )
            print(
                f"mae (mask {mcfg.mask_ratio}): {dt*1e3:.1f} ms/step  "
                f"({args.batch/dt:.0f} img/s, spread "
                f"{args.batch/dt_max:.0f}-{args.batch/dt_min:.0f})  "
                f"loss={lv:.3f}"
            )
            continue
        if ops_name.startswith("distill"):
            # 'distill[:xla|:fused|:int8]' — DeiT-B student on the fused
            # train kernels with the frozen teacher (vit_b_16, synthetic
            # weights) on the named op table.  The three variants isolate
            # the teacher leg's cost: jnp per-op forward vs the fused
            # inference megakernels vs the W8A8 quant kernels — the
            # measured step-time delta behind train_setup's teacher
            # dispatch (cli/train_setup.py --distill-teacher[-int8]).
            variant = ops_name.split(":")[1] if ":" in ops_name else "fused"
            scfg = cfg if cfg.distilled else get_config("deit_b_16")
            tcfg = get_config("vit_b_16")
            t_params = vit.init_params(jax.random.key(7), tcfg, jnp.float32)
            if variant == "int8":
                from vit_tpu.ops import quant as _q

                t_params = _q.quantize_params(t_params)
                t_params = _q.cast_quantized_params(t_params, jnp.bfloat16)
                t_ops = get_ops("quant")
            elif variant == "fused":
                t_params = vit.cast_params(t_params, jnp.bfloat16)
                t_ops = get_ops("fused")
            elif variant == "xla":
                t_params = vit.cast_params(t_params, jnp.bfloat16)
                t_ops = None
            else:
                raise SystemExit(f"distill:{variant}: unknown teacher "
                                 "variant (xla/fused/int8)")

            def teacher_fwd(x, _p=t_params, _c=tcfg, _o=t_ops):
                if _o is None:
                    return vit.forward(_p, x, _c)
                return vit.forward(_p, x, _c, _o)

            params, opt_state = trainer.init_train_state(
                jax.random.key(1), scfg, optimizer
            )
            raw = trainer.make_distill_train_step(
                scfg, optimizer, teacher_fwd, get_ops("fused_train"),
                remat=False, compute_dtype=jnp.bfloat16,
            )
            step = jax.jit(
                raw, donate_argnums=(0, 1),
                compiler_options=trainer.kernel_backward_compiler_options(),
            )
            dt, dt_min, dt_max, lv = train_step_timing(
                step, params, opt_state, imgs, labels, args.iters, warm=3
            )
            print(
                f"distill {scfg.name} (teacher {variant}): "
                f"{dt*1e3:.1f} ms/step  ({args.batch/dt:.0f} img/s, spread "
                f"{args.batch/dt_max:.0f}-{args.batch/dt_min:.0f})  "
                f"loss={lv:.3f}"
            )
            continue
        if (ops_name == "reg" or ops_name.startswith("tome:")
                or ops_name.startswith("tome_reg:")
                or ops_name.startswith("tome_dp:")
                or ops_name.startswith("tome_xla")):
            # 'reg': the full regularizer recipe in-kernel (VERDICT r4
            # item 1's <10%-overhead gate); 'tome:R': train-time ToMe.
            import dataclasses

            if ops_name == "reg":
                rcfg = dataclasses.replace(cfg, dropout=0.1, drop_path=0.1)
                raw = trainer.make_train_step(
                    rcfg, optimizer, get_ops("fused_train"), remat=False,
                    use_dropout=True, compute_dtype=jnp.bfloat16,
                )
                key = jax.random.key(0)
                step_fn = lambda p, o, x, y: raw(p, o, x, y, key)  # noqa: E731
                label = "reg (dropout 0.1 + drop-path 0.1)"
            else:
                from vit_tpu.models import tome as tome_mod

                parts = ops_name.split(":")
                reg = parts[0] in ("tome_reg", "tome_dp", "tome_xla_reg")
                xla_tier = parts[0] in ("tome_xla", "tome_xla_reg")
                r = int(parts[1])
                chunk = int(parts[2]) if len(parts) > 2 else None
                if chunk is not None and chunk < 1:
                    raise SystemExit(
                        f"{parts[0]}:{r}:{chunk}: chunk must be >= 1 "
                        "(mirrors --tome-chunk's validation)"
                    )
                # xla tier: forward_xla (pure jnp, GSPMD-partitionable, no
                # Pallas operand staging) — the tier the CLI's
                # `--tome --ops xla` runs; the fallback with an on-chip
                # number when the kernel-tier merged-token train chain's
                # backend envelope faults (docs/performance.md round 5)
                fwd_impl = (
                    tome_mod.forward_xla if xla_tier
                    else tome_mod.forward_train
                )
                step_ops = get_ops("xla" if xla_tier else "fused_train")
                step_remat = xla_tier  # custom-VJP kernels already recompute
                tier_tag = " [xla tier]" if xla_tier else ""
                counts = tome_mod.schedule(
                    cfg, r,
                    tome_mod.TRAIN_MERGE_CHUNK if chunk is None else chunk,
                )
                if reg:
                    # tome_reg: ToMe x dropout/drop-path — the regularized
                    # split train kernels on merged tokens
                    # (models/tome.forward_train dropout_rng=...).
                    # tome_dp: drop-path ONLY (the DeiT/ToMe-paper
                    # setting) — stochastic depth composes AROUND the
                    # clean kernels as a jnp lerp.
                    # tome_xla_reg: the full recipe at the xla tier.
                    dp_only = parts[0] == "tome_dp"
                    tcfg = dataclasses.replace(
                        cfg,
                        dropout=0.0 if dp_only else 0.1,
                        drop_path=0.1,
                    )
                    raw = trainer.make_train_step(
                        tcfg, optimizer, step_ops, remat=step_remat,
                        use_dropout=True, compute_dtype=jnp.bfloat16,
                        forward_fn=lambda p, im, rng: fwd_impl(
                            p, im, tcfg, r, counts=counts, dropout_rng=rng
                        ),
                    )
                    key = jax.random.key(0)
                    step_fn = lambda p, o, x, y: raw(p, o, x, y, key)  # noqa: E731
                    label = (
                        f"tome r={r} + drop-path 0.1 (lerp) train"
                        if dp_only
                        else f"tome r={r} + dropout 0.1 + drop-path 0.1 train"
                    ) + tier_tag
                else:
                    raw = trainer.make_train_step(
                        cfg, optimizer, step_ops, remat=step_remat,
                        compute_dtype=jnp.bfloat16,
                        forward_fn=lambda p, im: fwd_impl(
                            p, im, cfg, r, counts=counts
                        ),
                    )
                    step_fn = raw
                    label = f"tome r={r} train{tier_tag}"
                if chunk is not None:
                    label += f" (chunk {chunk})"
            params, opt_state = trainer.init_train_state(
                jax.random.key(1), cfg, optimizer
            )
            step = jax.jit(
                step_fn, donate_argnums=(0, 1),
                compiler_options=trainer.kernel_backward_compiler_options(),
            )
            dt, dt_min, dt_max, lv = train_step_timing(
                step, params, opt_state, imgs, labels, args.iters, warm=3
            )
            print(
                f"{label}: {dt*1e3:.1f} ms/step  ({args.batch/dt:.0f} img/s, "
                f"spread {args.batch/dt_max:.0f}-{args.batch/dt_min:.0f})  "
                f"loss={lv:.3f}"
            )
            continue
        fused_opt = ops_name.endswith("+fadamw")
        ops_name = ops_name.removesuffix("+fadamw")
        remat = ops_name == "xla"  # custom-VJP paths already recompute
        if fused_opt:
            params, _ = trainer.init_train_state(jax.random.key(1), cfg, optimizer)
            opt_state = trainer.init_fused_adamw_state(params)
            raw_step = trainer.make_train_step_fused_adamw(
                cfg, 1e-3, get_ops(ops_name), remat=remat,
                compute_dtype=jnp.bfloat16,
            )
        else:
            params, opt_state = trainer.init_train_state(
                jax.random.key(1), cfg, optimizer
            )
            raw_step = trainer.make_train_step(
                cfg, optimizer, get_ops(ops_name), remat=remat,
                compute_dtype=jnp.bfloat16,
            )
        step = jax.jit(
            raw_step,
            donate_argnums=(0, 1),
            compiler_options=(
                trainer.kernel_backward_compiler_options()
                if ops_name != "xla" else None
            ),
        )

        dt, dt_min, dt_max, lv = train_step_timing(
            step, params, opt_state, imgs, labels, args.iters, warm=3
        )
        print(
            f"{ops_name}{'+fadamw' if fused_opt else ''}: {dt*1e3:.1f} ms/step  "
            f"({args.batch/dt:.0f} img/s, spread "
            f"{args.batch/dt_max:.0f}-{args.batch/dt_min:.0f})  loss={lv:.3f}"
        )


if __name__ == "__main__":
    main()
