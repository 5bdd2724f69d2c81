"""The vit-tpu-train step loop: per-step dispatch, logging, periodic
eval/checkpointing, preemption (SIGTERM) safety, and final saves.

Split out of cli/train.py (round-3 maintainability task); the run is
constructed by cli/train_setup.prepare.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np


def ema_sidecar(state_path) -> Path:
    return Path(state_path).with_suffix(".ema.npz")


def run(args, st) -> int:
    """Drive ``st`` (a train_setup.TrainSetup) for args.steps steps."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.io import checkpoint as ckpt
    from vit_tpu.io import weights as wio
    from vit_tpu.parallel import batch_sharding

    params, opt_state, ema = st.params, st.opt_state, st.ema
    stream, images, labels, n = st.stream, st.images, st.labels, st.n_static

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
            ckpt.save_npz(jax.device_get(ema), ema_sidecar(args.save_state))
        print(f"saved training state (step {s}) to {args.save_state}")

    # Preemption safety: TPU VMs get SIGTERM on eviction; checkpoint the
    # full training state and exit cleanly so --resume continues the run.
    import signal

    preempted = {"flag": False}

    def _on_term(signum, frame):
        preempted["flag"] = True

    # signal.signal returns None when the prior handler was installed
    # outside Python — track installation separately so the custom handler
    # is ALWAYS restored (restore to SIG_DFL in that case), never leaked
    # past this function in embedding processes.
    handler_installed = False
    prev_handler = None
    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_term)
        handler_installed = True
    except ValueError:  # not the main thread (embedded use) — skip
        pass

    last_step = st.start_step
    last_eval_step = None
    # Static data cycles a few distinct slices — stage each on device ONCE
    # (the step never donates its batch args, trainer.py donate_argnums=(0,1)).
    # Re-uploading the same host slice every step costs ~1.2 s/step through
    # this environment's tunnel (CLAUDE.md).  Byte-bounded so a large static
    # set cannot crowd training out of HBM.
    staged_batches = {}
    if stream is None and n:
        batch_bytes = int(
            np.asarray(images[: args.batch]).nbytes
            + np.asarray(labels[: args.batch]).nbytes
        )
        max_staged = max(1, int(512e6) // max(batch_bytes, 1))
    try:
        for s in range(st.start_step, st.start_step + args.steps):
            if stream is not None:
                xb, yb = next(stream)
            else:
                # n_static is a multiple of args.batch (prepare() drops the
                # ragged tail), so this cycles clean aligned batches; one
                # sharded host->device transfer (no jnp.asarray staging hop)
                i0 = (s * args.batch) % n
                if i0 in staged_batches:
                    xb, yb = staged_batches[i0]
                else:
                    xb = jax.device_put(
                        images[i0 : i0 + args.batch], batch_sharding(st.mesh, 4)
                    )
                    yb = jax.device_put(
                        labels[i0 : i0 + args.batch], batch_sharding(st.mesh, 1)
                    )
                    if len(staged_batches) < max_staged:
                        staged_batches[i0] = (xb, yb)
            t0 = time.perf_counter()
            if st.step_needs_rng:
                params, opt_state, loss = st.step(
                    params, opt_state, xb, yb,
                    jax.random.fold_in(st.aug_key, s),
                )
            else:
                params, opt_state, loss = st.step(params, opt_state, xb, yb)
            if st.ema_update is not None:
                ema = st.ema_update(ema, params)
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
                    print(f"step {s}: non-finite loss; update skipped",
                          file=sys.stderr)
                else:
                    print("non-finite loss; aborting", file=sys.stderr)
                    return 1  # stream closed by the finally below
            if st.run_eval is not None and (s + 1) % args.eval_every == 0:
                last_eval_step = s + 1
                acc = st.run_eval(ema if ema is not None else params)
                which = "ema" if ema is not None else "params"
                print(f"step {s:4d}  eval top-1 {acc:.4f} ({which})")
                if args.log_jsonl and jax.process_index() == 0:
                    import json

                    with open(args.log_jsonl, "a") as fh:
                        fh.write(json.dumps(
                            {"step": s, "eval_top1": round(acc, 6)}
                        ) + "\n")
            if (args.save_state and args.save_every
                    and (s + 1) % args.save_every == 0):
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
                        f"SIGTERM: exiting at step {last_step} (no "
                        "--save-state given; nothing checkpointed)",
                        file=sys.stderr,
                    )
                break
    finally:
        if handler_installed:
            signal.signal(
                signal.SIGTERM,
                prev_handler if prev_handler is not None else signal.SIG_DFL,
            )
        if stream is not None:
            # stop the prefetch producer thread even when a step raises —
            # a stranded producer holds a staged device batch (and on some
            # backends a daemon thread dying inside the runtime aborts the
            # process; see runtime/prefetch.py)
            stream.close()
    # final held-out evaluation ("--eval-every ... and at the end") unless
    # the last loop step already evaluated (skipped on preemption: the
    # SIGTERM budget is for checkpointing, not scoring)
    if (st.run_eval is not None and last_eval_step != last_step
            and not preempted["flag"]):
        acc = st.run_eval(ema if ema is not None else params)
        which = "ema" if ema is not None else "params"
        print(f"final eval top-1 {acc:.4f} ({which})")
        if args.log_jsonl and jax.process_index() == 0:
            import json

            with open(args.log_jsonl, "a") as fh:
                fh.write(json.dumps(
                    {"step": last_step, "eval_top1": round(acc, 6),
                     "final": True}
                ) + "\n")
    if args.save_state:
        save_state(last_step)
    if args.save and jax.process_index() == 0:
        ckpt.save_npz(jax.device_get(params), args.save)
        print(f"saved params to {args.save}")
    if args.save_backbone and jax.process_index() == 0:
        from vit_tpu.models import mae as mae_mod

        bb = mae_mod.extract_backbone(
            jax.device_get(params), jax.random.key(args.seed ^ 0xBB), st.cfg
        )
        ckpt.save_npz(bb, args.save_backbone)
        print(
            f"saved pretrained backbone (fresh {st.cfg.embed_dim} x "
            f"{st.cfg.num_classes} head) to {args.save_backbone}"
        )
    if args.save_ema and ema is not None and jax.process_index() == 0:
        ckpt.save_npz(jax.device_get(ema), args.save_ema)
        print(f"saved EMA params to {args.save_ema}")
    if args.save_reference and jax.process_index() == 0:
        wio.save_reference_weights(
            wio.tensors_from_params(jax.device_get(params), st.cfg),
            args.save_reference, st.cfg,
        )
        print(f"exported reference-format weights to {args.save_reference}")
    return 0
