"""Classification driver CLI.

Replaces Main.c:18-88: load an image batch + weights, run the model, argmax
probabilities, write results in the reference's text format, optionally run
the comparator against a golden file, print timing.  Differences by design:
paths and model variant are flags (the reference hard-codes them,
Main.c:22,30,40), the whole batch runs at once (the reference forces n=1,
Main.c:45-46), and the comparator gates every line by default (the
reference checks only line 0).

Usage examples::

    vit-tpu --weights ./Network --input ./Data/input-100.bin \
            --output ./Data/result.txt --golden ./Data/answer_result.txt
    vit-tpu --weights ./Network --synth 8 --allow-synth-weights --top 3
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vit-tpu", description="TPU-native ViT ImageNet classifier"
    )
    p.add_argument("--config", default="vit_b_16", help="model variant name")
    p.add_argument(
        "--num-classes", type=int, default=None, metavar="K",
        help="override the config's class count (fine-tuned checkpoints)",
    )
    p.add_argument("--weights", required=True, help="weight source: Weight_*.bin dir, .npz checkpoint, torchvision .pth, or Orbax dir")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="input-100.bin-format image batch")
    src.add_argument("--synth", type=int, help="use N synthetic images")
    src.add_argument(
        "--images", nargs="+", metavar="PATH",
        help="raw image files or directories (JPEG/PNG/...), preprocessed "
        "with the torchvision eval transform (resize shorter side, center "
        "crop, ImageNet-normalize — io/preprocess.py)",
    )
    p.add_argument("--output", help="write results here (reference text format)")
    p.add_argument("--golden", help="golden answer_result.txt to compare against")
    p.add_argument(
        "--compare-count",
        type=int,
        default=None,
        help="gate only the first N lines (reference parity: 1); default all",
    )
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument(
        "--ops",
        default="auto",
        choices=["auto", "xla", "pallas", "fused", "quant"],
        help="compute path: xla (jnp oracle), pallas (per-op kernels), "
        "fused (megakernels), quant (W8A8 int8 GEMMs)",
    )
    p.add_argument(
        "--tp", type=int, default=1,
        help="tensor-parallel size (heads/MLP split over a device mesh)",
    )
    p.add_argument(
        "--dp", type=int, default=None,
        help="data-parallel size (default: devices/tp when tp>1)",
    )
    p.add_argument(
        "--no-compile-cache", action="store_true",
        help="disable the persistent XLA compilation cache "
        "(default dir: ~/.cache/vit_tpu/xla or $VIT_TPU_COMPILE_CACHE)",
    )
    p.add_argument("--gelu", default="exact", choices=["exact", "tanh"])
    p.add_argument("--batch-pad", type=int, default=32)
    p.add_argument(
        "--no-round6",
        action="store_true",
        help="skip the reference's 6-decimal weight rounding (Network.c:186)",
    )
    p.add_argument(
        "--allow-synth-weights",
        action="store_true",
        help="synthesize any missing weight files (stripped-blob checkpoints)",
    )
    p.add_argument(
        "--interpolate-pos-from",
        metavar="CONFIG",
        help="weights dir holds a checkpoint of this (lower-resolution) "
        "config; bicubic-interpolate its position table to --config's grid",
    )
    p.add_argument("--labels", help="label names: text file or C source array")
    p.add_argument("--top", type=int, default=1, help="print top-K classes per image")
    p.add_argument(
        "--attn-rollout", metavar="PATH",
        help="save attention-rollout relevance heatmaps (Abnar & Zuidema) "
        "for the batch to an .npz (maps: (B, grid, grid), labels); "
        "needs fp ops (not quant)",
    )
    p.add_argument(
        "--tome", type=int, default=0, metavar="R",
        help="ToMe token merging: merge the R most similar token pairs "
        "per layer (Bolya et al. 2022) — higher throughput at a "
        "controlled approximation cost; needs --ops fused or xla",
    )
    p.add_argument("--json", action="store_true", help="machine-readable summary")
    p.add_argument(
        "--profile",
        action="store_true",
        help="print a per-phase timing breakdown (reference's per-encoder "
        "printfs, ViT_opencl.c:745-779, done as an aggregate report)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    from vit_tpu.eval import comparator
    from vit_tpu.io import images as iio
    from vit_tpu.io.labels import load_labels
    from vit_tpu.runtime import InferenceEngine

    from vit_tpu.cli.common import (
        resolve_compile_cache,
        resolve_config,
        resolve_mesh,
        resolve_ops_name,
    )

    resolve_compile_cache(args)
    cfg = resolve_config(args.config, args.num_classes)
    ops = resolve_ops_name(args.ops)
    if args.tome < 0:
        print("error: --tome must be >= 0", file=sys.stderr)
        return 2
    if args.tome and ops not in ("fused", "quant", "xla"):
        print(
            "error: --tome (token merging) needs --ops fused, quant, or xla",
            file=sys.stderr,
        )
        return 2
    if args.tome and args.tp > 1:
        print(
            "error: --tome shards data-parallel only (no --tp): the merge "
            "keeps whole tokens per device",
            file=sys.stderr,
        )
        return 2
    if args.tome and (args.attn_rollout or args.profile):
        print(
            "error: --attn-rollout/--profile probe the full-token model, "
            "which would diverge from --tome's merged predictions — run "
            "them without --tome",
            file=sys.stderr,
        )
        return 2
    if ops == "quant" and (args.attn_rollout or args.profile):
        # knowable now: both probes need fp weights (engine raises the
        # same incompatibility, but only AFTER minutes of load+inference)
        print(
            "error: --attn-rollout/--profile need fp weights; "
            "use --ops xla/pallas/fused",
            file=sys.stderr,
        )
        return 2
    mesh = resolve_mesh(args.dp, args.tp)

    t_load0 = time.perf_counter()
    source_names = None
    if args.input:
        images = iio.load_image_bin(args.input)
    elif args.images:
        from vit_tpu.io.preprocess import load_and_preprocess

        images, source_names = load_and_preprocess(args.images, cfg)
    else:
        images = iio.synth_images(args.synth, cfg, seed=0)
    load_cfg = cfg
    if args.interpolate_pos_from:
        # the head-width override applies to the LOAD config too — the
        # checkpoint being adapted carries the fine-tuned head, and
        # adapt_params_resolution only reconciles patch/pos, not classes
        load_cfg = resolve_config(args.interpolate_pos_from, args.num_classes)
    from vit_tpu.io.load_any import load_params_any

    params = load_params_any(
        args.weights,
        load_cfg,
        round_to_6dp=not args.no_round6,
        allow_synth=args.allow_synth_weights,
    )
    if args.interpolate_pos_from:
        from vit_tpu.io.interpolate import adapt_params_resolution

        params = adapt_params_resolution(params, load_cfg, cfg)
    t_load = time.perf_counter() - t_load0

    engine = InferenceEngine(
        cfg, params, dtype=args.dtype, ops=ops, mesh=mesh,
        batch_pad=args.batch_pad, gelu_variant=args.gelu, tome_r=args.tome,
    )

    t0 = time.perf_counter()
    probs = np.asarray(engine.probabilities(images))
    elapsed = time.perf_counter() - t0

    pred = probs.argmax(-1)
    top_prob = probs[np.arange(len(pred)), pred]

    label_names = load_labels(args.labels, cfg.num_classes)
    for i in range(len(pred)):
        line = comparator.format_result_line(i, pred[i], top_prob[i])
        if args.top > 1:
            order = probs[i].argsort()[::-1][: args.top]
            extra = ", ".join(f"{label_names[j]}={probs[i, j]:.4f}" for j in order)
            line += f"   [{extra}]"
        else:
            line += f"   ({label_names[pred[i]]})"
        if source_names is not None:
            line += f"   {source_names[i]}"
        print(line)

    if args.output:
        comparator.write_result_file(pred, top_prob, args.output)

    if args.attn_rollout:
        maps = np.asarray(engine.attention_maps(images, rollout=True))
        np.savez(args.attn_rollout, maps=maps, labels=pred)
        print(f"saved attention-rollout maps {maps.shape} to {args.attn_rollout}")

    n_errors = 0
    if args.golden:
        got = [
            comparator.ResultLine(i, int(l), float(p))
            for i, (l, p) in enumerate(zip(pred, top_prob))
        ]
        want = comparator.parse_result_file(args.golden)
        mismatches = comparator.compare_results(got, want, count=args.compare_count)
        n_errors = len(mismatches)
        for m in mismatches:
            print(f"MISMATCH {m}", file=sys.stderr)
        print(f"comparator: {n_errors} error(s) over {len(want) if args.compare_count is None else args.compare_count} line(s)")

    if args.profile:
        print(engine.phase_report(images))

    print(
        f"model: {cfg.name}  images: {len(pred)}  ops: {ops}  dtype: {args.dtype}  "
        f"load: {t_load:.2f}s  inference: {elapsed:.3f}s "
        f"({len(pred) / elapsed:.1f} img/s incl. compile)"
    )
    if args.json:
        print(
            json.dumps(
                {
                    "images": int(len(pred)),
                    "inference_sec": elapsed,
                    "images_per_sec": len(pred) / elapsed,
                    "comparator_errors": n_errors,
                    "ops": ops,
                    "dtype": args.dtype,
                }
            )
        )
    return 1 if n_errors else 0


if __name__ == "__main__":
    sys.exit(main())
