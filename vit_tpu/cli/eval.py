"""Accuracy evaluation CLI.

The reference's only evaluation is the one-shot comparator over a golden
text file (comparator.c:23-80, gated at a single line).  This driver
generalizes it into a real eval loop: stream a labeled dataset (a
``--data-dir`` of input-100.bin-format shards with ``<stem>.labels.bin``
files, or one ``--input``/``--labels`` pair) through any engine compute
path and report top-1 / top-5 accuracy and mean top-probability.

Usage::

    vit-tpu-eval --weights ./Network --data-dir ./val_shards --ops fused
    vit-tpu-eval --weights ./Network --input input-100.bin --labels y.bin
    vit-tpu-eval --weights ./Network --image-dir ./imagenet_val  # raw files
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vit-tpu-eval", description="top-1/top-5 accuracy evaluation"
    )
    p.add_argument("--config", default="vit_b_16")
    p.add_argument(
        "--num-classes", type=int, default=None, metavar="K",
        help="override the config's class count (fine-tuned checkpoints)",
    )
    p.add_argument("--weights", required=True)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--data-dir", help="dir of labeled .bin shards")
    src.add_argument("--input", help="input-100.bin-format image batch")
    src.add_argument(
        "--image-dir",
        help="ImageNet-style folder-per-class dataset of raw image files "
        "(root/<class>/*.jpg, classes = sorted subdir names); preprocessed "
        "with the torchvision eval transform (io/preprocess.py)",
    )
    p.add_argument("--labels", help="raw int32 labels matching --input")
    p.add_argument("--batch", type=int, default=64, help="eval batch size")
    p.add_argument("--limit", type=int, default=None,
                   help="evaluate at most N images")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--ops", default="auto",
                   choices=["auto", "xla", "pallas", "fused", "quant"])
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--dp", type=int, default=None)
    p.add_argument("--gelu", default="exact", choices=["exact", "tanh"])
    p.add_argument(
        "--tome", type=int, default=0, metavar="R",
        help="ToMe token merging (needs --ops fused/xla): measure the "
        "accuracy side of the throughput-vs-r trade",
    )
    p.add_argument("--allow-synth-weights", action="store_true")
    p.add_argument("--json", action="store_true",
                   help="emit one JSON line instead of text")
    p.add_argument("--no-compile-cache", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.input and not args.labels:
        print("error: --input requires --labels", file=sys.stderr)
        return 2

    import jax

    from vit_tpu.eval import accuracy
    from vit_tpu.io.load_any import load_params_any
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
    if args.tome and (ops not in ("fused", "quant", "xla") or args.tp > 1):
        print("error: --tome needs --ops fused/quant/xla on a dp mesh (no "
              "--tp)", file=sys.stderr)
        return 2

    ds = None
    if args.image_dir:
        from vit_tpu.io.dataset import ImageFolderDataset

        ds = ImageFolderDataset(args.image_dir, cfg.image_size)
        if len(ds.class_names) > cfg.num_classes:
            print(f"error: {len(ds.class_names)} class folders > "
                  f"{cfg.num_classes} model classes ({cfg.name}) — folder "
                  "indices would not map to model outputs", file=sys.stderr)
            return 2
        n_total = min(args.limit, len(ds)) if args.limit else len(ds)
        print(f"{n_total} images, {len(ds.class_names)} classes",
              file=sys.stderr)
        bs = min(args.batch, n_total)
        images = ds.read(range(bs))  # threaded decode + preprocess
        labels = ds.labels()[:bs]
    elif args.data_dir:
        from vit_tpu.io.dataset import BinShardDataset

        ds = BinShardDataset(args.data_dir, require_labels=True,
                             num_classes=cfg.num_classes)
        n_total = min(args.limit, len(ds)) if args.limit else len(ds)
        bs = min(args.batch, n_total)
        # first batch materialized for engine batch_pad sizing; the rest
        # stream (never the whole dataset in host RAM)
        images = ds.read(range(bs))
        labels = ds.labels()[: len(images)]
    else:
        from vit_tpu.io.images import load_image_bin

        images = load_image_bin(args.input)
        labels = np.fromfile(args.labels, dtype="<i4")
        if len(labels) != len(images):
            print(f"error: {len(labels)} labels != {len(images)} images",
                  file=sys.stderr)
            return 2
        if args.limit:
            images, labels = images[: args.limit], labels[: args.limit]

    mesh = resolve_mesh(args.dp, args.tp, out=sys.stderr)

    params = load_params_any(
        args.weights, cfg, allow_synth=args.allow_synth_weights
    )
    engine = InferenceEngine(
        cfg, params, dtype=args.dtype, ops=ops, mesh=mesh,
        batch_pad=min(args.batch, len(images)), gelu_variant=args.gelu,
        tome_r=args.tome,
    )
    t0 = time.perf_counter()
    if ds is not None:
        # one streaming generator serves both dataset kinds (identical
        # read/labels interface); host reads / PIL decodes for batch i+1
        # overlap batch i's device compute via the prefetch wrapper
        from vit_tpu.runtime.prefetch import prefetch_to_device

        all_labels = ds.labels()

        def _stream():
            yield images, labels  # already read
            for i in range(len(images), n_total, args.batch):
                take = range(i, min(i + args.batch, n_total))
                yield ds.read(take), all_labels[take.start : take.stop]

        stream = prefetch_to_device(_stream(), size=2,
                                    place=lambda item: item)
        try:
            report = accuracy.evaluate_batches(engine, stream)
        finally:
            stream.close()
    else:
        report = accuracy.evaluate(
            engine, images, labels, batch_size=min(args.batch, len(images))
        )
    dt = time.perf_counter() - t0
    payload = {
        **report.as_dict(),
        "images_per_sec": round(report.n / dt, 2),
        "model": cfg.name,
        "ops": ops,
        "dtype": args.dtype,
    }
    if args.json:
        print(json.dumps(payload))
    else:
        print(
            f"{cfg.name} ops={ops} dtype={args.dtype}: "
            f"top-1 {report.top1:.4f}  top-5 {report.top5:.4f}  "
            f"mean top-prob {report.mean_top_prob:.4f}  "
            f"({report.n} images, {payload['images_per_sec']} img/s)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
