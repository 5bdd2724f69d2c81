#!/usr/bin/env python
"""Classify images with the library API (the Main.c flow, in five lines).

Runs anywhere: with ``--weights`` pointing at a real checkpoint (reference
``Weight_*.bin`` dir, ``.npz``, torchvision ``.pth``, or Orbax — any
format ``io/load_any.py`` resolves) predictions are real; without one,
synthetic weights keep the example runnable end-to-end (shapes and
plumbing are real, labels are meaningless).

    python examples/classify.py --cpu              # synthetic, CPU
    python examples/classify.py --weights ./Network --ops fused   # TPU
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None, help="checkpoint (any format)")
    ap.add_argument("--config", default="vit_b_16")
    ap.add_argument("--ops", default="xla",
                    help="xla | pallas | fused | quant")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vit_tpu.config import get_config
    from vit_tpu.io import synth_images, weights as wio
    from vit_tpu.io.labels import load_labels
    from vit_tpu.runtime import InferenceEngine

    cfg = get_config(args.config)
    if args.weights:
        from vit_tpu.io.load_any import load_params_any

        params = load_params_any(args.weights, cfg)
    else:
        params = wio.params_from_tensors(
            wio.synth_reference_tensors(cfg, seed=0), cfg
        )

    images = synth_images(args.batch, cfg, seed=0)  # or io.preprocess for JPEGs
    engine = InferenceEngine(cfg, params, dtype="bfloat16", ops=args.ops)
    labels, top_probs = engine.classify(images)

    # num_classes must follow the config (like cli/main.py does): with a
    # non-ImageNet head the packaged 1000-name table would be wrong or
    # out of range; load_labels falls back to class_i placeholders.
    names = load_labels(num_classes=cfg.num_classes)
    for i, (lbl, p) in enumerate(zip(labels, top_probs)):
        # the reference driver's output line format (Main.c:62-72)
        print(f"[{i}] label: {lbl} / prob: {p:.6f}   ({names[lbl]})")

    # extras the reference never exposed (fp paths only: the int8 engine
    # carries quantized weights, and both probes raise needing fp params)
    if args.ops != "quant":
        feats = engine.features(images)                    # (B, D) CLS embeddings
        heat = engine.attention_maps(images, rollout=True) # (B, grid, grid)
        print(f"features {feats.shape}  rollout {heat.shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
