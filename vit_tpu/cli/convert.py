"""Checkpoint conversion CLI.

One command between every weight format the framework speaks
(io/load_any.py resolves the input; the output format is chosen by
--to's shape):

  - IN : reference ``Weight_*.bin`` dir / trained ``.npz`` / torchvision
         ``.pth`` / Orbax checkpoint dir / HuggingFace model dir
  - OUT: ``.npz`` | reference-format dir (``--format reference``) |
         Orbax dir (``--format orbax``)

The reference's checkpoint story is one hard-coded directory read
(Network.c:119-194); this closes the loop in both directions — e.g. pull
a torchvision ``.pth`` and emit the exact ``Weight_{idx}_{name}.bin``
files the reference C engine loads, or flatten any source into one
``.npz`` for the serving/eval drivers.

Usage::

    vit-tpu-convert --from model.pth --to ./Network --format reference
    vit-tpu-convert --from ./Network --to params.npz
    vit-tpu-convert --from hf_dir --hf --to params.npz
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vit-tpu-convert")
    p.add_argument("--config", default="vit_b_16")
    p.add_argument("--from", dest="src", required=True,
                   help="source: Weight_*.bin dir, .npz, .pth/.pt, Orbax "
                   "dir, or (with --hf) a HuggingFace ViT model dir")
    p.add_argument("--to", dest="dst", required=True,
                   help="destination path (.npz file, or a directory for "
                   "--format reference/orbax)")
    p.add_argument(
        "--format", default=None,
        choices=["npz", "reference", "orbax", "pth"],
        help="output format (default: npz for a *.npz destination, pth "
        "for *.pth/*.pt, reference otherwise)",
    )
    p.add_argument(
        "--hf", action="store_true",
        help="treat --from as a HuggingFace ViTForImageClassification "
        "checkpoint directory (io/hf_convert.py)",
    )
    p.add_argument("--allow-synth-weights", action="store_true")
    p.add_argument(
        "--no-round6", action="store_true",
        help="skip the reference loader's 6-decimal rounding on read",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from vit_tpu.config import get_config
    from vit_tpu.io import checkpoint as ckpt
    from vit_tpu.io import weights as wio

    cfg = get_config(args.config)

    if args.hf:
        try:
            from transformers import ViTForImageClassification
        except ImportError:
            print("error: --hf needs the transformers package",
                  file=sys.stderr)
            return 2
        from vit_tpu.io.hf_convert import config_from_hf, params_from_hf_state_dict

        try:
            from transformers import AutoConfig

            hf_auto = AutoConfig.from_pretrained(args.src)
            if getattr(hf_auto, "model_type", "vit") == "deit":
                # DeiT: distilled checkpoints carry dual classifier heads
                # (WithTeacher); plain DeiT fine-tunes carry a single one —
                # pick by the checkpoint's recorded architecture (one load,
                # never random-initializing a missing head).  WithTeacher is
                # the default for the untagged case: every published
                # facebook/deit-*-distilled checkpoint records it.
                from transformers import (
                    DeiTForImageClassification,
                    DeiTForImageClassificationWithTeacher,
                )

                archs = getattr(hf_auto, "architectures", None) or []
                cls = (
                    DeiTForImageClassification
                    if "DeiTForImageClassification" in archs
                    else DeiTForImageClassificationWithTeacher
                )
                model, info = cls.from_pretrained(
                    args.src, output_loading_info=True
                )
                if any("classifier" in k for k in info["missing_keys"]):
                    # untagged checkpoint with the other head layout
                    other = (
                        DeiTForImageClassificationWithTeacher
                        if cls is DeiTForImageClassification
                        else DeiTForImageClassification
                    )
                    model, info = other.from_pretrained(
                        args.src, output_loading_info=True
                    )
                    if any("classifier" in k for k in info["missing_keys"]):
                        # a headless backbone (e.g. a DeiTModel / MIM
                        # export): refuse rather than silently exporting
                        # random-initialized classifier weights
                        print(
                            f"error: {args.src!r} carries no classifier "
                            "head in either DeiT layout — convert a "
                            "*ForImageClassification checkpoint, or "
                            "fine-tune a head first (vit-tpu-train "
                            "--num-classes)",
                            file=sys.stderr,
                        )
                        return 2
            else:
                model, info = ViTForImageClassification.from_pretrained(
                    args.src, output_loading_info=True
                )
                if any("classifier" in k for k in info["missing_keys"]):
                    # same guard as the DeiT branch: a headless backbone
                    # must not export random-initialized classifier weights
                    print(
                        f"error: {args.src!r} carries no classifier head — "
                        "convert a *ForImageClassification checkpoint, or "
                        "fine-tune a head first (vit-tpu-train "
                        "--num-classes)",
                        file=sys.stderr,
                    )
                    return 2
            hf_cfg = config_from_hf(model.config)
            # the checkpoint knows its own head width: adopt it (the
            # structural fields must still match the named --config)
            if hf_cfg.num_classes != cfg.num_classes:
                import dataclasses as _dc

                print(f"note: adopting the checkpoint's num_classes="
                      f"{hf_cfg.num_classes} (config had {cfg.num_classes})")
                cfg = _dc.replace(cfg, num_classes=hf_cfg.num_classes)
            for field in ("image_size", "patch_size", "embed_dim", "depth",
                          "num_heads", "distilled"):
                got, want = getattr(hf_cfg, field), getattr(cfg, field)
                if got != want:
                    print(f"error: HF checkpoint has {field}={got} but "
                          f"--config {cfg.name} expects {want}; pick the "
                          "matching --config", file=sys.stderr)
                    return 2
            params = params_from_hf_state_dict(model.state_dict(), cfg)
        except Exception as e:  # bad path / incompatible checkpoint
            print(f"error: cannot load HF checkpoint {args.src!r}: {e}",
                  file=sys.stderr)
            return 2
    else:
        from vit_tpu.io.load_any import load_params_any

        try:
            params = load_params_any(
                args.src, cfg, round_to_6dp=not args.no_round6,
                allow_synth=args.allow_synth_weights,
            )
        except (ValueError, KeyError, FileNotFoundError, RuntimeError) as e:
            # KeyError: incompatible .pth state dict; RuntimeError:
            # corrupt torch file — all client errors, not tracebacks
            print(f"error: {e}", file=sys.stderr)
            return 2

    fmt = args.format
    if fmt is None:
        dst = str(args.dst).lower()  # .NPZ etc. from case-insensitive fs
        if dst.endswith(".npz"):
            fmt = "npz"
        elif dst.endswith((".pth", ".pt")):
            fmt = "pth"
        else:
            fmt = "reference"

    try:
        if fmt == "npz":
            ckpt.save_npz(params, args.dst)
        elif fmt == "orbax":
            ckpt.save_orbax(params, args.dst)
        elif fmt == "pth":
            # torchvision-loadable state dict: the outbound half of the .pth
            # interop (ingest is io/torch_convert.load_pth via load_any)
            from vit_tpu.io.torch_convert import save_pth

            save_pth(params, args.dst, cfg)
        else:
            wio.save_reference_weights(
                wio.tensors_from_params(params, cfg), args.dst, cfg
            )
    except ValueError as e:
        # e.g. distilled (DeiT) trees cannot round-trip the reference /
        # torchvision layouts — a client error, not a traceback
        print(f"error: {e}", file=sys.stderr)
        return 2
    import jax

    n = len(jax.tree.leaves(params))
    print(f"converted {args.src} -> {args.dst} ({fmt}, {n} tensors, "
          f"{cfg.name})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
