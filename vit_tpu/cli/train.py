"""Training driver CLI.

The reference is inference-only; this driver completes the framework: a
sharded (dp x tp, optionally pp/sp) cross-entropy training loop with
rematerialization, running on whatever devices are present (real chips or
the virtual CPU mesh).  Data is an input-100.bin-format batch plus an
int32 label file, an ImageNet-style folder tree, or synthetic.

Usage::

    vit-tpu-train --config vit_b_16 --steps 20 --batch 32 --tp 2

Structure (split for maintainability): flag definitions in
cli/train_args.py, run construction (mesh/ops/optimizer/params/step/data/
eval) in cli/train_setup.py, the step loop + checkpointing in
cli/train_loop.py.
"""

from __future__ import annotations

import sys

from vit_tpu.cli.train_args import build_parser

__all__ = ["build_parser", "main"]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from vit_tpu.cli import train_loop
    from vit_tpu.cli.train_setup import SetupError, prepare

    try:
        setup = prepare(args)
    except SetupError as e:
        print(str(e), file=sys.stderr)
        return e.code
    return train_loop.run(args, setup)


if __name__ == "__main__":
    sys.exit(main())
