#!/usr/bin/env python
"""Fine-tune / train with the library API and round-trip a checkpoint.

A miniature of what ``vit-tpu-train`` does (cli/train_setup.py builds the
same pieces from flags): build a train step, run it, checkpoint to .npz,
reload, and evaluate.  Synthetic data keeps it runnable anywhere; swap in
``io.dataset.ImageFolderDataset`` / ``--data-dir`` streams for real runs
(docs/usage.md §6).

    python examples/finetune.py --cpu
    python examples/finetune.py --ops fused_train   # TPU megakernel path
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import dataclasses
import tempfile


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default="xla",
                    help="xla | fused_train (TPU) | qat (int8-aware)")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from vit_tpu.config import VIT_B_16
    from vit_tpu.io import checkpoint
    from vit_tpu.models import vit
    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.runtime import trainer

    # A small config so the example converges in seconds; drop the
    # `replace` to train the real B/16 (or start `params` from any loaded
    # checkpoint for transfer learning — see vit-tpu-train --num-classes).
    cfg = dataclasses.replace(
        VIT_B_16, depth=2, embed_dim=64, num_heads=4, image_size=32,
        patch_size=16, num_classes=5, name="vit_example",
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 3, cfg.image_size, cfg.image_size)),
                    jnp.float32)
    y = jnp.asarray(np.arange(32) % cfg.num_classes, jnp.int32)

    optimizer = optax.adamw(3e-3)  # warmup-cosine etc.: see cli/train_args.py
    params, opt_state = trainer.init_train_state(
        jax.random.key(0), cfg, optimizer
    )
    step = jax.jit(
        trainer.make_train_step(cfg, optimizer, get_ops(args.ops), remat=False)
    )

    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, x, y)
        if (i + 1) % 10 == 0:
            print(f"step {i + 1}: loss {float(loss):.4f}")

    # checkpoint round-trip (npz; Orbax / reference Weight_*.bin / .pth
    # exports live in io.checkpoint / io.weights / io.torch_convert)
    out = Path(tempfile.mkdtemp()) / "model.npz"
    checkpoint.save_npz(params, out)
    restored = checkpoint.load_npz(out)

    logits = jax.jit(vit.logits_fn(cfg))(restored, x)
    acc = float((np.asarray(logits).argmax(-1) == np.asarray(y)).mean())
    print(f"train top-1 after {args.steps} steps (reloaded ckpt): {acc:.2f}")
    return 0 if acc >= 0.9 else 1


if __name__ == "__main__":
    raise SystemExit(main())
