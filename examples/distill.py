#!/usr/bin/env python
"""DeiT knowledge distillation with the library API.

A miniature of ``vit-tpu-train --distill-teacher`` (cli/train_setup.py
builds the same pieces from flags): a frozen teacher's forward runs inside
the student's step jit; the student's CLS head trains on the labels, its
distillation head on the teacher (hard distillation, Touvron et al. 2021).
At the end the two heads average into one classifier (vit.apply_head —
HF DeiTForImageClassificationWithTeacher eval semantics).

    python examples/distill.py --cpu
    python examples/distill.py --alpha 1.0     # pure KD: learn ONLY the teacher
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import dataclasses


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--alpha", type=float, default=0.5,
                    help="(1-a)*CE(cls, labels) + a*KD(dist, teacher)")
    ap.add_argument("--soft", action="store_true",
                    help="soft KD (temperature KL) instead of hard argmax CE")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from vit_tpu.config import DEIT_T_16
    from vit_tpu.models import vit
    from vit_tpu.runtime import trainer

    # Tiny distilled student + an even smaller frozen "teacher" so the
    # example runs in seconds; in a real run the teacher comes from any
    # checkpoint source (load_params_any) at full scale.
    student_cfg = dataclasses.replace(
        DEIT_T_16, depth=2, embed_dim=64, num_heads=4, image_size=32,
        patch_size=16, num_classes=5, name="deit_example",
    )
    teacher_cfg = dataclasses.replace(
        student_cfg, distilled=False, depth=1, name="teacher_example"
    )
    teacher = vit.init_params(jax.random.key(7), teacher_cfg)

    def teacher_fwd(x):  # frozen: runs under stop_gradient inside the jit
        return vit.forward(teacher, x, teacher_cfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(32, 3, student_cfg.image_size,
                         student_cfg.image_size)), jnp.float32
    )
    y = jnp.asarray(np.arange(32) % student_cfg.num_classes, jnp.int32)
    teacher_labels = np.asarray(teacher_fwd(x)).argmax(-1)

    optimizer = optax.adam(3e-3)
    params, opt_state = trainer.init_train_state(
        jax.random.key(0), student_cfg, optimizer
    )
    step = jax.jit(
        trainer.make_distill_train_step(
            student_cfg, optimizer, teacher_fwd,
            alpha=args.alpha, hard=not args.soft, remat=False,
        )
    )

    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, x, y)
        if (i + 1) % 10 == 0:
            print(f"step {i + 1}: loss {float(loss):.4f}")

    cls_logits, dist_logits = vit.forward(
        params, x, student_cfg, separate_heads=True
    )
    agree = float(
        (np.asarray(dist_logits).argmax(-1) == teacher_labels).mean()
    )
    avg = np.asarray(vit.forward(params, x, student_cfg))  # deployed head
    acc = float((avg.argmax(-1) == np.asarray(y)).mean())
    print(f"dist-head agreement with the teacher: {agree:.2f}")
    print(f"averaged-head train top-1 vs labels:  {acc:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
