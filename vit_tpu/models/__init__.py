"""Model layer: the functional ViT graph (replaces ViT_seq.c:271-439 and
ViT_opencl.c:732-883 — SURVEY.md §1 L3)."""

from vit_tpu.models.vit import (
    Params,
    forward,
    init_params,
    logits_fn,
    num_params,
)

__all__ = ["Params", "forward", "init_params", "logits_fn", "num_params"]
