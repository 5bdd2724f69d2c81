"""Op dispatch: select the jnp reference path or the Pallas TPU kernels.

Preserves the reference's dual-implementation architecture (ViT_seq vs
ViT_opencl sharing one model structure, SURVEY.md §1 L2) the TPU-native way:
one functional model parameterized by an op table, instead of two copied
forward passes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

from vit_tpu.ops import reference


@dataclasses.dataclass(frozen=True)
class OpsImpl:
    """The pluggable op table consumed by ``vit_tpu.models.vit``.

    ``encoder_block``, when set, replaces the whole per-layer composition
    with a fused implementation of signature
    ``(x2d, blk, num_heads, seq_len, eps, gelu_variant) -> x2d``
    on a flat (B*T, D) activation (the Pallas megakernel path).
    """

    name: str
    layer_norm: Callable
    attention: Callable
    mlp: Callable
    patch_embed: Callable
    encoder_block: Optional[Callable] = None
    # Regularized fused block for training recipes: signature
    # ``(x2d, blk, num_heads, seq_len, eps, gelu_variant, seed, dropout_p,
    # drop_path_rate) -> x2d`` — dropout + stochastic depth applied inside
    # the kernels (masks regenerated from the per-layer uint32 seed).
    encoder_block_train: Optional[Callable] = None


REFERENCE_OPS = OpsImpl(
    name="xla",
    layer_norm=reference.layer_norm,
    attention=reference.attention,
    mlp=reference.mlp,
    patch_embed=reference.patch_embed,
)


def get_ops(impl: str = "xla") -> OpsImpl:
    """Return the op table for ``impl`` ∈ {'xla', 'pallas', 'fused',
    'quant', 'fused_train', 'qat'}.

    'xla' is the pure-jnp reference (oracle) path.  'pallas' is the
    PER-OP kernel tier (one Pallas kernel per layer op) — a DEBUGGING
    surface for isolating a kernel regression against the fused paths,
    not a production path: it is dp-only (no tensor-parallel dispatch)
    and has no regularizer hooks.  Production kernel paths are 'fused'
    (inference megakernels), 'quant' (W8A8), and 'fused_train'
    (megakernels + hand-written backward, in-kernel dropout/DropPath).
    Imported lazily so CPU-only use never touches Pallas.
    """
    if impl == "xla":
        return REFERENCE_OPS
    if impl == "pallas":
        from vit_tpu.ops import pallas  # lazy: TPU-only dependency path

        return pallas.PALLAS_OPS
    if impl == "fused":
        from vit_tpu.ops import pallas

        return pallas.FUSED_OPS
    if impl == "quant":
        from vit_tpu.ops import pallas

        return pallas.QUANT_OPS
    if impl == "fused_train":
        from vit_tpu.ops import pallas

        return pallas.TRAINABLE_FUSED_OPS
    if impl == "qat":
        from vit_tpu.ops import qat  # fake-int8 forward, STE backward

        return qat.QAT_OPS
    raise ValueError(
        f"unknown ops impl {impl!r}; expected 'xla', 'pallas', 'fused', "
        "'fused_train', 'qat', or 'quant'"
    )
