"""Pallas TPU kernels — the replacement for the reference's kernel.cl.

Mapping (SURVEY.md §2.2):
  - ``layer_norm``   replaces layer_norm_kernel (kernel.cl:6-80): one fused
    VPU pass instead of twin tree-reductions in local memory; eps is applied
    (the reference GPU kernel dropped it, kernel.cl:63 — we follow the CPU
    convention).
  - ``flash_attention`` replaces the per-head GEMM→softmax→GEMM event chain
    (ViT_opencl.c:546-564 + MHA_gemm_kernel/softmax_reduction_kernel): one
    kernel per (batch, head), scores live entirely in VMEM, softmax in fp32,
    nothing T² ever touches HBM.
  - ``mlp`` replaces fc1_kernel→gelu_kernel→fc2_kernel (kernel.cl:374-503):
    both GEMMs and the GELU fused in one kernel, weights VMEM-resident,
    rows streamed.

Each kernel runs in interpreter mode off-TPU so the parity tests execute on
the CPU mesh.
"""

import jax

from vit_tpu.ops import reference
from vit_tpu.ops.dispatch import OpsImpl
from vit_tpu.ops.pallas.ln_kernel import layer_norm
from vit_tpu.ops.pallas.attention_kernel import attention, scaled_dot_product_attention
from vit_tpu.ops.pallas.mlp_kernel import mlp
from vit_tpu.ops.pallas.fused_block import fused_encoder_block
from vit_tpu.ops.pallas.flash_attention import flash_attention


def interpret_default() -> bool:
    """Pallas kernels compile natively on TPU, interpret elsewhere."""
    return jax.default_backend() != "tpu"


PALLAS_OPS = OpsImpl(
    name="pallas",
    layer_norm=layer_norm,
    attention=attention,
    mlp=mlp,
    patch_embed=reference.patch_embed,  # one large GEMM — XLA is already optimal
)

# Megakernel path: the whole encoder block as three fused Pallas kernels
# (LN1+QKV / attention+out_proj+residual / LN2+MLP+residual).
FUSED_OPS = OpsImpl(
    name="fused",
    layer_norm=layer_norm,
    attention=attention,
    mlp=mlp,
    patch_embed=reference.patch_embed,
    encoder_block=fused_encoder_block,
)

# Trainable fused path: Pallas forward + hand-written backward kernels at
# native sequence lengths; blockwise flash-attention VJP past
# VMEM_ATTENTION_MAX_T (pallas_call has no auto-VJP; both carry custom ones).
from vit_tpu.ops.pallas.trainable import (
    encoder_block_train,
    encoder_block_trainable,
    fused_encoder_block_trainable,
)

# Ops outside the encoder blocks (final LN, etc.) must stay differentiable
# jnp — only the block megakernel carries the custom VJP.
# encoder_block_train is the regularized twin: dropout + stochastic depth
# inside the kernels, backed by mask-regenerating backward megakernels.
TRAINABLE_FUSED_OPS = OpsImpl(
    name="fused_train",
    layer_norm=reference.layer_norm,
    attention=reference.attention,
    mlp=reference.mlp,
    patch_embed=reference.patch_embed,
    encoder_block=encoder_block_trainable,
    encoder_block_train=encoder_block_train,
)

# W8A8 path: int8 QKV/MLP GEMMs (2x MXU rate on v5e), bf16 attention core.
from vit_tpu.ops.pallas.quant_kernels import fused_encoder_block_q8

QUANT_OPS = OpsImpl(
    name="quant",
    layer_norm=layer_norm,
    attention=attention,
    mlp=mlp,
    patch_embed=reference.patch_embed,
    encoder_block=fused_encoder_block_q8,
)

__all__ = [
    "PALLAS_OPS",
    "FUSED_OPS",
    "QUANT_OPS",
    "TRAINABLE_FUSED_OPS",
    "layer_norm",
    "attention",
    "mlp",
    "fused_encoder_block",
    "fused_encoder_block_q8",
    "flash_attention",
    "interpret_default",
]
