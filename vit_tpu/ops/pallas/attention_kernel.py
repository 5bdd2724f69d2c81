"""Flash-attention Pallas kernel (VMEM-resident scores).

Replaces the reference's per-head attention pipeline: 36 event-chained
kernel launches per layer (12 heads x [scaled QK^T GEMM -> 3-phase softmax
-> S@V GEMM], ViT_opencl.c:546-564) with twelve 197x197 score buffers
materialized in global memory (ViT_opencl.c:523-532).

TPU-first design: ViT sequences are short (197 @224, 577 @384), so the
whole (T, T) score tile of one (batch, head) pair fits comfortably in VMEM.
One kernel program per (batch*head): QK^T on the MXU with fp32 accumulation,
max-subtracted softmax on the VPU in fp32 (never leaving VMEM), then S@V on
the MXU.  Nothing quadratic ever touches HBM — the fusion the reference's
event chain approximates is structural here.

For long sequences a blockwise online-softmax variant would be needed; for
the ViT family this single-tile form is both simpler and faster.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops import reference


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float):
    from vit_tpu.ops.pallas.fused_block import dot_precision

    prec = dot_precision(q_ref.dtype)  # fp32 dots must pin HIGHEST on MXU
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)  # fold 1/sqrt(Dh) into Q
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),  # Q @ K^T
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    inv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)  # reciprocal-multiply
    p = (p * inv).astype(v.dtype)
    out_ref[0] = jnp.dot(
        p, v, preferred_element_type=jnp.float32, precision=prec
    ).astype(out_ref.dtype)


def scaled_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """softmax(Q K^T / sqrt(Dh)) V for (..., H, T, Dh) inputs."""
    if interpret is None:
        from vit_tpu.ops.pallas import interpret_default

        interpret = interpret_default()

    *lead, t, dh = q.shape
    from vit_tpu.ops.pallas.fused_block import VMEM_ATTENTION_MAX_T

    if t > VMEM_ATTENTION_MAX_T:
        # past the single-tile VMEM budget, compose the blockwise
        # online-softmax kernel instead (same switch the fused block makes)
        from vit_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, interpret=interpret)
    bh = 1
    for s in lead:
        bh *= s
    q3 = q.reshape(bh, t, dh)
    k3 = k.reshape(bh, t, dh)
    v3 = v.reshape(bh, t, dh)
    scale = 1.0 / math.sqrt(dh)

    from vit_tpu.ops.pallas.fused_block import _VMEM_LIMIT

    spec = pl.BlockSpec((1, t, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, t, dh), q.dtype),
        # fp32 near the T=1024 ceiling holds ~12 MB of T^2 temps — past
        # the 16 MB default scoped-VMEM budget once q/k/v blocks join it
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * dh,
            bytes_accessed=4 * bh * t * dh * q.dtype.itemsize,
            transcendentals=bh * t * t,
        ),
        interpret=interpret,
    )(q3, k3, v3)
    return out.reshape(*lead, t, dh)


def attention(
    x: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    num_heads: int,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in for vit_tpu.ops.reference.attention with the Pallas core.

    The QKV and output projections stay as single large XLA GEMMs (they are
    MXU-optimal as-is); the Pallas kernel owns everything quadratic.
    """
    *lead, t, d = x.shape
    head_dim = d // num_heads
    qkv = reference.linear(x, wqkv, bqkv)  # (..., T, 3D), columns (H, 3, Dh)
    qkv = qkv.reshape(*lead, t, num_heads, 3, head_dim)
    q = jnp.moveaxis(qkv[..., 0, :], -2, -3)  # (..., H, T, Dh)
    k = jnp.moveaxis(qkv[..., 1, :], -2, -3)
    v = jnp.moveaxis(qkv[..., 2, :], -2, -3)
    ctx = scaled_dot_product_attention(q, k, v, interpret=interpret)
    ctx = jnp.moveaxis(ctx, -3, -2).reshape(*lead, t, d)
    return reference.linear(ctx, wo, bo)
