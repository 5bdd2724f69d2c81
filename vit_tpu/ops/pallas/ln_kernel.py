"""Fused LayerNorm Pallas kernel.

Replaces the reference's layer_norm_kernel (kernel.cl:6-80): a 256-thread
workgroup per token doing twin (Σx, Σx²) tree reductions in local memory,
launched once per LN call with full HBM round-trips (ViT_opencl.c:233-291).
Here: rows are tiled into VMEM blocks, statistics are computed in fp32 on
the VPU in one pass, and eps sits inside the rsqrt (the reference CPU
convention, ViT_seq.c:115; its GPU kernel dropped eps — a bug we don't
reproduce).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    out = centered * inv * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(
        jnp.float32
    )
    out_ref[:] = out.astype(out_ref.dtype)


def layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-6,
    block_rows: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """LayerNorm over the last axis; any leading shape."""
    if interpret is None:
        from vit_tpu.ops.pallas import interpret_default

        interpret = interpret_default()

    orig_shape = x.shape
    d = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    block_rows = min(block_rows, rows)

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, d), bias.reshape(1, d))
    return out.reshape(orig_shape)
