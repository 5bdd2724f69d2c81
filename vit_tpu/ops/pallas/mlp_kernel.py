"""Fused MLP (Linear -> GELU -> Linear) Pallas kernel.

Replaces the reference's fc1_kernel -> gelu_kernel -> fc2_kernel sequence
(kernel.cl:374-503; host wrapper ViT_opencl.c:607-729): three kernel
launches with the 3072-wide hidden activation written to and re-read from
global memory.  Here both GEMMs and the GELU run in one kernel: weights stay
VMEM-resident across the whole row stream (their BlockSpec index is
constant, so Mosaic fetches them once), the hidden block lives only in
registers/VMEM, and rows are tiled to keep the MXU saturated.

GELU uses the exact-erf form (reference CPU convention, ViT_seq.c:232) or
the tanh approximation (reference GPU kernel, kernel.cl:442-443) — both
computed in fp32 between the fp32-accumulated GEMMs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops import reference


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7): Pallas TPU has no
    native erf lowering, so the 'exact'-GELU variant implements its own."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, gelu_variant):
    # function-level import: fused_block imports this module's _erf, so a
    # module-level import here would cycle; fused_block owns the shared
    # GELU/precision helpers (one source of truth)
    from vit_tpu.ops.pallas.fused_block import (
        _gelu,
        dot_precision,
        use_fast_erf,
    )

    x = x_ref[:]
    prec = dot_precision(x.dtype)  # fp32 dots must pin HIGHEST on MXU
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
    h = h + b1_ref[:].astype(jnp.float32)
    h = _gelu(h, gelu_variant, fast_erf=use_fast_erf(x.dtype))
    h = h.astype(x.dtype)
    out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32,
                  precision=prec)
    out = out + b2_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def mlp(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    gelu_variant: str = "exact",
    block_rows: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """GELU MLP over the last axis; any leading shape.

    Args:
      x: (..., D); w1 (D, F), b1 (F,), w2 (F, D), b2 (D,).
      block_rows: token rows per grid step.  VMEM budget at B/16 scale:
        W1+W2 bf16 ~9.4 MB (resident) + x/h/out blocks ~3 MB at 512 rows.
    """
    if interpret is None:
        from vit_tpu.ops.pallas import interpret_default

        interpret = interpret_default()

    orig_shape = x.shape
    d = orig_shape[-1]
    f = w1.shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    block_rows = min(block_rows, rows)

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, gelu_variant=gelu_variant),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d * f,
            bytes_accessed=(2 * rows * d + 2 * d * f) * x.dtype.itemsize,
            transcendentals=rows * f,
        ),
        # fp32 weights + HIGHEST-precision dots exceed the 16 MB default
        # scoped-VMEM budget at B/16 scale (W1+W2 fp32 = 18.9 MB resident)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(x2, w1, b1.reshape(1, f), w2, b2.reshape(1, d))
    return out.reshape(orig_shape)
