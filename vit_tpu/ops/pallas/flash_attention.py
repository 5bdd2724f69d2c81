"""Blockwise flash attention (online softmax) for long sequences.

The single-tile VMEM attention (attention_kernel.py / fused_block.py) is
optimal for ViT's short sequences (197-577 tokens) because the whole (T, T)
score tile fits on-chip.  Past ~1-2k tokens that stops being true; this
kernel is the classic flash-attention formulation: Q is blocked over the
grid, K/V are streamed block-by-block with a running (max, sum, output)
triple, so VMEM usage is O(block_q * block_k) regardless of T.

Numerics: scores and softmax statistics in fp32; the 1/sqrt(dh) scale is
folded into Q; rescaling uses exp(m_old - m_new) correction (never
materializing unnormalized sums larger than one block).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_kernel(
    q_ref, k_ref, v_ref, out_ref, m_scr, l_scr, acc_scr, *, scale, block_k, t_total
):
    # grid: (bh, q_blocks, k_blocks); k is the innermost (fastest) axis
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)  # (bq, dh)
    k = k_ref[0]  # (bk, dh)
    v = v_ref[0]
    k_start = kb * block_k
    # zero padded K/V rows of the (ragged) final block: padding is
    # unspecified, and 0 * garbage in p @ v would poison every output row
    vrow = jax.lax.broadcasted_iota(jnp.int32, v.shape, dimension=0) + k_start
    v = jnp.where(vrow < t_total, v, 0).astype(v.dtype)
    from vit_tpu.ops.pallas.fused_block import dot_precision

    prec = dot_precision(q_ref.dtype)  # fp32 dots must pin HIGHEST on MXU
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )  # (bq, bk)

    # mask out-of-range key columns
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1) + k_start
    s = jnp.where(col < t_total, s, -jnp.inf)

    m_prev = m_scr[:]  # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    correction = jnp.exp(m_prev - m_new)
    l_new = l_scr[:] * correction + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * correction + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32,
        precision=prec,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kb == nk - 1)
    def _finalize():
        out_ref[0] = (acc_scr[:] * (1.0 / l_scr[:])).astype(out_ref.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """softmax(Q K^T / sqrt(dh)) V for (..., T, dh), O(block^2) VMEM."""
    if interpret is None:
        from vit_tpu.ops.pallas import interpret_default

        interpret = interpret_default()

    *lead, t, dh = q.shape
    bh = 1
    for s in lead:
        bh *= s
    q3, k3, v3 = (a.reshape(bh, t, dh) for a in (q, k, v))
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    scale = 1.0 / (dh**0.5)
    grid = (bh, pl.cdiv(t, block_q), pl.cdiv(t, block_k))

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, t_total=t
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, dh), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, dh), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, dh), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dh), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, dh), jnp.float32),  # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * dh,
            bytes_accessed=4 * bh * t * dh * q.dtype.itemsize,
            transcendentals=bh * t * t,
        ),
        interpret=interpret,
    )(q3, k3, v3)
    return out.reshape(*lead, t, dh)
