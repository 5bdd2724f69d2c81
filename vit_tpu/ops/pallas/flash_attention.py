"""Blockwise flash attention (online softmax) for long sequences — with VJP.

The single-tile VMEM attention (attention_kernel.py / fused_block.py) is
optimal for ViT's short sequences (197-577 tokens) because the whole (T, T)
score tile fits on-chip.  Past ~1-2k tokens that stops being true; this
kernel is the classic flash-attention formulation: Q is blocked over the
grid, K/V are streamed block-by-block with a running (max, sum, output)
triple, so VMEM usage is O(block_q * block_k) regardless of T.  It replaces
the reference's materialized per-head (T, T) score buffers
(/root/reference/ViT_opencl.c:523-532) for resolutions the reference could
never reach.

Numerics: scores and softmax statistics in fp32; the 1/sqrt(dh) scale is
folded into Q; rescaling uses exp(m_old - m_new) correction (never
materializing unnormalized sums larger than one block).

Training: ``flash_attention`` carries a custom VJP whose backward is two
blockwise Pallas kernels (dK/dV with K outer / Q streamed, then dQ with Q
outer / K streamed).  The forward saves only O and the per-row logsumexp
L = m + log(l); each backward block recomputes its probabilities as
p = exp(s - L) in VMEM — nothing (T, T) ever touches HBM in either
direction.  D = rowsum(dO * O) is a cheap XLA elementwise reduce outside
the kernels.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_kernel(
    q_ref, k_ref, v_ref, *rest, scale, block_k, t_total
):
    # grid: (bh, q_blocks, k_blocks); k is the innermost (fastest) axis
    if len(rest) == 5:  # training forward: (out, lse) + 3 scratches
        out_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        out_ref, m_scr, l_scr, acc_scr = rest
        lse_ref = None
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
        if lse_ref is not None:
            lse_ref[0] = m_scr[:] + jnp.log(l_scr[:])


def _flash_forward(q3, k3, v3, block_q, block_k, interpret, save_lse):
    """(bh, t, dh) flash forward.  Returns (out, lse|None); lse is the fp32
    per-row logsumexp (bh, t, 1) saved for the backward."""
    bh, t, dh = q3.shape
    scale = 1.0 / (dh**0.5)
    grid = (bh, pl.cdiv(t, block_q), pl.cdiv(t, block_k))

    out_specs = [
        pl.BlockSpec(
            (1, block_q, dh), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        )
    ]
    out_shape = [jax.ShapeDtypeStruct((bh, t, dh), q3.dtype)]
    if save_lse:
        out_specs.append(
            pl.BlockSpec(
                (1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((bh, t, 1), jnp.float32))

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
        out_specs=tuple(out_specs) if save_lse else out_specs[0],
        out_shape=tuple(out_shape) if save_lse else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, dh), jnp.float32),  # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * dh,
            bytes_accessed=4 * bh * t * dh * q3.dtype.itemsize,
            transcendentals=bh * t * t,
        ),
        interpret=interpret,
    )(q3, k3, v3)
    if save_lse:
        return out[0], out[1]
    return out, None


# -- backward -----------------------------------------------------------------


def _recompute_probs(q_ref, k_ref, v_ref, lse_ref, q_start, k_start, t_total, scale):
    """Re-derive this block pair's softmax probabilities in VMEM:
    p = exp(q k^T * scale - L), rows/cols beyond t_total zeroed.
    Returns (p fp32, q_scaled, k, v, row_valid): q_scaled is q * scale and
    k/v are the K/V tiles, all with padded rows zeroed — padding is
    unspecified (NaN under interpret), and a single NaN times a zeroed
    probability still poisons every dot it reaches."""
    from vit_tpu.ops.pallas.fused_block import dot_precision

    prec = dot_precision(q_ref.dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[1], 1), 0) + q_start
    row_valid = row < t_total
    q = jnp.where(row_valid, q_ref[0], 0) * jnp.asarray(scale, q_ref.dtype)
    krow = (
        jax.lax.broadcasted_iota(jnp.int32, (k_ref.shape[1], 1), 0) + k_start
    ) < t_total
    k = jnp.where(krow, k_ref[0], 0)
    v = jnp.where(krow, v_ref[0], 0)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )  # (bq, bk)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + k_start
    # padded q rows read garbage lse -> exp may produce inf/nan; the
    # where() select drops them before anything can reach an accumulator
    p = jnp.exp(s - lse_ref[0])
    p = jnp.where(jnp.logical_and(row_valid, col < t_total), p, 0.0)
    return p, q, k, v, row_valid


def _flash_bwd_dkv_kernel(
    q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
    dk_ref, dv_ref, dk_scr, dv_scr, *, scale, block_q, block_k, t_total
):
    # grid: (bh, k_blocks, q_blocks); q innermost — dk/dv accumulate in
    # fp32 VMEM scratch across the q stream, flushed on the last q block
    from vit_tpu.ops.pallas.fused_block import dot_precision

    qb = pl.program_id(2)
    nq = pl.num_programs(2)
    kb = pl.program_id(1)

    @pl.when(qb == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    cdtype = q_ref.dtype
    prec = dot_precision(cdtype)
    p, q_scaled, k, v, row_valid = _recompute_probs(
        q_ref, k_ref, v_ref, lse_ref, qb * block_q, kb * block_k, t_total, scale
    )
    do = jnp.where(row_valid, do_ref[0].astype(jnp.float32), 0.0)
    delta = jnp.where(row_valid, delta_ref[0], 0.0)
    do_c = do.astype(cdtype)
    p_c = p.astype(cdtype)
    # dV_j += P^T dO_i
    dv_scr[:] += jax.lax.dot_general(
        p_c, do_c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    # dP = dO V^T ; dS = P * (dP - D)
    dp = jax.lax.dot_general(
        do_c, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    ds = p * (dp - delta)
    # dK_j += dS^T (Q_i * scale)   (scale already folded into q_scaled)
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(cdtype), q_scaled, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(qb == nq - 1)
    def _flush():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
    dq_ref, dq_scr, *, scale, block_q, block_k, t_total
):
    # grid: (bh, q_blocks, k_blocks); k innermost — dq accumulates in fp32
    # VMEM scratch across the k stream
    from vit_tpu.ops.pallas.fused_block import dot_precision

    kb = pl.program_id(2)
    nk = pl.num_programs(2)
    qb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    cdtype = q_ref.dtype
    prec = dot_precision(cdtype)
    p, _, k, v, row_valid = _recompute_probs(
        q_ref, k_ref, v_ref, lse_ref, qb * block_q, kb * block_k, t_total, scale
    )
    do = jnp.where(row_valid, do_ref[0].astype(jnp.float32), 0.0)
    delta = jnp.where(row_valid, delta_ref[0], 0.0)
    dp = jax.lax.dot_general(
        do.astype(cdtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    ds = p * (dp - delta)
    # dQ_i += dS K_j   (the 1/sqrt(dh) scale is applied once, at the flush)
    dq_scr[:] += jnp.dot(
        ds.astype(cdtype), k, preferred_element_type=jnp.float32,
        precision=prec,
    )

    @pl.when(kb == nk - 1)
    def _flush():
        dq_ref[0] = (dq_scr[:] * scale).astype(dq_ref.dtype)


def flash_attention_bwd(
    q3, k3, v3, out, lse, do, block_q, block_k, interpret
):
    """Blockwise VJP of the flash forward: (dq, dk, dv), each (bh, t, dh).

    Standard FlashAttention-2 backward: D = rowsum(dO * O) per row (cheap
    XLA reduce), then one kernel accumulating dK/dV over the Q stream and
    one accumulating dQ over the K stream, both recomputing p = exp(s - L)
    blockwise in VMEM."""
    from vit_tpu.ops.pallas.fused_block import _VMEM_LIMIT

    bh, t, dh = q3.shape
    scale = 1.0 / (dh**0.5)
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # (bh, t, 1)

    qblk = lambda w: pl.BlockSpec(  # noqa: E731
        (1, block_q, w), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
    )
    kblk = lambda w: pl.BlockSpec(  # noqa: E731
        (1, block_k, w), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=5 * bh * t * t * dh,
        bytes_accessed=6 * bh * t * dh * q3.dtype.itemsize,
        transcendentals=bh * t * t,
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, block_q=block_q,
            block_k=block_k, t_total=t,
        ),
        grid=(bh, pl.cdiv(t, block_k), pl.cdiv(t, block_q)),
        in_specs=[qblk(dh), qblk(dh), qblk(1), qblk(1), kblk(dh), kblk(dh)],
        out_specs=(kblk(dh), kblk(dh)),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, dh), k3.dtype),
            jax.ShapeDtypeStruct((bh, t, dh), v3.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, dh), jnp.float32),
            pltpu.VMEM((block_k, dh), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
        cost_estimate=cost,
        interpret=interpret,
    )(q3, do, lse, delta, k3, v3)

    qblk2 = lambda w: pl.BlockSpec(  # noqa: E731
        (1, block_q, w), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
    )
    kblk2 = lambda w: pl.BlockSpec(  # noqa: E731
        (1, block_k, w), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
    )
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, block_q=block_q,
            block_k=block_k, t_total=t,
        ),
        grid=(bh, pl.cdiv(t, block_q), pl.cdiv(t, block_k)),
        in_specs=[qblk2(dh), qblk2(dh), qblk2(1), qblk2(1), kblk2(dh), kblk2(dh)],
        out_specs=qblk2(dh),
        out_shape=jax.ShapeDtypeStruct((bh, t, dh), q3.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dh), jnp.float32)],
        compiler_params=_VMEM_LIMIT,
        cost_estimate=cost,
        interpret=interpret,
    )(q3, do, lse, delta, k3, v3)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention3(q3, k3, v3, block_q, block_k, interpret):
    out, _ = _flash_forward(q3, k3, v3, block_q, block_k, interpret, False)
    return out


def _fa_fwd(q3, k3, v3, block_q, block_k, interpret):
    out, lse = _flash_forward(q3, k3, v3, block_q, block_k, interpret, True)
    return out, (q3, k3, v3, out, lse)


def _fa_bwd(block_q, block_k, interpret, residuals, g):
    q3, k3, v3, out, lse = residuals
    return flash_attention_bwd(
        q3, k3, v3, out, lse, g, block_q, block_k, interpret
    )


_flash_attention3.defvjp(_fa_fwd, _fa_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """softmax(Q K^T / sqrt(dh)) V for (..., T, dh), O(block^2) VMEM.

    Differentiable: jax.grad through this runs the blockwise Pallas
    backward kernels (flash_attention_bwd), never materializing (T, T)."""
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
    out = _flash_attention3(q3, k3, v3, block_q, block_k, interpret)
    return out.reshape(*lead, t, dh)


def flash_context_from_packed_qkv(
    qkv: jax.Array,
    batch: int,
    seq_len: int,
    num_heads: int,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Packed QKV projection → flash-attention context, flat rows out.

    ``qkv`` is the QKV GEMM output in the weights pytree's packed
    (head, {q,k,v}, head_dim) column order — any leading shape whose last
    axis is 3*num_heads*head_dim.  Returns (batch*seq_len,
    num_heads*head_dim).  This is the shared tail of every long-sequence
    block (fp fused, trainable, q8, and tensor-parallel): one place for
    the unpack/transpose dance so the four paths cannot drift apart when
    the packing or masking changes.  Differentiable (flash_attention's
    Pallas VJP)."""
    dh = qkv.shape[-1] // (3 * num_heads)
    qkv = qkv.reshape(batch, seq_len, num_heads, 3, dh)
    q = jnp.moveaxis(qkv[..., 0, :], -2, -3)  # (b, H, T, Dh)
    k = jnp.moveaxis(qkv[..., 1, :], -2, -3)
    v = jnp.moveaxis(qkv[..., 2, :], -2, -3)
    ctx = flash_attention(q, k, v, interpret=interpret)
    return jnp.moveaxis(ctx, -3, -2).reshape(batch * seq_len, num_heads * dh)
