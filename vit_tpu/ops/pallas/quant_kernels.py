"""W8A8 fused Pallas kernels (int8 weights, dynamic int8 activations).

v5e's MXU runs int8 x int8 -> int32 at twice the bf16 rate, so the two
big GEMM groups (QKV projection, MLP) get int8 twins of the fused-block
kernels: LN and GELU stay fp32 on the VPU, activations are quantized
per-row on the fly inside the kernel, and the int32 accumulator is
dequantized with the rank-1 scale product before the epilogue.  Attention
(small FLOP share, accuracy-sensitive) stays bf16.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.fused_block import (
    _VMEM_LIMIT,
    _gelu,
    _head_context,
    _ln,
    use_fast_erf,
)


def _quant_rows(h):
    """fp32 (M, K) -> int8 values + fp32 (M, 1) scales (symmetric per-row)."""
    absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(h / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _qkv_q8(x, ln_scale, ln_bias, wq, ws, bias, eps):
    """LN -> per-row dynamic int8 quant -> int8 QKV GEMM -> dequant + bias
    (fp32 out).  The one definition of the W8A8 QKV grouping — shared by
    the kernel-A twin below and the jnp long-sequence form, so they cannot
    drift."""
    h = _ln(x, ln_scale, ln_bias, eps)  # fp32
    hq, hs = _quant_rows(h)
    acc = jax.lax.dot_general(
        hq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    qkv = acc.astype(jnp.float32) * hs * ws.reshape(1, -1).astype(jnp.float32)
    return qkv + bias.reshape(1, -1).astype(jnp.float32)


def _ln_qkv_attn_q8_kernel(
    x_ref, s_ref, b_ref, wq_ref, ws_ref, bias_ref, *refs, eps, num_heads,
    scale, attn_q8, quant_pv, has_log_size=False, emit_kmean=False,
):
    # head_dim from the weight (tensor parallelism: the kernel may hold only
    # this shard's head columns; see fused_block._ln_qkv_attn_kernel)
    if has_log_size:
        ls_ref, *out_refs = refs
        log_size = ls_ref[0, 0]
    else:
        log_size, out_refs = None, list(refs)
    out_ref = out_refs[0]
    dh = wq_ref.shape[-1] // (3 * num_heads)
    qkv = _qkv_q8(
        x_ref[0], s_ref[:], b_ref[:], wq_ref[:], ws_ref[:], bias_ref[:], eps
    ).astype(x_ref.dtype)
    for hh in range(num_heads):  # shared per-head attention math
        ctx = (
            _head_context_q8(qkv, hh, dh, scale, quant_pv)
            if attn_q8
            else _head_context(qkv, hh, dh, scale, log_size)
        )
        out_ref[0, :, hh * dh : (hh + 1) * dh] = ctx.astype(out_ref.dtype)
    if emit_kmean:
        # mean attention key over heads — ToMe's similarity metric, same
        # definition as fused_block._ln_qkv_attn_kernel (the dequantized
        # qkv is the q8 path's source of truth for the keys)
        acc = qkv[:, dh : 2 * dh].astype(jnp.float32)
        for hh in range(1, num_heads):
            base = hh * 3 * dh
            acc = acc + qkv[:, base + dh : base + 2 * dh].astype(jnp.float32)
        out_refs[1][0] = (acc * (1.0 / num_heads)).astype(out_refs[1].dtype)


def _ln_qkv_attn_q8_call(
    x2d, ln_scale, ln_bias, wq, w_scale, bqkv, num_heads, seq_len, eps,
    attn_q8, quant_pv, interpret, log_size=None, return_kmean=False,
):
    """Shared pallas_call scaffold for both kernel-A int8 twins (the only
    divergence is the per-head context helper, switched by ``attn_q8``).
    ``log_size``/``return_kmean`` mirror fused_block.ln_qkv_attn's ToMe
    hooks (bias on the key logits; mean-key metric output)."""
    if attn_q8 and (log_size is not None or return_kmean):
        raise ValueError("the int8-attention study kernel has no ToMe hooks")
    rows, d = x2d.shape
    d3 = wq.shape[-1]
    d_ctx = d3 // 3
    dh = d_ctx // num_heads
    b = rows // seq_len
    scale = 1.0 / (dh ** 0.5)
    in_specs = [
        pl.BlockSpec((1, seq_len, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [
        x2d.reshape(b, seq_len, d),
        ln_scale.reshape(1, d),
        ln_bias.reshape(1, d),
        wq,
        w_scale.reshape(1, d3),
        bqkv.reshape(1, d3),
    ]
    if log_size is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, seq_len), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(log_size.astype(jnp.float32).reshape(b, 1, seq_len))
    out_specs = pl.BlockSpec(
        (1, seq_len, d_ctx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((b, seq_len, d_ctx), x2d.dtype)
    if return_kmean:
        out_specs = (
            out_specs,
            pl.BlockSpec((1, seq_len, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (out_shape, jax.ShapeDtypeStruct((b, seq_len, dh), x2d.dtype))
    out = pl.pallas_call(
        functools.partial(
            _ln_qkv_attn_q8_kernel, eps=eps, num_heads=num_heads, scale=scale,
            attn_q8=attn_q8, quant_pv=quant_pv,
            has_log_size=log_size is not None, emit_kmean=return_kmean,
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(*operands)
    if return_kmean:
        ctx, kmean = out
        return ctx.reshape(rows, d_ctx), kmean.reshape(rows, dh)
    return out.reshape(rows, d_ctx)


def ln_qkv_attn_q8(
    x2d, ln_scale, ln_bias, wq, w_scale, bqkv, num_heads, seq_len, eps,
    interpret=False, log_size=None, return_kmean=False,
):
    """int8 twin of fused_block.ln_qkv_attn: LN -> dynamic-int8 row quant ->
    int8 QKV GEMM -> dequant -> attention, all in one kernel per image.
    ``log_size``/``return_kmean`` are the ToMe hooks (models/tome.py)."""
    return _ln_qkv_attn_q8_call(
        x2d, ln_scale, ln_bias, wq, w_scale, bqkv, num_heads, seq_len, eps,
        attn_q8=False, quant_pv=True, interpret=interpret,
        log_size=log_size, return_kmean=return_kmean,
    )


def _out_ln_mlp_q8_kernel(
    ctx_ref, res_ref, wo_ref, bo_ref, s_ref, b_ref, w1q_ref, w1s_ref, b1_ref,
    w2q_ref, w2s_ref, b2_ref, out_ref, *, eps, variant,
):
    from vit_tpu.ops.pallas.fused_block import dot_precision

    x1 = jnp.dot(
        ctx_ref[:], wo_ref[:], preferred_element_type=jnp.float32,
        precision=dot_precision(ctx_ref.dtype),
    )
    x1 = x1 + bo_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
    h = _ln(x1, s_ref[:], b_ref[:], eps)
    hq, hs = _quant_rows(h)
    acc1 = jax.lax.dot_general(
        hq, w1q_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    mid = acc1.astype(jnp.float32) * hs * w1s_ref[:].astype(jnp.float32)
    mid = _gelu(
        mid + b1_ref[:].astype(jnp.float32), variant,
        fast_erf=use_fast_erf(res_ref.dtype),
    )
    mq, ms = _quant_rows(mid)
    acc2 = jax.lax.dot_general(
        mq, w2q_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc2.astype(jnp.float32) * ms * w2s_ref[:].astype(jnp.float32)
    out_ref[:] = (out + b2_ref[:].astype(jnp.float32) + x1).astype(out_ref.dtype)


def out_ln_mlp_residual_q8(
    ctx, res, wo, bo, ln_scale, ln_bias, w1q, w1s, b1, w2q, w2s, b2, eps,
    gelu_variant="exact", block_rows=128, interpret=False,
):
    """int8 twin of fused_block.out_ln_mlp_residual: fp out_proj epilogue
    chained into the W8A8 MLP; x1 never leaves VMEM."""
    rows, d_ctx = ctx.shape
    d = res.shape[-1]
    f = w1q.shape[-1]
    block_rows = min(block_rows, rows)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    rowblk = lambda w: pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_out_ln_mlp_q8_kernel, eps=eps, variant=gelu_variant),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            rowblk(d_ctx), rowblk(d),
            const((d_ctx, d)), const((1, d)),
            const((1, d)), const((1, d)),
            const((d, f)), const((1, f)), const((1, f)),
            const((f, d)), const((1, d)), const((1, d)),
        ],
        out_specs=rowblk(d),
        out_shape=jax.ShapeDtypeStruct((rows, d), res.dtype),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * d_ctx * d + 4 * rows * d * f,
            bytes_accessed=(3 * rows * d + 2 * d * f) * res.dtype.itemsize,
            transcendentals=rows * f,
        ),
        interpret=interpret,
    )(
        ctx, res,
        wo, bo.reshape(1, d),
        ln_scale.reshape(1, d), ln_bias.reshape(1, d),
        w1q, w1s.reshape(1, f), b1.reshape(1, f),
        w2q, w2s.reshape(1, d), b2.reshape(1, d),
    )


def _ln_mlp_q8_kernel(
    x_ref, s_ref, b_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref, w2s_ref, b2_ref,
    out_ref, *, eps, variant,
):
    # body shared with _out_ln_mlp_q8_kernel's MLP tail: x1 is the residual
    # input directly (no out_proj head — ToMe's merge sits between them)
    x1 = x_ref[:].astype(jnp.float32)
    h = _ln(x1, s_ref[:], b_ref[:], eps)
    hq, hs = _quant_rows(h)
    acc1 = jax.lax.dot_general(
        hq, w1q_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    mid = acc1.astype(jnp.float32) * hs * w1s_ref[:].astype(jnp.float32)
    mid = _gelu(
        mid + b1_ref[:].astype(jnp.float32), variant,
        fast_erf=use_fast_erf(x_ref.dtype),
    )
    mq, ms = _quant_rows(mid)
    acc2 = jax.lax.dot_general(
        mq, w2q_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc2.astype(jnp.float32) * ms * w2s_ref[:].astype(jnp.float32)
    out_ref[:] = (out + b2_ref[:].astype(jnp.float32) + x1).astype(out_ref.dtype)


def ln_mlp_residual_q8(
    x2d, ln_scale, ln_bias, w1q, w1s, b1, w2q, w2s, b2, eps,
    gelu_variant="exact", block_rows=128, interpret=False,
):
    """int8 twin of fused_block.ln_mlp_residual (kernel C standalone):
    LN2 -> dynamic-int8 quant -> int8 FC1 -> GELU -> int8 FC2 -> +residual.
    The W8A8 grouping is identical to out_ln_mlp_residual_q8's MLP tail —
    this split form exists for ToMe, whose merge sits between kernels B
    and C (models/tome.forward_quant)."""
    rows, d = x2d.shape
    f = w1q.shape[-1]
    block_rows = min(block_rows, rows)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    rowblk = lambda w: pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_ln_mlp_q8_kernel, eps=eps, variant=gelu_variant),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            rowblk(d),
            const((1, d)), const((1, d)),
            const((d, f)), const((1, f)), const((1, f)),
            const((f, d)), const((1, d)), const((1, d)),
        ],
        out_specs=rowblk(d),
        out_shape=jax.ShapeDtypeStruct((rows, d), x2d.dtype),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d * f,
            bytes_accessed=(2 * rows * d + 2 * d * f) * x2d.dtype.itemsize,
            transcendentals=rows * f,
        ),
        interpret=interpret,
    )(
        x2d,
        ln_scale.reshape(1, d), ln_bias.reshape(1, d),
        w1q, w1s.reshape(1, f), b1.reshape(1, f),
        w2q, w2s.reshape(1, d), b2.reshape(1, d),
    )


# -- int8 attention core ------------------------------------------------------
# The attention dots are dh=64 contractions — a hard 50% MXU ceiling for
# bf16 on the 128x128 array (docs/performance.md "kernel-A floor").  int8
# runs at 2x the bf16 rate, so quantizing the score and context dots
# attacks exactly that floor.  Scale choices keep the VPU cost near the
# bf16 path's: q per-row (a (T,1) column broadcast, free); k per-KEY by
# transposing k BEFORE quantizing, so the scales fall out of an axis-0 max
# as a (1,T) lane vector (per-key scales on the untransposed k would need
# a sublane->lane relayout of (T,1)); p at the FIXED scale 127
# (e = exp(s-m) is already in (0,1]; the 1/127 dequant folds into the
# existing 1/sum epilogue multiply); v per-dh-column (a (1,dh) row vector
# — naturally lane-shaped).


def _head_context_q8(qkv, h, dh, scale, quant_pv=True):
    """Per-head softmax(q k^T / sqrt(dh)) v with int8 MXU dots.

    ``quant_pv=False`` quantizes only the score dot (isolates the two
    halves for the kernel study in scripts/bench_kernels.py)."""
    from vit_tpu.ops.pallas.fused_block import dot_precision

    base = h * 3 * dh
    q = qkv[:, base : base + dh].astype(jnp.float32)
    # transpose k BEFORE quantizing: per-key scales then fall out of an
    # axis-0 max as a (1, T) lane vector — the right shape to dequantize
    # the score columns without a sublane->lane relayout of (T, 1) scales
    kt = qkv[:, base + dh : base + 2 * dh].astype(jnp.float32).T  # (dh, T)
    v = qkv[:, base + 2 * dh : base + 3 * dh]
    qs = jnp.maximum(jnp.max(jnp.abs(q), -1, keepdims=True) / 127.0, 1e-12)
    ks = jnp.maximum(jnp.max(jnp.abs(kt), 0, keepdims=True) / 127.0, 1e-12)
    q8 = jnp.clip(jnp.round(q / qs), -127, 127).astype(jnp.int8)
    kt8 = jnp.clip(jnp.round(kt / ks), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q8, kt8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    s = acc.astype(jnp.float32) * (qs * scale) * ks
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)  # in (0, 1]
    inv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
    if not quant_pv:
        p = (e * inv).astype(v.dtype)
        return jnp.dot(
            p, v, preferred_element_type=jnp.float32,
            precision=dot_precision(v.dtype),
        )
    p8 = jnp.round(e * 127.0).astype(jnp.int8)  # fixed scale: e <= 1
    vf = v.astype(jnp.float32)
    vs = jnp.maximum(
        jnp.max(jnp.abs(vf), axis=0, keepdims=True) / 127.0, 1e-12
    )  # (1, dh)
    v8 = jnp.clip(jnp.round(vf / vs), -127, 127).astype(jnp.int8)
    ctx = jax.lax.dot_general(
        p8, v8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return ctx.astype(jnp.float32) * (inv * (1.0 / 127.0)) * vs


def ln_qkv_attn_q8a(
    x2d, ln_scale, ln_bias, wq, w_scale, bqkv, num_heads, seq_len, eps,
    quant_pv=True, interpret=False,
):
    """Kernel A with int8 QKV GEMM *and* int8 attention dots.

    ``quant_pv=False`` quantizes only the score dot (isolates the two
    halves for the kernel study in scripts/bench_kernels.py)."""
    return _ln_qkv_attn_q8_call(
        x2d, ln_scale, ln_bias, wq, w_scale, bqkv, num_heads, seq_len, eps,
        attn_q8=True, quant_pv=quant_pv, interpret=interpret,
    )


# -- tensor-parallel (partial-form) MLP kernels -------------------------------
# Megatron column->row split of the W8A8 MLP, in two kernels so the mid
# activation's dynamic int8 scale can take the cross-shard pmax between
# them: absmax is over the FULL hidden row, but each shard holds only F/tp
# columns, and FC2's accumulator must psum in int32 BEFORE dequant to stay
# bit-identical to the unsharded kernel (parallel/tp_forward._mlp_q8_tp
# keeps the jnp formulation as the parity oracle).


def _ln_fc1_gelu_q8_kernel(
    x_ref, s_ref, b_ref, w1q_ref, w1s_ref, b1_ref, mid_ref, *, eps, variant,
    fast_erf,
):
    h = _ln(x_ref[:], s_ref[:], b_ref[:], eps)  # fp32, full D (replicated)
    hq, hs = _quant_rows(h)
    acc1 = jax.lax.dot_general(
        hq, w1q_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    mid = acc1.astype(jnp.float32) * hs * w1s_ref[:].astype(jnp.float32)
    mid_ref[:] = _gelu(mid + b1_ref[:].astype(jnp.float32), variant,
                       fast_erf=fast_erf)


def ln_fc1_gelu_q8(
    x2d, ln_scale, ln_bias, w1q, w1s, b1, eps, gelu_variant="exact",
    fast_erf=False, block_rows=128, interpret=False,
):
    """LN2 -> per-row int8 quant -> int8 FC1 (this shard's hidden columns)
    -> dequant -> GELU; emits the fp32 mid activation (the requant to int8
    happens in fc2_q8_partial, after the caller pmaxes the row scale)."""
    rows, d = x2d.shape
    f = w1q.shape[-1]
    block_rows = min(block_rows, rows)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    rowblk = lambda w: pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(
            _ln_fc1_gelu_q8_kernel, eps=eps, variant=gelu_variant,
            fast_erf=fast_erf,
        ),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            rowblk(d), const((1, d)), const((1, d)),
            const((d, f)), const((1, f)), const((1, f)),
        ],
        out_specs=rowblk(f),
        out_shape=jax.ShapeDtypeStruct((rows, f), jnp.float32),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * d * f,
            bytes_accessed=rows * (d + 4 * f) + d * f,
            transcendentals=rows * f,
        ),
        interpret=interpret,
    )(
        x2d, ln_scale.reshape(1, d), ln_bias.reshape(1, d),
        w1q, w1s.reshape(1, f), b1.reshape(1, f),
    )


def _fc2_q8_partial_kernel(mid_ref, ms_ref, w2q_ref, out_ref):
    mq = jnp.clip(
        jnp.round(mid_ref[:] / ms_ref[:]), -127, 127
    ).astype(jnp.int8)
    out_ref[:] = jax.lax.dot_general(
        mq, w2q_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def fc2_q8_partial(mid, ms, w2q, block_rows=128, interpret=False):
    """Requantize the fp32 mid with the caller-provided (pmax'd global)
    per-row scale and run this shard's int8 FC2 rows; returns the int32
    partial accumulator for an exact cross-shard int32 psum."""
    rows, f = mid.shape
    d = w2q.shape[-1]
    block_rows = min(block_rows, rows)
    return pl.pallas_call(
        _fc2_q8_partial_kernel,
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d), jnp.int32),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * f * d,
            bytes_accessed=rows * (4 * f + 4 * d) + f * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(mid, ms, w2q)


def _long_seq_block_q8(x2d, blk, num_heads, seq_len, eps, gelu_variant, interpret):
    """Long-sequence W8A8 block (seq_len past the single-tile VMEM
    attention): the q8 QKV projection runs in jnp through the SAME
    ``_qkv_q8`` grouping as the kernel, the T^2 work runs through the
    blockwise flash-attention kernel (attention stays bf16 on the quant
    path by design), and the row-blocked q8 MLP kernel is unchanged.
    Mirrors fused_block._long_seq_block."""
    from vit_tpu.ops.pallas.flash_attention import flash_context_from_packed_qkv

    rows, d = x2d.shape
    b = rows // seq_len
    qkv = _qkv_q8(
        x2d, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"],
        blk["wqkv_scale"], blk["bqkv"], eps,
    ).astype(x2d.dtype)
    ctx2 = flash_context_from_packed_qkv(
        qkv, b, seq_len, num_heads, interpret=interpret
    )
    return out_ln_mlp_residual_q8(
        ctx2, x2d, blk["wo"], blk["bo"], blk["ln2_scale"], blk["ln2_bias"],
        blk["w1"], blk["w1_scale"], blk["b1"], blk["w2"], blk["w2_scale"],
        blk["b2"], eps, gelu_variant, interpret=interpret,
    )


def fused_encoder_block_q8(
    x2d: jax.Array,
    blk,
    num_heads: int,
    seq_len: int,
    eps: float,
    gelu_variant: str = "exact",
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Pre-LN encoder block with int8 QKV + MLP GEMMs; bf16 attention core.

    ``blk`` carries int8 ``wqkv``/``w1``/``w2`` with ``*_scale`` fp32
    companions (vit_tpu.ops.quant.quantize_params); ``wo`` stays fp and
    rides the merged kernel's prologue (int8 wo would need another
    activation quant pass on the already-VPU-bound path —
    docs/performance.md roofline).
    """
    if interpret is None:
        from vit_tpu.ops.pallas import interpret_default

        interpret = interpret_default()
    from vit_tpu.ops.pallas import fused_block as _fb  # dynamic: tests patch it

    if seq_len > _fb.VMEM_ATTENTION_MAX_T:
        return _long_seq_block_q8(
            x2d, blk, num_heads, seq_len, eps, gelu_variant, interpret
        )
    ctx = ln_qkv_attn_q8(
        x2d, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"], blk["wqkv_scale"],
        blk["bqkv"], num_heads, seq_len, eps, interpret=interpret,
    )
    return out_ln_mlp_residual_q8(
        ctx, x2d, blk["wo"], blk["bo"], blk["ln2_scale"], blk["ln2_bias"],
        blk["w1"], blk["w1_scale"], blk["b1"], blk["w2"], blk["w2_scale"],
        blk["b2"], eps, gelu_variant, interpret=interpret,
    )
