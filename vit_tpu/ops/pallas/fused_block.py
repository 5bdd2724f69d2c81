"""Fused encoder-block Pallas kernels — the per-layer "megakernel" path.

The reference runs each encoder phase as separate kernel launches with full
device-memory round-trips between them (LN / QKV GEMMs+bias / per-head
GEMM-softmax-GEMM chain / out_proj / FC1-GELU-FC2, plus residual adds on the
HOST CPU, ViT_opencl.c:732-782).  This module collapses a whole pre-LN
encoder block (Encoder, ViT_seq.c:271-302) into three Pallas kernels over a
flat (B*T, D) activation, with no transposes and no intermediate HBM
tensors beyond the packed QKV:

  A. ``ln1 -> QKV projection -> attention``  (one grid step per image:
     W_qkv VMEM-resident, the packed QKV never touches HBM; heads are
     static slices of the (head,{q,k,v},head_dim) columns, so no
     (B,H,T,Dh) layout shuffle ever exists)
  B. ``out_proj + residual``   (row-blocked: one GEMM spanning all B*T rows)
  C. ``ln2 -> FC1 -> GELU -> FC2 -> +residual``   (row-blocked; both MLP
     weights VMEM-resident)

HBM traffic per layer ~= 5 passes over the (B*T, D) activation — near the
information-theoretic floor — while every GEMM runs from VMEM with fp32
accumulation.  Fusion history and measured dead ends: docs/performance.md.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.mlp_kernel import _erf

# v5e default scoped-VMEM limit is 16 MB; larger configs (L/16: W1+W2 =
# 16.8 MB bf16 resident) need it raised.  96 MB verified working on-chip
# (the merged B+C kernel's accumulators pushed it past the earlier 64).
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def dot_precision(dtype):
    """fp32 MXU dots need an explicit HIGHEST precision: this TPU stack's
    DEFAULT computes them in bf16 (measured 2.6e-3 rel err on-chip vs
    1.7e-7 at HIGHEST).  bf16 operands are unaffected (None)."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    return c * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )


# erf(x) ~= tanh(x * q(x^2)) with input clamped to [-B, B]: one VPU
# transcendental instead of A-S's exp+divide.  max |erf err| = 3.1e-5
# (gelu err 3.5e-5, gelu' err 1.7e-4) — far below bf16 resolution, so the
# bf16 compute paths use it; fp32 keeps the 1.5e-7 A-S form.
_ERF_TANH_Q = (
    1.1281997085186337, 0.10359029852786425, -0.0011219408928909798,
    -0.00022230843767343287, 1.4501721850515667e-05,
)
_ERF_TANH_B = 3.2


def _erf_tanh_inner(x):
    """-> (clamped x, q(x^2), tanh(x*q)) — shared by gelu and its grad."""
    xc = jnp.clip(x, -_ERF_TANH_B, _ERF_TANH_B)
    t = xc * xc
    q = jnp.float32(_ERF_TANH_Q[-1])
    for c in _ERF_TANH_Q[-2::-1]:
        q = q * t + jnp.float32(c)
    return xc, q, jnp.tanh(xc * q)


def _gelu(h, variant, fast_erf=False):
    if variant == "exact":
        if fast_erf:
            _, _, t = _erf_tanh_inner(h * 0.7071067811865476)
            return 0.5 * h * (1.0 + t)
        return 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    return 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h * h * h)))


def use_fast_erf(dtype) -> bool:
    """The tanh-form erf is used when the compute dtype can't resolve its
    3e-5 error anyway (bf16); fp32 paths keep the A-S form."""
    return jnp.dtype(dtype) == jnp.bfloat16


# -- training-mode regularizer masks ------------------------------------------
# The fused_train path applies torchvision's in-block dropout (post-out_proj,
# intra-MLP, post-FC2 — the sites the reference hard-codes to 0,
# ViT_seq.c:10-21) and stochastic depth INSIDE the megakernels.  Masks are
# never stashed or streamed: every kernel regenerates them from a
# counter-based hash of (per-layer seed, site, absolute row, column), so the
# forward kernels, the backward kernels (different block_rows!), and the jnp
# parity twin all reproduce bit-identical masks from one uint32 seed.

DROP_SITE_ATTN_OUT = 1   # dropout after the attention out_proj
DROP_SITE_MLP_INNER = 2  # dropout between GELU and FC2 (torchvision MLPBlock)
DROP_SITE_MLP_OUT = 3    # dropout after FC2 (+b2)
DROP_SITE_DP_ATTN = 4    # stochastic depth, attention residual branch
DROP_SITE_DP_MLP = 5     # stochastic depth, MLP residual branch


def mask_hash_u32(seed_u32, site: int, r_u32, c_u32):
    """Uniform uint32 from absolute position — a murmur3-finalizer mix over
    (seed, site, row, col).  Pure jnp (uint32 mul/xor/shift), so the same
    definition runs on the VPU inside kernels and in plain XLA outside."""
    x = (
        r_u32 * jnp.uint32(0x9E3779B9)
        + c_u32 * jnp.uint32(0x85EBCA6B)
        + seed_u32
        + jnp.uint32((site * 0x27D4EB2F) & 0xFFFFFFFF)
    )
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def dropout_mask(seed_u32, site: int, rows0, shape, p: float):
    """(shape) fp32 inverted-dropout multiplier: 1/(1-p) kept, 0 dropped.
    ``p`` is static (config), so the drop threshold is an exact compile-time
    constant; ``rows0`` is the block's absolute first row (traced)."""
    r = rows0 + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    bits = mask_hash_u32(seed_u32, site, r.astype(jnp.uint32), c.astype(jnp.uint32))
    drop_thresh = jnp.uint32(int(p * 4294967296.0) & 0xFFFFFFFF)
    return jnp.where(bits >= drop_thresh, jnp.float32(1.0 / (1.0 - p)), 0.0)


def drop_path_scale_rows(seed_u32, site: int, batch: int, seq_len: int, rate):
    """(batch*seq_len, 1) fp32 stochastic-depth multiplier, constant within
    each sample: 1/(1-rate) kept, 0 dropped.  ``rate`` may be traced (the
    standard schedule scales it per layer); rate == 0 keeps EVERY sample
    (the threshold formula is exact at 0, so layer 0 of the linear schedule
    is a true identity).  Computed in plain XLA (it is tiny) and passed to
    the kernels as a row-blocked operand."""
    s = jax.lax.broadcasted_iota(jnp.int32, (batch, 1), 0)
    bits = mask_hash_u32(
        seed_u32, site, s.astype(jnp.uint32), jnp.uint32(0)
    )
    rate = jnp.asarray(rate, jnp.float32)
    # 4294967040 = 2^32 - 256, the largest f32 below 2^32: rate ~ 1 cannot
    # overflow the uint32 cast, and rate == 0 maps to threshold 0 exactly
    drop_thresh = (rate * jnp.float32(4294967040.0)).astype(jnp.uint32)
    scale = jnp.where(bits >= drop_thresh, 1.0 / (1.0 - rate), 0.0)
    return jnp.repeat(scale.astype(jnp.float32), seq_len, axis=0)


# -- kernel A: LN1 + QKV projection + attention core --------------------------
# One grid step per image: the packed QKV never round-trips to HBM
# (~180 MB/layer at B/16 batch-100 saved) — measured 15% faster end-to-end
# than a split LN+QKV / attention form, bit-identical.


def _head_context(qkv, h, dh, scale, log_size=None):
    """Per-head softmax(q k^T / sqrt(dh)) v from the packed
    (head,{q,k,v},dh) columns of a VMEM-resident qkv (T, 3D) tile.
    Shared by the fp and int8 block kernels.

    ``log_size`` (T,) fp32, when given, adds ToMe's proportional-attention
    bias to the key logits (softmax(qk^T/sqrt(dh) + log s) — merged tokens
    keep their aggregate influence, ops/tome.py)."""
    base = h * 3 * dh
    prec = dot_precision(qkv.dtype)
    # fold 1/sqrt(dh) into Q (a T x dh multiply, not T x T)
    q = qkv[:, base : base + dh] * jnp.asarray(scale, qkv.dtype)
    k = qkv[:, base + dh : base + 2 * dh]
    v = qkv[:, base + 2 * dh : base + 3 * dh]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    if log_size is not None:
        s = s + log_size[None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    # normalize via reciprocal-multiply (row-wise divide is VPU-expensive)
    inv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
    p = (p * inv).astype(v.dtype)
    return jnp.dot(p, v, preferred_element_type=jnp.float32, precision=prec)


def _ln_qkv_attn_kernel(
    x_ref, s_ref, b_ref, w_ref, bias_ref, *refs, eps, num_heads, scale,
    has_log_size=False, emit_kmean=False
):
    # head_dim comes from the weight, not the input width: under tensor
    # parallelism the kernel sees only this shard's (head,{q,k,v},dh)
    # column block (num_heads = local heads), while x keeps the full D.
    if has_log_size:
        ls_ref, *out_refs = refs
        log_size = ls_ref[0, 0]
    else:
        log_size, out_refs = None, list(refs)
    out_ref = out_refs[0]
    dh = w_ref.shape[-1] // (3 * num_heads)
    h_ln = _ln(x_ref[0], s_ref[:], b_ref[:], eps).astype(x_ref.dtype)
    qkv = jnp.dot(
        h_ln, w_ref[:], preferred_element_type=jnp.float32,
        precision=dot_precision(x_ref.dtype),
    )
    qkv = (qkv + bias_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    if len(out_refs) > 1 and not emit_kmean:
        out_refs[1][0] = qkv  # training path: stash qkv for the backward
    for h in range(num_heads):  # heads are column slices of the VMEM qkv
        out_ref[0, :, h * dh : (h + 1) * dh] = _head_context(
            qkv, h, dh, scale, log_size
        ).astype(out_ref.dtype)
    if emit_kmean:
        # mean attention key over heads — ToMe's similarity metric
        # (ops/tome.py), read straight off the VMEM-resident qkv
        acc = qkv[:, dh : 2 * dh].astype(jnp.float32)
        for h in range(1, num_heads):
            base = h * 3 * dh
            acc = acc + qkv[:, base + dh : base + 2 * dh].astype(jnp.float32)
        out_refs[1][0] = (acc * (1.0 / num_heads)).astype(out_refs[1].dtype)


def ln_qkv_attn(
    x2d, ln_scale, ln_bias, wqkv, bqkv, num_heads, seq_len, eps,
    interpret=False, return_qkv=False, log_size=None, return_kmean=False,
):
    """(B*T, D) -> attention context (B*T, Dctx): LN1, QKV projection, and
    the per-head attention all inside one kernel; W_qkv stays VMEM-resident.

    ``num_heads`` is the number of heads present in ``wqkv``'s packed
    columns; Dctx = wqkv.shape[-1] // 3 (== D single-device, D/tp under TP).
    ``return_qkv`` additionally emits the packed QKV (training residual —
    lets the backward kernel skip the QKV GEMM recompute).
    ``log_size`` (B, T) fp32 adds ToMe's proportional-attention bias to
    the key logits; ``return_kmean`` additionally emits the mean attention
    key over heads (B*T, head_dim) — the ToMe similarity metric, free
    because the packed QKV is already VMEM-resident (ops/tome.py).
    """
    if return_qkv and return_kmean:
        raise ValueError("return_qkv (training) and return_kmean (ToMe "
                         "inference) are mutually exclusive")
    rows, d = x2d.shape
    d3 = wqkv.shape[-1]
    d_ctx = d3 // 3
    dh = d_ctx // num_heads
    b = rows // seq_len
    scale = 1.0 / (dh ** 0.5)
    out_specs = pl.BlockSpec(
        (1, seq_len, d_ctx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((b, seq_len, d_ctx), x2d.dtype)
    if return_qkv:
        out_specs = (
            out_specs,
            pl.BlockSpec((1, seq_len, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (out_shape, jax.ShapeDtypeStruct((b, seq_len, d3), x2d.dtype))
    elif return_kmean:
        out_specs = (
            out_specs,
            pl.BlockSpec((1, seq_len, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (out_shape, jax.ShapeDtypeStruct((b, seq_len, dh), x2d.dtype))
    in_specs = [
        pl.BlockSpec((1, seq_len, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d3), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [
        x2d.reshape(b, seq_len, d),
        ln_scale.reshape(1, d),
        ln_bias.reshape(1, d),
        wqkv,
        bqkv.reshape(1, d3),
    ]
    if log_size is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, seq_len), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(
            log_size.astype(jnp.float32).reshape(b, 1, seq_len)
        )
    out = pl.pallas_call(
        functools.partial(
            _ln_qkv_attn_kernel, eps=eps, num_heads=num_heads, scale=scale,
            has_log_size=log_size is not None, emit_kmean=return_kmean,
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * d * d3 + 4 * b * seq_len * seq_len * d_ctx,
            bytes_accessed=(2 * rows * d + d * d3) * x2d.dtype.itemsize,
            transcendentals=b * num_heads * seq_len * seq_len,
        ),
        interpret=interpret,
    )(*operands)
    if return_qkv:
        ctx, qkv = out
        return ctx.reshape(rows, d_ctx), qkv.reshape(rows, d3)
    if return_kmean:
        ctx, kmean = out
        return ctx.reshape(rows, d_ctx), kmean.reshape(rows, dh)
    return out.reshape(rows, d_ctx)


# -- kernel B: out_proj + residual (row-blocked over all images) -------------


def _out_res_kernel(ctx_ref, res_ref, wo_ref, bo_ref, out_ref):
    acc = jnp.dot(
        ctx_ref[:], wo_ref[:], preferred_element_type=jnp.float32,
        precision=dot_precision(ctx_ref.dtype),
    )
    acc = acc + bo_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def out_residual(ctx, res, wo, bo, block_rows=512, interpret=False):
    """res + ctx @ wo + bo over (B*T, D) rows — one large MXU GEMM."""
    rows, d = ctx.shape
    block_rows = min(block_rows, rows)
    return pl.pallas_call(
        _out_res_kernel,
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d), ctx.dtype),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * d * d,
            bytes_accessed=(3 * rows * d + d * d) * ctx.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ctx, res, wo, bo.reshape(1, d))


# -- kernel B train variant: out_proj + dropout + drop-path + residual --------


def _out_res_train_kernel(
    ctx_ref, res_ref, wo_ref, bo_ref, dp_ref, seed_ref, out_ref, *, dropout_p
):
    acc = jnp.dot(
        ctx_ref[:], wo_ref[:], preferred_element_type=jnp.float32,
        precision=dot_precision(ctx_ref.dtype),
    )
    acc = acc + bo_ref[:].astype(jnp.float32)
    if dropout_p > 0:
        seed = seed_ref[0, 0].astype(jnp.uint32)
        rows0 = pl.program_id(0) * ctx_ref.shape[0]
        acc = acc * dropout_mask(
            seed, DROP_SITE_ATTN_OUT, rows0, acc.shape, dropout_p
        )
    acc = acc * dp_ref[:].astype(jnp.float32)  # (block_rows, 1) broadcast
    out_ref[:] = (acc + res_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def out_residual_train(
    ctx, res, wo, bo, dp_scale, seed, dropout_p, block_rows=512,
    interpret=False,
):
    """Training form of :func:`out_residual`:
    ``res + dp_scale * dropout(ctx @ wo + bo)`` — torchvision's
    post-attention dropout site and the attention branch's stochastic
    depth, fused into the same GEMM epilogue.

    ``dp_scale`` (rows, 1) fp32 from :func:`drop_path_scale_rows`;
    ``seed`` uint32/int32 scalar array; ``dropout_p`` static."""
    rows, d = ctx.shape
    block_rows = min(block_rows, rows)
    return pl.pallas_call(
        functools.partial(_out_res_train_kernel, dropout_p=dropout_p),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d), ctx.dtype),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * d * d,
            bytes_accessed=(3 * rows * d + d * d) * ctx.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        ctx, res, wo, bo.reshape(1, d),
        dp_scale.astype(jnp.float32),
        jnp.asarray(seed).astype(jnp.int32).reshape(1, 1),
    )


# -- kernel C: LN2 + MLP + residual -----------------------------------------


def _ln_mlp_kernel(
    x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, *out_refs, eps,
    variant, partial=False,
):
    out_ref = out_refs[0]
    prec = dot_precision(x_ref.dtype)
    h = _ln(x_ref[:], s_ref[:], b_ref[:], eps).astype(x_ref.dtype)
    u = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32, precision=prec)
    u = u + b1_ref[:].astype(jnp.float32)
    if len(out_refs) > 1:  # training path: stash pre-GELU u for the backward
        out_refs[1][:] = u.astype(out_refs[1].dtype)
    h = _gelu(u, variant, fast_erf=use_fast_erf(x_ref.dtype)).astype(x_ref.dtype)
    acc = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32, precision=prec)
    if not partial:  # TP row-parallel w2: bias+residual ride the psum epilogue
        acc = acc + b2_ref[:].astype(jnp.float32) + x_ref[:].astype(jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def ln_mlp_residual(
    x2d, ln_scale, ln_bias, w1, b1, w2, b2, eps, gelu_variant="exact",
    block_rows=256, interpret=False, partial=False, return_u=False,
):
    """LN2 -> FC1 -> GELU -> FC2 (-> +b2 +residual) over (B*T, D) rows.

    ``partial=True`` is the tensor-parallel form: w1/b1 hold this shard's
    MLP-hidden columns and w2 the matching rows; the kernel returns the fp32
    partial product (no bias, no residual) for a psum epilogue outside
    (Megatron row-parallel second GEMM; the reference's analog seam is the
    per-head loop ViT_opencl.c:546, SURVEY.md §2.3).

    ``return_u=True`` additionally emits the pre-GELU activation (training
    residual — lets the backward kernel skip the FC1 recompute).
    """
    rows, d = x2d.shape
    f = w1.shape[-1]
    block_rows = min(block_rows, rows)
    out_dtype = jnp.float32 if partial else x2d.dtype
    out_specs = pl.BlockSpec(
        (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((rows, d), out_dtype)
    if return_u:
        out_specs = (
            out_specs,
            pl.BlockSpec((block_rows, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (out_shape, jax.ShapeDtypeStruct((rows, f), x2d.dtype))
    out = pl.pallas_call(
        functools.partial(
            _ln_mlp_kernel, eps=eps, variant=gelu_variant, partial=partial
        ),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d * f,
            bytes_accessed=(2 * rows * d + 2 * d * f) * x2d.dtype.itemsize,
            transcendentals=rows * f,
        ),
        interpret=interpret,
    )(
        x2d,
        ln_scale.reshape(1, d),
        ln_bias.reshape(1, d),
        w1,
        b1.reshape(1, f),
        w2,
        b2.reshape(1, d),
    )
    return out


# -- kernel C train variant: LN2 + MLP with in-block dropout + drop-path ------


def _ln_mlp_train_kernel(
    x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, dp_ref, seed_ref,
    out_ref, *, eps, variant, dropout_p,
):
    prec = dot_precision(x_ref.dtype)
    rows0 = pl.program_id(0) * x_ref.shape[0]
    seed = seed_ref[0, 0].astype(jnp.uint32)
    h = _ln(x_ref[:], s_ref[:], b_ref[:], eps).astype(x_ref.dtype)
    u = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32, precision=prec)
    u = u + b1_ref[:].astype(jnp.float32)
    g = _gelu(u, variant, fast_erf=use_fast_erf(x_ref.dtype))
    if dropout_p > 0:  # torchvision MLPBlock: dropout after the GELU
        g = g * dropout_mask(seed, DROP_SITE_MLP_INNER, rows0, g.shape, dropout_p)
    acc = jnp.dot(
        g.astype(x_ref.dtype), w2_ref[:],
        preferred_element_type=jnp.float32, precision=prec,
    )
    acc = acc + b2_ref[:].astype(jnp.float32)
    if dropout_p > 0:  # ... and after the second linear
        acc = acc * dropout_mask(seed, DROP_SITE_MLP_OUT, rows0, acc.shape, dropout_p)
    acc = acc * dp_ref[:].astype(jnp.float32)
    out_ref[:] = (acc + x_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def ln_mlp_residual_train(
    x2d, ln_scale, ln_bias, w1, b1, w2, b2, dp_scale, seed, dropout_p, eps,
    gelu_variant="exact", block_rows=256, interpret=False,
):
    """Training form of :func:`ln_mlp_residual`:
    ``x + dp_scale * drop(drop(GELU(FC1(LN2(x)))) @ w2 + b2)`` — both
    torchvision MLP dropout sites and the MLP branch's stochastic depth
    inside the one kernel (masks regenerated from ``seed``, never stored)."""
    rows, d = x2d.shape
    f = w1.shape[-1]
    block_rows = min(block_rows, rows)
    return pl.pallas_call(
        functools.partial(
            _ln_mlp_train_kernel, eps=eps, variant=gelu_variant,
            dropout_p=dropout_p,
        ),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
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
        ln_scale.reshape(1, d),
        ln_bias.reshape(1, d),
        w1,
        b1.reshape(1, f),
        w2,
        b2.reshape(1, d),
        dp_scale.astype(jnp.float32),
        jnp.asarray(seed).astype(jnp.int32).reshape(1, 1),
    )


# -- merged kernel B+C: out_proj + residual + LN2 + MLP + residual -----------
# Row-blocked over all images; x1 never round-trips to HBM between the
# out_proj epilogue and the MLP.  (Round 1 measured this merge neutral at
# the 64 MB VMEM limit pre-attention-merge; re-measured a win at 96 MB.)


def _out_ln_mlp_kernel(
    ctx_ref, res_ref, wo_ref, bo_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
    b2_ref, out_ref, *, eps, variant,
):
    prec = dot_precision(ctx_ref.dtype)
    x1 = jnp.dot(
        ctx_ref[:], wo_ref[:], preferred_element_type=jnp.float32, precision=prec
    )
    x1 = x1 + bo_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
    h = _ln(x1, s_ref[:], b_ref[:], eps).astype(ctx_ref.dtype)
    u = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32, precision=prec)
    h = _gelu(
        u + b1_ref[:].astype(jnp.float32), variant,
        fast_erf=use_fast_erf(ctx_ref.dtype),
    ).astype(ctx_ref.dtype)
    acc = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32, precision=prec)
    out_ref[:] = (acc + b2_ref[:].astype(jnp.float32) + x1).astype(out_ref.dtype)


def out_ln_mlp_residual(
    ctx, res, wo, bo, ln_scale, ln_bias, w1, b1, w2, b2, eps,
    gelu_variant="exact", block_rows=256, interpret=False,
):
    """res + ctx@wo+bo -> LN2 -> FC1 -> GELU -> FC2 -> +residual, fused."""
    rows, d_ctx = ctx.shape
    d = res.shape[-1]
    f = w1.shape[-1]
    block_rows = min(block_rows, rows)
    return pl.pallas_call(
        functools.partial(_out_ln_mlp_kernel, eps=eps, variant=gelu_variant),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, d_ctx), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_ctx, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, d), res.dtype),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * d_ctx * d + 4 * rows * d * f,
            bytes_accessed=(3 * rows * d + 2 * d * f + d_ctx * d)
            * res.dtype.itemsize,
            transcendentals=rows * f,
        ),
        interpret=interpret,
    )(
        ctx,
        res,
        wo,
        bo.reshape(1, d),
        ln_scale.reshape(1, d),
        ln_bias.reshape(1, d),
        w1,
        b1.reshape(1, f),
        w2,
        b2.reshape(1, d),
    )


# -- long-sequence fallback ---------------------------------------------------
# Kernel A holds one image's full (T, T) fp32 score tile per head in VMEM —
# fine for every ViT resolution in the family (197 @224 ... 577 @384, and up
# to ~1k tokens), but a very-high-resolution config would blow VMEM.  Past
# this threshold the block composes the blockwise online-softmax flash
# attention (O(block^2) VMEM) with the same merged out_proj+MLP kernel.
VMEM_ATTENTION_MAX_T = 1024


def _long_seq_block(x2d, blk, num_heads, seq_len, eps, gelu_variant, interpret):
    from vit_tpu.ops import reference
    from vit_tpu.ops.pallas.flash_attention import flash_context_from_packed_qkv
    from vit_tpu.ops.pallas.ln_kernel import layer_norm

    rows, d = x2d.shape
    b = rows // seq_len
    x3 = x2d.reshape(b, seq_len, d)
    h = layer_norm(x3, blk["ln1_scale"], blk["ln1_bias"], eps, interpret=interpret)
    qkv = reference.linear(h, blk["wqkv"], blk["bqkv"])  # columns (H, 3, Dh)
    ctx2 = flash_context_from_packed_qkv(
        qkv, b, seq_len, num_heads, interpret=interpret
    )
    return out_ln_mlp_residual(
        ctx2, x2d, blk["wo"], blk["bo"], blk["ln2_scale"], blk["ln2_bias"],
        blk["w1"], blk["b1"], blk["w2"], blk["b2"], eps, gelu_variant,
        interpret=interpret,
    )


# -- full block --------------------------------------------------------------


def fused_encoder_block(
    x2d: jax.Array,
    blk,
    num_heads: int,
    seq_len: int,
    eps: float,
    gelu_variant: str = "exact",
    interpret: Optional[bool] = None,
) -> jax.Array:
    """One pre-LN encoder block on a flat (B*T, D) activation.

    Two kernels: [LN1+QKV+attention] -> [out_proj+residual+LN2+MLP+residual]
    — the packed QKV and the post-attention activation x1 never leave VMEM
    (3 HBM passes over the activation per layer; the training forward keeps
    the split form because its backward consumes x1)."""
    if interpret is None:
        from vit_tpu.ops.pallas import interpret_default

        interpret = interpret_default()
    if seq_len > VMEM_ATTENTION_MAX_T:
        return _long_seq_block(
            x2d, blk, num_heads, seq_len, eps, gelu_variant, interpret
        )
    ctx = ln_qkv_attn(
        x2d, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"], blk["bqkv"],
        num_heads, seq_len, eps, interpret=interpret,
    )
    return out_ln_mlp_residual(
        ctx,
        x2d,
        blk["wo"],
        blk["bo"],
        blk["ln2_scale"],
        blk["ln2_bias"],
        blk["w1"],
        blk["b1"],
        blk["w2"],
        blk["b2"],
        eps,
        gelu_variant,
        interpret=interpret,
    )
