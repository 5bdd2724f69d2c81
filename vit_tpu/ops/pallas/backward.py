"""Hand-written backward Pallas kernels for the fused encoder block.

Round 1 trained the fused path by recomputing the whole block through jnp
reference ops under ``jax.vjp`` (correct, but the backward ran at the slow
per-op XLA rate).  These kernels mirror the three forward megakernels
(fused_block.py) with the standard analytic VJPs:

  A'. d[LN1+QKV+attention]: recompute LN1/QKV/softmax probs in VMEM (one
      grid step per image, like the forward), then per-head dV/dP/dS/dQ/dK,
      assemble dQKV, dW_qkv/db accumulation, LN backward -> dx.
  B'. d[out_proj+residual]:  dctx = dx1 Wo^T, dWo = ctx^T dx1, dbo = sum.
  C'. d[LN2+MLP+residual]:   recompute LN2/FC1/GELU, du = (dy W2^T) * gelu',
      dW2/dW1/db accumulation, LN backward -> dx1.

Design notes (pallas_guide.md):
  - Weight-gradient outputs use constant index maps, so one fp32 VMEM
    accumulator is revisited across sequential grid steps (zeroed on step 0
    via ``pl.when``), exactly the reduction the reference could never
    express in per-op OpenCL launches.
  - The last row block of a ragged (B*T, D) activation is PADDED WITH
    GARBAGE on TPU; every kernel masks invalid rows to zero before they can
    reach an accumulator.
  - All MXU dots take bf16/fp32 operands with fp32 accumulation
    (preferred_element_type), matching the forward's precision policy.

Forward counterparts & parity tests: fused_block.py, tests/test_backward.py.
Training-completeness context: the reference is inference-only (SURVEY.md
§5 "checkpoint/resume"); training is this framework's extension axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.pallas.fused_block import (
    _VMEM_LIMIT,
    _erf_tanh_inner,
    _ERF_TANH_Q,
    _gelu,
    _ln,
    DROP_SITE_ATTN_OUT,
    DROP_SITE_MLP_INNER,
    DROP_SITE_MLP_OUT,
    dot_precision,
    dropout_mask,
    use_fast_erf,
)
from vit_tpu.ops.pallas.mlp_kernel import _erf

_INV_SQRT2PI = 0.3989422804014327  # 1/sqrt(2*pi)


def _gelu_grad(u, variant, fast_erf=False):
    """d gelu(u) / du for both reference variants (fp32).

    exact:  Phi(u) + u * phi(u)                      (ViT_seq.c:232 erf form)
    tanh:   0.5(1+t) + 0.5 u (1-t^2) c (1+3*0.044715 u^2)   (kernel.cl:442)

    ``fast_erf`` differentiates the tanh-form erf instead (one tanh, no
    exp/divide; |err| 1.7e-4 — below bf16 resolution).
    """
    if variant == "exact":
        if fast_erf:
            inv_sqrt2 = 0.7071067811865476
            sc, q, t = _erf_tanh_inner(u * inv_sqrt2)
            tsq = sc * sc
            qp = jnp.float32((len(_ERF_TANH_Q) - 1) * _ERF_TANH_Q[-1])
            for i in range(len(_ERF_TANH_Q) - 2, 0, -1):
                qp = qp * tsq + jnp.float32(i * _ERF_TANH_Q[i])
            vp = q + 2.0 * tsq * qp  # d(s*q(s^2))/ds
            return 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * vp * inv_sqrt2
        phi_cdf = 0.5 * (1.0 + _erf(u * 0.7071067811865476))
        pdf = _INV_SQRT2PI * jnp.exp(-0.5 * u * u)
        return phi_cdf + u * pdf
    c = 0.7978845608028654
    inner = c * (u + 0.044715 * u * u * u)
    t = jnp.tanh(inner)
    return 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * c * (1.0 + 3 * 0.044715 * u * u)


def _ln_stats(x_f32, eps):
    mean = jnp.mean(x_f32, axis=-1, keepdims=True)
    c = x_f32 - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return c * inv, inv  # (xhat, 1/sigma)


def _ln_bwd_dx(dh, xhat, inv, gamma):
    """Input gradient of y = xhat*gamma + beta (per-row statistics)."""
    dxhat = dh * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return inv * (dxhat - m1 - xhat * m2)


def _row_mask(rows_total, block_rows):
    i = pl.program_id(0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0)
    return (i * block_rows + row_ids) < rows_total


# -- kernel C backward: d[LN2 + FC1 + GELU + FC2 + residual] ------------------


def _mlp_bwd_core(
    dy, x1, s_ref, b_ref, w1_ref, b1_ref, w2_ref, u_ref, mask, eps, variant,
    cdtype, inner_mask=None,
):
    """The MLP-backward body shared by the split C' kernel and the merged
    C'+B' kernel (one definition, so the two forms cannot drift): recompute
    LN2 (+ pre-GELU u unless the forward stashed it), GELU grad, and the
    LN input gradient.  Returns everything both kernels' accumulators need:
    (h2, g, du, du_c, dh2, dx_ln, xhat).

    ``inner_mask`` (rows, F) fp32, when given, is the training forward's
    intra-MLP dropout multiplier (fused_block.DROP_SITE_MLP_INNER): the
    returned ``g`` is then the POST-dropout activation g̃ = m ⊙ gelu(u)
    (what dw2 contracts against) and du carries the mask's gradient gate.
    ``dy`` must already be the caller's post-FC2-site gradient."""
    prec = dot_precision(cdtype)
    gamma = s_ref[:].astype(jnp.float32)
    # recompute LN in VMEM; use the stashed pre-GELU u when the forward
    # saved it (skips the FC1 recompute GEMM), else recompute it too
    xhat, inv = _ln_stats(x1, eps)
    h2 = (xhat * gamma + b_ref[:].astype(jnp.float32)).astype(cdtype)
    if u_ref is not None:
        u = jnp.where(mask, u_ref[:].astype(jnp.float32), 0.0)
    else:
        u = jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32, precision=prec)
        u = u + b1_ref[:].astype(jnp.float32)
    fast = use_fast_erf(cdtype)
    g = _gelu(u, variant, fast_erf=fast)
    if inner_mask is not None:
        g = g * inner_mask

    # dm = dy (any residual add passes gradient through — handled by caller)
    dg = jax.lax.dot_general(
        dy.astype(cdtype), w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    if inner_mask is not None:
        dg = dg * inner_mask
    du = dg * _gelu_grad(u, variant, fast_erf=fast)
    du_c = du.astype(cdtype)
    dh2 = jax.lax.dot_general(
        du_c, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dx_ln = _ln_bwd_dx(dh2, xhat, inv, gamma)
    return h2, g, du, du_c, dh2, dx_ln, xhat


def _mlp_grad_accum(
    dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbeta_ref,
    h2, g, du, du_c, dy, dh2, xhat, cdtype,
):
    """The six shared fp32 weight-grad accumulator updates (zeroing on grid
    step 0 stays in each kernel — the merged form has extra accumulators)."""
    prec = dot_precision(cdtype)
    g_c = g.astype(cdtype)
    dy_c = dy.astype(cdtype)
    dw1_ref[:] += jax.lax.dot_general(
        h2, du_c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    db1_ref[:] += jnp.sum(du, axis=0, keepdims=True)
    dw2_ref[:] += jax.lax.dot_general(
        g_c, dy_c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    db2_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    dg_ref[:] += jnp.sum(dh2 * xhat, axis=0, keepdims=True)
    dbeta_ref[:] += jnp.sum(dh2, axis=0, keepdims=True)


def _ln_mlp_bwd_kernel(*refs, eps, variant, rows_total, have_u, residual=True):
    if have_u:
        (dy_ref, x1_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, u_ref,
         dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbeta_ref) = refs
    else:
        (dy_ref, x1_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
         dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbeta_ref) = refs
        u_ref = None
    cdtype = dy_ref.dtype
    mask = _row_mask(rows_total, dy_ref.shape[0])
    dy = jnp.where(mask, dy_ref[:].astype(jnp.float32), 0.0)
    x1 = jnp.where(mask, x1_ref[:].astype(jnp.float32), 0.0)

    h2, g, du, du_c, dh2, dx_ln, xhat = _mlp_bwd_core(
        dy, x1, s_ref, b_ref, w1_ref, b1_ref, w2_ref, u_ref, mask, eps,
        variant, cdtype,
    )
    # the partial (TP row-parallel) form has no residual passthrough
    dx_ref[:] = ((dy + dx_ln) if residual else dx_ln).astype(dx_ref.dtype)

    # fp32 accumulators, revisited across all row blocks
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)

    _mlp_grad_accum(
        dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbeta_ref,
        h2, g, du, du_c, dy, dh2, xhat, cdtype,
    )


def ln_mlp_residual_bwd(
    dy, x1, ln_scale, ln_bias, w1, b1, w2, eps, gelu_variant="exact",
    block_rows=None, interpret=False, u=None, residual=True,
):
    """VJP of fused_block.ln_mlp_residual (non-partial form).

    Returns (dx1, d_ln_scale, d_ln_bias, dw1, db1, dw2, db2); weight grads
    in fp32 (caller casts to the param dtype)."""
    rows, d = dy.shape
    f = w1.shape[-1]
    if block_rows is None:
        block_rows = 256  # measured best at B/16 (512 regressed 4%)
    block_rows = min(block_rows, rows)
    grid = (pl.cdiv(rows, block_rows),)
    acc = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)  # noqa: E731
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    in_specs = [
        pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        const((1, d)),
        const((1, d)),
        const((d, f)),
        const((1, f)),
        const((f, d)),
    ]
    inputs = [
        dy, x1,
        ln_scale.reshape(1, d), ln_bias.reshape(1, d),
        w1, b1.reshape(1, f), w2,
    ]
    if u is not None:
        in_specs.append(
            pl.BlockSpec((block_rows, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(u)
    outs = pl.pallas_call(
        functools.partial(
            _ln_mlp_bwd_kernel, eps=eps, variant=gelu_variant,
            rows_total=rows, have_u=u is not None, residual=residual,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const((d, f)),
            const((1, f)),
            const((f, d)),
            const((1, d)),
            const((1, d)),
            const((1, d)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d), dy.dtype),
            acc((d, f)), acc((1, f)), acc((f, d)), acc((1, d)),
            acc((1, d)), acc((1, d)),
        ),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * d * f,
            bytes_accessed=(3 * rows * d + 2 * d * f) * dy.dtype.itemsize,
            transcendentals=2 * rows * f,
        ),
        interpret=interpret,
    )(*inputs)
    dx1, dw1, db1, dw2, db2, dgam, dbeta = outs
    return (
        dx1, dgam.reshape(d), dbeta.reshape(d),
        dw1, db1.reshape(f), dw2, db2.reshape(d),
    )




# -- merged kernel C'+B': d[LN2+MLP+residual] chained into d[out_proj+residual]
# One kernel per row block: dx1 never round-trips to HBM between the MLP
# backward and the out_proj backward (measured win at B/16 batch-64).


def _ln_mlp_out_bwd_kernel(*refs, eps, variant, rows_total, have_u):
    if have_u:
        (dy_ref, x1_ref, ctx_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
         wo_ref, u_ref,
         dx_ref, dctx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref,
         dbeta_ref, dwo_ref, dbo_ref) = refs
    else:
        (dy_ref, x1_ref, ctx_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
         wo_ref,
         dx_ref, dctx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref,
         dbeta_ref, dwo_ref, dbo_ref) = refs
        u_ref = None
    cdtype = dy_ref.dtype
    prec = dot_precision(cdtype)
    mask = _row_mask(rows_total, dy_ref.shape[0])
    dy = jnp.where(mask, dy_ref[:].astype(jnp.float32), 0.0)
    x1 = jnp.where(mask, x1_ref[:].astype(jnp.float32), 0.0)
    ctx = jnp.where(mask, ctx_ref[:].astype(jnp.float32), 0.0)

    h2, g, du, du_c, dh2, dx_ln, xhat = _mlp_bwd_core(
        dy, x1, s_ref, b_ref, w1_ref, b1_ref, w2_ref, u_ref, mask, eps,
        variant, cdtype,
    )
    dx1 = dy + dx_ln
    dx_ref[:] = dx1.astype(dx_ref.dtype)

    # chain directly into the out_proj backward while dx1 is in VMEM
    dx1_c = dx1.astype(cdtype)
    dctx_ref[:] = jax.lax.dot_general(
        dx1_c, wo_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dctx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    _mlp_grad_accum(
        dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbeta_ref,
        h2, g, du, du_c, dy, dh2, xhat, cdtype,
    )
    dwo_ref[:] += jax.lax.dot_general(
        ctx.astype(ctx_ref.dtype), dx1_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dbo_ref[:] += jnp.sum(dx1, axis=0, keepdims=True)


def ln_mlp_out_residual_bwd(
    dy, x1, ctx, ln_scale, ln_bias, w1, b1, w2, wo, eps,
    gelu_variant="exact", block_rows=256, interpret=False, u=None,
):
    """Fused VJP of [LN2+MLP+residual] o [out_proj+residual]: returns
    (dx1, dctx, d_ln_scale, d_ln_bias, dw1, db1, dw2, db2, dwo, dbo)."""
    rows, d = dy.shape
    f = w1.shape[-1]
    d_ctx = ctx.shape[-1]
    block_rows = min(block_rows, rows)
    grid = (pl.cdiv(rows, block_rows),)
    acc = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)  # noqa: E731
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    rowblk = lambda w: pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    in_specs = [
        rowblk(d), rowblk(d), rowblk(d_ctx),
        const((1, d)), const((1, d)),
        const((d, f)), const((1, f)), const((f, d)),
        const((d_ctx, d)),
    ]
    inputs = [
        dy, x1, ctx,
        ln_scale.reshape(1, d), ln_bias.reshape(1, d),
        w1, b1.reshape(1, f), w2,
        wo,
    ]
    if u is not None:
        in_specs.append(rowblk(f))
        inputs.append(u)
    outs = pl.pallas_call(
        functools.partial(
            _ln_mlp_out_bwd_kernel, eps=eps, variant=gelu_variant,
            rows_total=rows, have_u=u is not None,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            rowblk(d), rowblk(d_ctx),
            const((d, f)), const((1, f)), const((f, d)), const((1, d)),
            const((1, d)), const((1, d)),
            const((d_ctx, d)), const((1, d)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d), dy.dtype),
            jax.ShapeDtypeStruct((rows, d_ctx), dy.dtype),
            acc((d, f)), acc((1, f)), acc((f, d)), acc((1, d)),
            acc((1, d)), acc((1, d)),
            acc((d_ctx, d)), acc((1, d)),
        ),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * d * f + 4 * rows * d * d_ctx,
            bytes_accessed=(4 * rows * d + 2 * d * f + d_ctx * d) * dy.dtype.itemsize,
            transcendentals=2 * rows * f,
        ),
        interpret=interpret,
    )(*inputs)
    (dx1, dctx, dw1, db1, dw2, db2, dgam, dbeta, dwo, dbo) = outs
    return (
        dx1, dctx, dgam.reshape(d), dbeta.reshape(d),
        dw1, db1.reshape(f), dw2, db2.reshape(d), dwo, dbo.reshape(d),
    )


# -- train variants: the regularized block's backward --------------------------
# The training forward applies dropout (3 torchvision in-block sites) and
# stochastic depth inside kernels B/C (fused_block.out_residual_train /
# ln_mlp_residual_train).  These backward twins regenerate the identical
# masks from the same (seed, site, absolute position) hash — nothing mask-
# shaped is ever stashed — and gate the gradients at the same points:
#
#   out = x1 + dp_mlp ⊙ m_out ⊙ (FC2(m_in ⊙ GELU(FC1(LN2(x1)))) + b2)
#   x1  = x  + dp_attn ⊙ m_attn ⊙ (ctx @ wo + bo)
#
# so d(FC2 input chain) sees dy * dp_mlp * m_out, the GELU grad gates
# through m_in, and d(out_proj chain) sees dx1 * dp_attn * m_attn, while
# the residual passthroughs stay ungated (dy and dx1 themselves).


def _ln_mlp_out_bwd_train_kernel(
    dy_ref, x1_ref, ctx_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, wo_ref,
    dpm_ref, dpa_ref, seed_ref,
    dx_ref, dctx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref,
    dbeta_ref, dwo_ref, dbo_ref, *, eps, variant, rows_total, dropout_p,
):
    cdtype = dy_ref.dtype
    prec = dot_precision(cdtype)
    block_rows = dy_ref.shape[0]
    rows0 = pl.program_id(0) * block_rows
    seed = seed_ref[0, 0].astype(jnp.uint32)
    mask = _row_mask(rows_total, block_rows)
    dy = jnp.where(mask, dy_ref[:].astype(jnp.float32), 0.0)
    x1 = jnp.where(mask, x1_ref[:].astype(jnp.float32), 0.0)
    ctx = jnp.where(mask, ctx_ref[:].astype(jnp.float32), 0.0)
    # the dp_* row-scale operands must be masked too: pallas pads the
    # final partial block with unspecified values (NaN in interpret mode),
    # and 0 * NaN = NaN would poison the dw/db accumulators
    dpm = jnp.where(mask, dpm_ref[:].astype(jnp.float32), 0.0)
    dpa = jnp.where(mask, dpa_ref[:].astype(jnp.float32), 0.0)

    dy_mlp = dy * dpm
    inner_mask = None
    if dropout_p > 0:
        dy_mlp = dy_mlp * dropout_mask(
            seed, DROP_SITE_MLP_OUT, rows0, dy_mlp.shape, dropout_p
        )
        inner_mask = dropout_mask(
            seed, DROP_SITE_MLP_INNER, rows0,
            (block_rows, w1_ref.shape[-1]), dropout_p,
        )
    h2, g, du, du_c, dh2, dx_ln, xhat = _mlp_bwd_core(
        dy_mlp, x1, s_ref, b_ref, w1_ref, b1_ref, w2_ref, None, mask, eps,
        variant, cdtype, inner_mask=inner_mask,
    )
    dx1 = dy + dx_ln
    dx_ref[:] = dx1.astype(dx_ref.dtype)

    # chain into the out_proj backward through ITS regularizer gates
    dz = dx1 * dpa
    if dropout_p > 0:
        dz = dz * dropout_mask(
            seed, DROP_SITE_ATTN_OUT, rows0, dz.shape, dropout_p
        )
    dz_c = dz.astype(cdtype)
    dctx_ref[:] = jax.lax.dot_general(
        dz_c, wo_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dctx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    _mlp_grad_accum(
        dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbeta_ref,
        h2, g, du, du_c, dy_mlp, dh2, xhat, cdtype,
    )
    dwo_ref[:] += jax.lax.dot_general(
        ctx.astype(ctx_ref.dtype), dz_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dbo_ref[:] += jnp.sum(dz, axis=0, keepdims=True)


def ln_mlp_out_residual_bwd_train(
    dy, x1, ctx, ln_scale, ln_bias, w1, b1, w2, wo, dp_mlp, dp_attn, seed,
    dropout_p, eps, gelu_variant="exact", block_rows=256, interpret=False,
):
    """Train twin of :func:`ln_mlp_out_residual_bwd` — same outputs, with
    the dropout/stochastic-depth gradient gates regenerated in-kernel."""
    rows, d = dy.shape
    f = w1.shape[-1]
    d_ctx = ctx.shape[-1]
    block_rows = min(block_rows, rows)
    acc = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)  # noqa: E731
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    rowblk = lambda w: pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    outs = pl.pallas_call(
        functools.partial(
            _ln_mlp_out_bwd_train_kernel, eps=eps, variant=gelu_variant,
            rows_total=rows, dropout_p=dropout_p,
        ),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            rowblk(d), rowblk(d), rowblk(d_ctx),
            const((1, d)), const((1, d)),
            const((d, f)), const((1, f)), const((f, d)),
            const((d_ctx, d)),
            rowblk(1), rowblk(1),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            rowblk(d), rowblk(d_ctx),
            const((d, f)), const((1, f)), const((f, d)), const((1, d)),
            const((1, d)), const((1, d)),
            const((d_ctx, d)), const((1, d)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d), dy.dtype),
            jax.ShapeDtypeStruct((rows, d_ctx), dy.dtype),
            acc((d, f)), acc((1, f)), acc((f, d)), acc((1, d)),
            acc((1, d)), acc((1, d)),
            acc((d_ctx, d)), acc((1, d)),
        ),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * d * f + 4 * rows * d * d_ctx,
            bytes_accessed=(4 * rows * d + 2 * d * f + d_ctx * d) * dy.dtype.itemsize,
            transcendentals=2 * rows * f,
        ),
        interpret=interpret,
    )(
        dy, x1, ctx,
        ln_scale.reshape(1, d), ln_bias.reshape(1, d),
        w1, b1.reshape(1, f), w2, wo,
        dp_mlp.astype(jnp.float32), dp_attn.astype(jnp.float32),
        jnp.asarray(seed).astype(jnp.int32).reshape(1, 1),
    )
    (dx1, dctx, dw1, db1, dw2, db2, dgam, dbeta, dwo, dbo) = outs
    return (
        dx1, dctx, dgam.reshape(d), dbeta.reshape(d),
        dw1, db1.reshape(f), dw2, db2.reshape(d), dwo, dbo.reshape(d),
    )


def _ln_mlp_bwd_train_kernel(
    dy_ref, x1_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, dpm_ref, seed_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbeta_ref,
    *, eps, variant, rows_total, dropout_p,
):
    cdtype = dy_ref.dtype
    block_rows = dy_ref.shape[0]
    rows0 = pl.program_id(0) * block_rows
    seed = seed_ref[0, 0].astype(jnp.uint32)
    mask = _row_mask(rows_total, block_rows)
    dy = jnp.where(mask, dy_ref[:].astype(jnp.float32), 0.0)
    x1 = jnp.where(mask, x1_ref[:].astype(jnp.float32), 0.0)
    # mask the row-scale operand: partial-block padding is unspecified
    # (NaN in interpret mode) and 0 * NaN would poison the accumulators
    dpm = jnp.where(mask, dpm_ref[:].astype(jnp.float32), 0.0)

    dy_mlp = dy * dpm
    inner_mask = None
    if dropout_p > 0:
        dy_mlp = dy_mlp * dropout_mask(
            seed, DROP_SITE_MLP_OUT, rows0, dy_mlp.shape, dropout_p
        )
        inner_mask = dropout_mask(
            seed, DROP_SITE_MLP_INNER, rows0,
            (block_rows, w1_ref.shape[-1]), dropout_p,
        )
    h2, g, du, du_c, dh2, dx_ln, xhat = _mlp_bwd_core(
        dy_mlp, x1, s_ref, b_ref, w1_ref, b1_ref, w2_ref, None, mask, eps,
        variant, cdtype, inner_mask=inner_mask,
    )
    dx_ref[:] = (dy + dx_ln).astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)

    _mlp_grad_accum(
        dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbeta_ref,
        h2, g, du, du_c, dy_mlp, dh2, xhat, cdtype,
    )


def ln_mlp_residual_bwd_train(
    dy, x1, ln_scale, ln_bias, w1, b1, w2, dp_mlp, seed, dropout_p, eps,
    gelu_variant="exact", block_rows=128, interpret=False,
):
    """Train twin of :func:`ln_mlp_residual_bwd` (split form, residual
    passthrough included) — the fallback when the merged kernel's VMEM
    bill overflows (H/14, fp32 L/16)."""
    rows, d = dy.shape
    f = w1.shape[-1]
    block_rows = min(block_rows, rows)
    acc = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)  # noqa: E731
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    rowblk = lambda w: pl.BlockSpec((block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    outs = pl.pallas_call(
        functools.partial(
            _ln_mlp_bwd_train_kernel, eps=eps, variant=gelu_variant,
            rows_total=rows, dropout_p=dropout_p,
        ),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            rowblk(d), rowblk(d),
            const((1, d)), const((1, d)),
            const((d, f)), const((1, f)), const((f, d)),
            rowblk(1),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            rowblk(d),
            const((d, f)), const((1, f)), const((f, d)), const((1, d)),
            const((1, d)), const((1, d)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d), dy.dtype),
            acc((d, f)), acc((1, f)), acc((f, d)), acc((1, d)),
            acc((1, d)), acc((1, d)),
        ),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * d * f,
            bytes_accessed=(3 * rows * d + 2 * d * f) * dy.dtype.itemsize,
            transcendentals=2 * rows * f,
        ),
        interpret=interpret,
    )(
        dy, x1,
        ln_scale.reshape(1, d), ln_bias.reshape(1, d),
        w1, b1.reshape(1, f), w2,
        dp_mlp.astype(jnp.float32),
        jnp.asarray(seed).astype(jnp.int32).reshape(1, 1),
    )
    dx1, dw1, db1, dw2, db2, dgam, dbeta = outs
    return (
        dx1, dgam.reshape(d), dbeta.reshape(d),
        dw1, db1.reshape(f), dw2, db2.reshape(d),
    )


def _out_res_bwd_train_kernel(
    dx1_ref, ctx_ref, wo_ref, dpa_ref, seed_ref, dctx_ref, dwo_ref, dbo_ref,
    *, rows_total, dropout_p,
):
    cdtype = dx1_ref.dtype
    prec = dot_precision(cdtype)
    block_rows = dx1_ref.shape[0]
    rows0 = pl.program_id(0) * block_rows
    mask = _row_mask(rows_total, block_rows)
    dx1 = jnp.where(mask, dx1_ref[:].astype(jnp.float32), 0.0)
    ctx = jnp.where(mask, ctx_ref[:].astype(jnp.float32), 0.0)
    # mask the row-scale operand (partial-block padding is unspecified;
    # NaN in interpret mode) so 0 * NaN can't poison dwo/dbo
    dpa = jnp.where(mask, dpa_ref[:].astype(jnp.float32), 0.0)
    dz = dx1 * dpa
    if dropout_p > 0:
        seed = seed_ref[0, 0].astype(jnp.uint32)
        dz = dz * dropout_mask(
            seed, DROP_SITE_ATTN_OUT, rows0, dz.shape, dropout_p
        )
    dz_c = dz.astype(cdtype)
    dctx_ref[:] = jax.lax.dot_general(
        dz_c, wo_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dctx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    dwo_ref[:] += jax.lax.dot_general(
        ctx.astype(ctx_ref.dtype), dz_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dbo_ref[:] += jnp.sum(dz, axis=0, keepdims=True)


def out_residual_bwd_train(
    dx1, ctx, wo, dp_attn, seed, dropout_p, block_rows=512, interpret=False,
):
    """Train twin of :func:`out_residual_bwd`: gates dx1 through the
    post-attention dropout + stochastic-depth multipliers before the
    out_proj transposes (the residual gradient stays dx1 at the caller)."""
    rows, d_in = ctx.shape
    d = dx1.shape[-1]
    block_rows = min(block_rows, rows)
    outs = pl.pallas_call(
        functools.partial(
            _out_res_bwd_train_kernel, rows_total=rows, dropout_p=dropout_p
        ),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d_in), dx1.dtype),
            jax.ShapeDtypeStruct((d_in, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d * d_in,
            bytes_accessed=(3 * rows * d + d * d_in) * dx1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        dx1, ctx, wo, dp_attn.astype(jnp.float32),
        jnp.asarray(seed).astype(jnp.int32).reshape(1, 1),
    )
    dctx, dwo, dbo = outs
    return dctx, dwo, dbo.reshape(d)


# -- kernel B backward: d[out_proj + residual] --------------------------------


def _out_res_bwd_kernel(
    dx1_ref, ctx_ref, wo_ref, dctx_ref, dwo_ref, dbo_ref, *, rows_total
):
    prec = dot_precision(dx1_ref.dtype)
    mask = _row_mask(rows_total, dx1_ref.shape[0])
    dx1 = jnp.where(mask, dx1_ref[:].astype(jnp.float32), 0.0)
    ctx = jnp.where(mask, ctx_ref[:].astype(jnp.float32), 0.0)
    dx1_c = dx1.astype(dx1_ref.dtype)
    dctx_ref[:] = jax.lax.dot_general(
        dx1_c, wo_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dctx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    dwo_ref[:] += jax.lax.dot_general(
        ctx.astype(ctx_ref.dtype), dx1_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dbo_ref[:] += jnp.sum(dx1, axis=0, keepdims=True)


def out_residual_bwd(dx1, ctx, wo, block_rows=512, interpret=False):
    """VJP of fused_block.out_residual -> (dctx, dwo, dbo).
    (The residual input's gradient is dx1 itself — handled by the caller.)"""
    rows, d_in = ctx.shape
    d = dx1.shape[-1]
    block_rows = min(block_rows, rows)
    outs = pl.pallas_call(
        functools.partial(_out_res_bwd_kernel, rows_total=rows),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d_in), dx1.dtype),
            jax.ShapeDtypeStruct((d_in, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d * d_in,
            bytes_accessed=(3 * rows * d + d * d_in) * dx1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dx1, ctx, wo)
    dctx, dwo, dbo = outs
    return dctx, dwo, dbo.reshape(d)


# -- kernel A backward: d[LN1 + QKV + attention] ------------------------------


def _ln_qkv_attn_bwd_kernel(
    *refs, eps, num_heads, scale, have_qkv, have_dres=True,
    have_log_size=False,
):
    # optional operands are simply absent from the call (not dummy-aliased):
    # [dctx, dres?, x, s, b, w, bias, qkv?, log_size?] + outputs + scratch
    rest = list(refs)
    dctx_ref = rest.pop(0)
    dres_ref = rest.pop(0) if have_dres else None
    x_ref, s_ref, b_ref, w_ref, bias_ref = rest[:5]
    rest = rest[5:]
    qkv_ref = rest.pop(0) if have_qkv else None
    ls_ref = rest.pop(0) if have_log_size else None
    log_size = ls_ref[0, 0] if have_log_size else None
    (dx_ref, dw_ref, dbq_ref, dg_ref, dbeta_ref, dqkv_scr) = rest
    d3 = w_ref.shape[-1]
    dh = d3 // (3 * num_heads)
    cdtype = x_ref.dtype
    prec = dot_precision(cdtype)
    gamma = s_ref[:].astype(jnp.float32)

    # recompute LN1 (cheap, VPU); reuse the stashed packed QKV when the
    # forward saved it (skips the QKV GEMM recompute)
    xf = x_ref[0].astype(jnp.float32)
    xhat, inv = _ln_stats(xf, eps)
    h1 = (xhat * gamma + b_ref[:].astype(jnp.float32)).astype(cdtype)
    if qkv_ref is not None:
        qkv = qkv_ref[0]
    else:
        qkv = jnp.dot(h1, w_ref[:], preferred_element_type=jnp.float32, precision=prec)
        qkv = (qkv + bias_ref[:].astype(jnp.float32)).astype(cdtype)

    # packed (head, {q,k,v}, dh) column order, written straight into the
    # VMEM scratch (a 3*heads-way concat lowered poorly in Mosaic)
    for h in range(num_heads):
        base = h * 3 * dh
        q_s = qkv[:, base : base + dh] * jnp.asarray(scale, cdtype)  # q*scale
        k = qkv[:, base + dh : base + 2 * dh]
        v = qkv[:, base + 2 * dh : base + 3 * dh]
        s_scores = jax.lax.dot_general(
            q_s, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec,
        )
        if log_size is not None:  # ToMe proportional-attention bias — must
            # match the forward's probs (fused_block._head_context)
            s_scores = s_scores + log_size[None, :]
        m = jnp.max(s_scores, axis=-1, keepdims=True)
        e = jnp.exp(s_scores - m)
        p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))  # fp32 probs
        p_c = p.astype(cdtype)

        dctx_h = dctx_ref[0, :, h * dh : (h + 1) * dh].astype(cdtype)
        dv = jax.lax.dot_general(
            p_c, dctx_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec,
        )
        dp = jax.lax.dot_general(
            dctx_h, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_c = ds.astype(cdtype)
        dq = jnp.dot(ds_c, k, preferred_element_type=jnp.float32, precision=prec) * scale
        dk = jax.lax.dot_general(
            ds_c, q_s, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=prec,
        )
        dqkv_scr[:, base : base + dh] = dq
        dqkv_scr[:, base + dh : base + 2 * dh] = dk
        dqkv_scr[:, base + 2 * dh : base + 3 * dh] = dv

    dqkv = dqkv_scr[:]
    dqkv_c = dqkv.astype(cdtype)
    dh1 = jax.lax.dot_general(
        dqkv_c, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dx_ln = _ln_bwd_dx(dh1, xhat, inv, gamma)
    if have_dres:  # fused residual-join (the block backward's path)
        dx_ln = dres_ref[0].astype(jnp.float32) + dx_ln
    dx_ref[0] = dx_ln.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dbq_ref[:] = jnp.zeros_like(dbq_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)

    dw_ref[:] += jax.lax.dot_general(
        h1, dqkv_c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    dbq_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)
    dg_ref[:] += jnp.sum(dh1 * xhat, axis=0, keepdims=True)
    dbeta_ref[:] += jnp.sum(dh1, axis=0, keepdims=True)


def ln_qkv_attn_bwd(
    dctx, dres, x2d, ln_scale, ln_bias, wqkv, bqkv, num_heads, seq_len, eps,
    interpret=False, qkv=None, log_size=None,
):
    # ``dres=None`` skips the residual join (standalone-kernel VJP); the
    # operand is omitted from the call entirely — no dummy DMA per block.
    """VJP of fused_block.ln_qkv_attn, fused with the first residual's
    gradient join: dx = dres + d(LN1+QKV+attention)/dx.

    One grid step per image, mirroring the forward: probs are recomputed in
    VMEM (nothing T^2 was ever stashed to HBM).  ``log_size`` (B, T) fp32,
    when the forward applied ToMe's proportional-attention bias, makes the
    recomputed probs match (sizes are stop-gradient — the bias gets no
    cotangent).  Returns (dx, d_ln_scale, d_ln_bias, dwqkv, dbqkv) with
    weight grads fp32."""
    rows, d = x2d.shape
    d3 = wqkv.shape[-1]
    d_ctx = d3 // 3
    b = rows // seq_len
    scale = 1.0 / ((d_ctx // num_heads) ** 0.5)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)  # noqa: E731
    have_dres = dres is not None
    img_blk = pl.BlockSpec((1, seq_len, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, seq_len, d_ctx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        *([img_blk] if have_dres else []),
        img_blk,
        const((1, d)),
        const((1, d)),
        const((d, d3)),
        const((1, d3)),
    ]
    inputs = [
        dctx.reshape(b, seq_len, d_ctx),
        *([dres.reshape(b, seq_len, d)] if have_dres else []),
        x2d.reshape(b, seq_len, d),
        ln_scale.reshape(1, d),
        ln_bias.reshape(1, d),
        wqkv,
        bqkv.reshape(1, d3),
    ]
    if qkv is not None:
        in_specs.append(
            pl.BlockSpec((1, seq_len, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(qkv.reshape(b, seq_len, d3))
    if log_size is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, seq_len), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(log_size.astype(jnp.float32).reshape(b, 1, seq_len))
    outs = pl.pallas_call(
        functools.partial(
            _ln_qkv_attn_bwd_kernel, eps=eps, num_heads=num_heads,
            scale=scale, have_qkv=qkv is not None, have_dres=have_dres,
            have_log_size=log_size is not None,
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, seq_len, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((d, d3)),
            const((1, d3)),
            const((1, d)),
            const((1, d)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, seq_len, d), x2d.dtype),
            jax.ShapeDtypeStruct((d, d3), jnp.float32),
            jax.ShapeDtypeStruct((1, d3), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((seq_len, d3), jnp.float32)],
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=6 * rows * d * d3 + 10 * b * seq_len * seq_len * d_ctx,
            bytes_accessed=(4 * rows * d + 2 * d * d3) * x2d.dtype.itemsize,
            transcendentals=b * num_heads * seq_len * seq_len,
        ),
        interpret=interpret,
    )(*inputs)
    dx, dw, dbq, dgam, dbeta = outs
    return (
        dx.reshape(rows, d), dgam.reshape(d), dbeta.reshape(d),
        dw, dbq.reshape(d3),
    )


def _merged_bwd_vmem_bytes(d, f, d_ctx, itemsize=2, block_rows=256):
    """Rough scoped-VMEM bill of the merged C'+B' kernel: fp32 weight-grad
    accumulators + resident weight operands + the row-block temps."""
    accum = 4 * (2 * d * f + d_ctx * d)      # dw1, dw2, dwo (fp32)
    weights = itemsize * (2 * d * f + d_ctx * d)  # w1, w2, wo resident
    temps = 4 * block_rows * (3 * f + 6 * d)      # du/dg/h2 + misc fp32 rows
    return accum + weights + temps


# The merged kernel wins when it fits (dx1 never round-trips to HBM), but
# its fp32 dw1+dw2+dwo accumulators grow with d*f: at H/14 (1280x5120)
# they alone are 52 MB and the kernel exceeds the 96 MB scoped-VMEM limit
# at compile time.  Past this budget the backward falls apart into the
# split C' and B' kernels (the pre-merge round-2 form, still all-Pallas).
MERGED_BWD_VMEM_BUDGET = 88 * 1024 * 1024


def fused_encoder_block_bwd(
    x2d, blk, ctx, x1, g, num_heads, seq_len, eps, gelu_variant, interpret,
    qkv=None, u=None,
):
    """Full-block backward from saved (x, ctx, x1[, qkv, u]) residuals.

    Chains C' -> B' -> A' and returns (dx, dblk) with dblk matching the
    params pytree keys/dtypes.  ``qkv``/``u``, when stashed by the forward,
    skip the two big recompute GEMMs."""
    d = x2d.shape[-1]
    f = blk["w1"].shape[-1]
    d_ctx = blk["wo"].shape[0]
    # fp32 training (no --mixed-precision) keeps fp32 weights resident in
    # the kernel, doubling the operand share of the VMEM bill — L/16 fp32
    # merges under itemsize=2 but must split under itemsize=4.
    itemsize = jnp.dtype(blk["w1"].dtype).itemsize
    if _merged_bwd_vmem_bytes(d, f, d_ctx, itemsize) <= MERGED_BWD_VMEM_BUDGET:
        (dx1_mlp, dctx, dg2, dbt2, dw1, db1, dw2, db2, dwo, dbo) = (
            ln_mlp_out_residual_bwd(
                g, x1, ctx, blk["ln2_scale"], blk["ln2_bias"], blk["w1"],
                blk["b1"], blk["w2"], blk["wo"], eps, gelu_variant,
                interpret=interpret, u=u,
            )
        )
    else:
        # split form: C' (with the residual passthrough in dx1), then B'
        (dx1_mlp, dg2, dbt2, dw1, db1, dw2, db2) = ln_mlp_residual_bwd(
            g, x1, blk["ln2_scale"], blk["ln2_bias"], blk["w1"], blk["b1"],
            blk["w2"], eps, gelu_variant, block_rows=128,
            interpret=interpret, u=u, residual=True,
        )
        dctx, dwo, dbo = out_residual_bwd(
            dx1_mlp, ctx, blk["wo"], interpret=interpret
        )
    dx, dg1, dbt1, dwqkv, dbqkv = ln_qkv_attn_bwd(
        dctx, dx1_mlp, x2d, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"],
        blk["bqkv"], num_heads, seq_len, eps, interpret=interpret, qkv=qkv,
    )

    def like(val, ref):
        return val.astype(ref.dtype)

    dblk = {
        "ln1_scale": like(dg1, blk["ln1_scale"]),
        "ln1_bias": like(dbt1, blk["ln1_bias"]),
        "wqkv": like(dwqkv, blk["wqkv"]),
        "bqkv": like(dbqkv, blk["bqkv"]),
        "wo": like(dwo, blk["wo"]),
        "bo": like(dbo, blk["bo"]),
        "ln2_scale": like(dg2, blk["ln2_scale"]),
        "ln2_bias": like(dbt2, blk["ln2_bias"]),
        "w1": like(dw1, blk["w1"]),
        "b1": like(db1, blk["b1"]),
        "w2": like(dw2, blk["w2"]),
        "b2": like(db2, blk["b2"]),
    }
    return dx, dblk


def fused_encoder_block_bwd_train(
    x2d, blk, ctx, x1, g, dp_attn, dp_mlp, seed, dropout_p, num_heads,
    seq_len, eps, gelu_variant, interpret,
):
    """Train twin of :func:`fused_encoder_block_bwd`: the regularized
    block's full backward (dropout + stochastic-depth gates regenerated
    in-kernel from ``seed``).  Same merged-vs-split VMEM routing; kernel A'
    is unchanged (the reference recipe has no attention-probs dropout —
    torchvision's attention_dropout defaults to 0 across the family)."""
    d = x2d.shape[-1]
    f = blk["w1"].shape[-1]
    d_ctx = blk["wo"].shape[0]
    itemsize = jnp.dtype(blk["w1"].dtype).itemsize
    if _merged_bwd_vmem_bytes(d, f, d_ctx, itemsize) <= MERGED_BWD_VMEM_BUDGET:
        (dx1_mlp, dctx, dg2, dbt2, dw1, db1, dw2, db2, dwo, dbo) = (
            ln_mlp_out_residual_bwd_train(
                g, x1, ctx, blk["ln2_scale"], blk["ln2_bias"], blk["w1"],
                blk["b1"], blk["w2"], blk["wo"], dp_mlp, dp_attn, seed,
                dropout_p, eps, gelu_variant, interpret=interpret,
            )
        )
    else:
        (dx1_mlp, dg2, dbt2, dw1, db1, dw2, db2) = ln_mlp_residual_bwd_train(
            g, x1, blk["ln2_scale"], blk["ln2_bias"], blk["w1"], blk["b1"],
            blk["w2"], dp_mlp, seed, dropout_p, eps, gelu_variant,
            interpret=interpret,
        )
        dctx, dwo, dbo = out_residual_bwd_train(
            dx1_mlp, ctx, blk["wo"], dp_attn, seed, dropout_p,
            interpret=interpret,
        )
    dx, dg1, dbt1, dwqkv, dbqkv = ln_qkv_attn_bwd(
        dctx, dx1_mlp, x2d, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"],
        blk["bqkv"], num_heads, seq_len, eps, interpret=interpret,
    )

    def like(val, ref):
        return val.astype(ref.dtype)

    dblk = {
        "ln1_scale": like(dg1, blk["ln1_scale"]),
        "ln1_bias": like(dbt1, blk["ln1_bias"]),
        "wqkv": like(dwqkv, blk["wqkv"]),
        "bqkv": like(dbqkv, blk["bqkv"]),
        "wo": like(dwo, blk["wo"]),
        "bo": like(dbo, blk["bo"]),
        "ln2_scale": like(dg2, blk["ln2_scale"]),
        "ln2_bias": like(dbt2, blk["ln2_bias"]),
        "w1": like(dw1, blk["w1"]),
        "b1": like(db1, blk["b1"]),
        "w2": like(dw2, blk["w2"]),
        "b2": like(db2, blk["b2"]),
    }
    return dx, dblk
