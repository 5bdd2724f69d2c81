"""Differentiable wrapper for the fused encoder block.

``pallas_call`` has no automatic VJP, so the megakernel path carries a
custom one.  The *forward* runs the three fused Pallas kernels and stashes
only (x, ctx, x1) per layer; the *backward* runs hand-written backward
Pallas kernels (vit_tpu.ops.pallas.backward) that recompute LN/QKV/softmax
in VMEM and accumulate weight grads in fp32 — the round-1 jnp-recompute
backward is kept as ``fused_encoder_block_trainable_ref`` (it remains the
numerical cross-check in tests/test_backward.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vit_tpu.ops.pallas.fused_block import (
    DROP_SITE_ATTN_OUT,
    DROP_SITE_DP_ATTN,
    DROP_SITE_DP_MLP,
    DROP_SITE_MLP_INNER,
    DROP_SITE_MLP_OUT,
    drop_path_scale_rows,
    dropout_mask,
    fused_encoder_block,
    ln_mlp_residual,
    ln_mlp_residual_train,
    ln_qkv_attn,
    out_residual,
    out_residual_train,
)


def _reference_block_2d(x2d, blk, num_heads, seq_len, eps, gelu_variant):
    """The same block computation, composed from differentiable jnp ops
    (pre-LN block structure, Encoder ViT_seq.c:271-302)."""
    from vit_tpu.ops import reference as R

    rows, d = x2d.shape
    x = x2d.reshape(rows // seq_len, seq_len, d)
    h = R.layer_norm(x, blk["ln1_scale"], blk["ln1_bias"], eps)
    x = x + R.attention(h, blk["wqkv"], blk["bqkv"], blk["wo"], blk["bo"], num_heads)
    h = R.layer_norm(x, blk["ln2_scale"], blk["ln2_bias"], eps)
    x = x + R.mlp(h, blk["w1"], blk["b1"], blk["w2"], blk["b2"], gelu_variant)
    return x.reshape(rows, d)


# -- flagship: Pallas forward + Pallas backward -------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_encoder_block_trainable(
    x2d, blk, num_heads: int, seq_len: int, eps: float, gelu_variant: str = "exact"
):
    return fused_encoder_block(x2d, blk, num_heads, seq_len, eps, gelu_variant)


def _fwd(x2d, blk, num_heads, seq_len, eps, gelu_variant):
    from vit_tpu.ops.pallas import interpret_default
    from vit_tpu.ops.pallas.fused_block import VMEM_ATTENTION_MAX_T

    if seq_len > VMEM_ATTENTION_MAX_T:
        # The backward megakernels assume the single-tile VMEM attention
        # (full per-head (T, T) scores resident); long sequences train
        # through the blockwise flash VJP instead — dispatched one level
        # up, so reaching this branch means the caller bypassed it.
        raise ValueError(
            f"fused_encoder_block_trainable supports seq_len <= "
            f"{VMEM_ATTENTION_MAX_T} (got {seq_len}); use "
            "encoder_block_trainable (the fused_train ops table), which "
            "routes long sequences through the flash-attention VJP"
        )
    interpret = interpret_default()
    # Stash only (x, ctx, x1); the backward recomputes LN/QKV/probs/FC1 in
    # VMEM.  Stashing qkv / pre-GELU u instead was measured SLOWER on-chip
    # (72.5 -> 78.7 / 79.4 ms at B/16 batch-64: the extra per-grid-step
    # VMEM->HBM stash writes serialize the forward kernels' pipelines more
    # than the recompute GEMMs cost) — the return_qkv/return_u hooks remain
    # for memory-constrained recompute-free schedules.
    ctx = ln_qkv_attn(
        x2d, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"], blk["bqkv"],
        num_heads, seq_len, eps, interpret=interpret,
    )
    x1 = out_residual(ctx, x2d, blk["wo"], blk["bo"], interpret=interpret)
    out = ln_mlp_residual(
        x1, blk["ln2_scale"], blk["ln2_bias"], blk["w1"], blk["b1"],
        blk["w2"], blk["b2"], eps, gelu_variant, interpret=interpret,
    )
    return out, (x2d, blk, ctx, x1, None, None)


def _bwd(num_heads, seq_len, eps, gelu_variant, residuals, g):
    from vit_tpu.ops.pallas import interpret_default
    from vit_tpu.ops.pallas.backward import fused_encoder_block_bwd

    x2d, blk, ctx, x1, qkv, u = residuals
    dx, dblk = fused_encoder_block_bwd(
        x2d, blk, ctx, x1, g, num_heads, seq_len, eps, gelu_variant,
        interpret=interpret_default(), qkv=qkv, u=u,
    )
    return dx, dblk


fused_encoder_block_trainable.defvjp(_fwd, _bwd)


# -- regularized trainable block: dropout + stochastic depth in-kernel --------
# The standard ViT/DeiT training recipe needs dropout (torchvision's three
# in-block sites — the constants the reference hard-codes to 0,
# ViT_seq.c:10-21) and stochastic depth.  Both run INSIDE kernels B/C
# (fused_block.out_residual_train / ln_mlp_residual_train); the backward
# megakernels regenerate the identical masks from the per-layer seed
# (backward.fused_encoder_block_bwd_train), so the 2.1x training path no
# longer forfeits the regularizers to --ops xla.


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _fused_encoder_block_train(
    x2d, blk, dp_attn, dp_mlp, seed,
    num_heads: int, seq_len: int, eps: float, gelu_variant: str,
    dropout_p: float,
):
    out, _ = _train_fwd(
        x2d, blk, dp_attn, dp_mlp, seed, num_heads, seq_len, eps,
        gelu_variant, dropout_p,
    )
    return out


def _train_fwd(
    x2d, blk, dp_attn, dp_mlp, seed, num_heads, seq_len, eps, gelu_variant,
    dropout_p,
):
    from vit_tpu.ops.pallas import interpret_default

    interpret = interpret_default()
    ctx = ln_qkv_attn(
        x2d, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"], blk["bqkv"],
        num_heads, seq_len, eps, interpret=interpret,
    )
    x1 = out_residual_train(
        ctx, x2d, blk["wo"], blk["bo"], dp_attn, seed, dropout_p,
        interpret=interpret,
    )
    out = ln_mlp_residual_train(
        x1, blk["ln2_scale"], blk["ln2_bias"], blk["w1"], blk["b1"],
        blk["w2"], blk["b2"], dp_mlp, seed, dropout_p, eps, gelu_variant,
        interpret=interpret,
    )
    return out, (x2d, blk, ctx, x1, dp_attn, dp_mlp, seed)


def _train_bwd(
    num_heads, seq_len, eps, gelu_variant, dropout_p, residuals, g
):
    from vit_tpu.ops.pallas import interpret_default
    from vit_tpu.ops.pallas.backward import fused_encoder_block_bwd_train

    x2d, blk, ctx, x1, dp_attn, dp_mlp, seed = residuals
    dx, dblk = fused_encoder_block_bwd_train(
        x2d, blk, ctx, x1, g, dp_attn, dp_mlp, seed, dropout_p, num_heads,
        seq_len, eps, gelu_variant, interpret=interpret_default(),
    )
    # the mask inputs are deterministic functions of the seed — nothing
    # differentiates through them (zeros, not None: they are float arrays)
    return dx, dblk, jnp.zeros_like(dp_attn), jnp.zeros_like(dp_mlp), None


_fused_encoder_block_train.defvjp(_train_fwd, _train_bwd)


def encoder_block_train(
    x2d, blk, num_heads: int, seq_len: int, eps: float, gelu_variant: str,
    seed, dropout_p: float, drop_path_rate,
):
    """The fused_train ops table's REGULARIZED encoder block.

    ``seed``: uint32 scalar array (one per layer, scanned); ``dropout_p``:
    static config rate; ``drop_path_rate``: possibly-traced per-layer
    stochastic-depth rate (the linear schedule).  The per-sample
    stochastic-depth scale rows are tiny and computed in plain XLA; the
    elementwise dropout masks are regenerated in-kernel from the seed."""
    from vit_tpu.ops.pallas.fused_block import VMEM_ATTENTION_MAX_T

    if seq_len > VMEM_ATTENTION_MAX_T:
        raise ValueError(
            f"dropout/drop-path through the fused kernels supports "
            f"seq_len <= {VMEM_ATTENTION_MAX_T} (got {seq_len}); train "
            "very long sequences with --ops xla (flash-VJP dropout hooks "
            "are not wired)"
        )
    rows = x2d.shape[0]
    b = rows // seq_len
    seed_u = jnp.asarray(seed).astype(jnp.uint32)
    dp_attn = drop_path_scale_rows(
        seed_u, DROP_SITE_DP_ATTN, b, seq_len, drop_path_rate
    )
    dp_mlp = drop_path_scale_rows(
        seed_u, DROP_SITE_DP_MLP, b, seq_len, drop_path_rate
    )
    return _fused_encoder_block_train(
        x2d, blk, dp_attn, dp_mlp, seed_u, num_heads, seq_len, eps,
        gelu_variant, float(dropout_p),
    )


def train_block_reference_2d(
    x2d, blk, num_heads, seq_len, eps, gelu_variant, seed, dropout_p,
    drop_path_rate,
):
    """jnp twin of :func:`encoder_block_train` with BIT-IDENTICAL masks
    (same position-hash) — the grad-parity oracle for the regularized
    kernels (tests/test_backward.py)."""
    from vit_tpu.ops import reference as R

    rows, d = x2d.shape
    b = rows // seq_len
    seed_u = jnp.asarray(seed).astype(jnp.uint32)
    dp_attn = drop_path_scale_rows(
        seed_u, DROP_SITE_DP_ATTN, b, seq_len, drop_path_rate
    )
    dp_mlp = drop_path_scale_rows(
        seed_u, DROP_SITE_DP_MLP, b, seq_len, drop_path_rate
    )

    def drop(x, site, ncols):
        if dropout_p <= 0:
            return x
        m = dropout_mask(seed_u, site, 0, (rows, ncols), dropout_p)
        return x * m.astype(x.dtype)

    x = x2d.reshape(b, seq_len, d)
    h = R.layer_norm(x, blk["ln1_scale"], blk["ln1_bias"], eps)
    h = R.attention(
        h, blk["wqkv"], blk["bqkv"], blk["wo"], blk["bo"], num_heads
    ).reshape(rows, d)
    h = drop(h, DROP_SITE_ATTN_OUT, d) * dp_attn.astype(h.dtype)
    x1 = x2d + h
    h = R.layer_norm(
        x1.reshape(b, seq_len, d), blk["ln2_scale"], blk["ln2_bias"], eps
    ).reshape(rows, d)
    u = R.linear(h, blk["w1"], blk["b1"])
    g = R.gelu_exact(u) if gelu_variant == "exact" else R.gelu_tanh(u)
    g = drop(g, DROP_SITE_MLP_INNER, blk["w1"].shape[-1])
    y = R.linear(g, blk["w2"], blk["b2"])
    y = drop(y, DROP_SITE_MLP_OUT, d) * dp_mlp.astype(y.dtype)
    return x1 + y


# -- round-1 fallback: Pallas forward + jnp-recompute backward ----------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_encoder_block_trainable_ref(
    x2d, blk, num_heads: int, seq_len: int, eps: float, gelu_variant: str = "exact"
):
    return fused_encoder_block(x2d, blk, num_heads, seq_len, eps, gelu_variant)


def _fwd_ref(x2d, blk, num_heads, seq_len, eps, gelu_variant):
    out = fused_encoder_block(x2d, blk, num_heads, seq_len, eps, gelu_variant)
    return out, (x2d, blk)


def _bwd_ref(num_heads, seq_len, eps, gelu_variant, residuals, g):
    x2d, blk = residuals
    _, vjp = jax.vjp(
        lambda x, b: _reference_block_2d(x, b, num_heads, seq_len, eps, gelu_variant),
        x2d,
        blk,
    )
    return vjp(g)


fused_encoder_block_trainable_ref.defvjp(_fwd_ref, _bwd_ref)


# -- differentiable ToMe kernel A ---------------------------------------------
# Train-time token merging (models/tome.forward_train) runs the block
# HALVES separately (the merge sits between out_proj and the MLP), so
# kernel A needs its own VJP — with the ToMe extras: the log-size
# proportional-attention bias (recomputed into the backward's probs) and
# the kmean metric output (stop-gradient by construction: the ToMe paper
# trains with the matching treated as a constant, so its cotangent is
# discarded).


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def tome_ln_qkv_attn_diff(
    x2d, ln_scale, ln_bias, wqkv, bqkv, log_size,
    num_heads: int, seq_len: int, eps: float, return_kmean: bool,
):
    """Differentiable [LN1+QKV+attention(+bias)] -> ctx (or (ctx, kmean))."""
    out, _ = _lqa_fwd(
        x2d, ln_scale, ln_bias, wqkv, bqkv, log_size,
        num_heads, seq_len, eps, return_kmean,
    )
    return out


def _lqa_fwd(
    x2d, ln_scale, ln_bias, wqkv, bqkv, log_size,
    num_heads, seq_len, eps, return_kmean,
):
    from vit_tpu.ops.pallas import interpret_default

    out = ln_qkv_attn(
        x2d, ln_scale, ln_bias, wqkv, bqkv, num_heads, seq_len, eps,
        interpret=interpret_default(), log_size=log_size,
        return_kmean=return_kmean,
    )
    return out, (x2d, ln_scale, ln_bias, wqkv, bqkv, log_size)


def _lqa_bwd(num_heads, seq_len, eps, return_kmean, residuals, g):
    from vit_tpu.ops.pallas import interpret_default
    from vit_tpu.ops.pallas.backward import ln_qkv_attn_bwd

    x2d, ln_scale, ln_bias, wqkv, bqkv, log_size = residuals
    g_ctx = g[0] if return_kmean else g  # kmean metric is stop-gradient
    dx, ds, db, dw, dbias = ln_qkv_attn_bwd(
        g_ctx, None, x2d, ln_scale, ln_bias, wqkv, bqkv, num_heads,
        seq_len, eps, interpret=interpret_default(), log_size=log_size,
    )
    return (
        dx, ds.astype(ln_scale.dtype), db.astype(ln_bias.dtype),
        dw.astype(wqkv.dtype), dbias.astype(bqkv.dtype),
        None if log_size is None else jnp.zeros_like(log_size),
    )


tome_ln_qkv_attn_diff.defvjp(_lqa_fwd, _lqa_bwd)


# -- long-sequence trainable block (seq_len > VMEM_ATTENTION_MAX_T) ----------
# The T^2 work runs through the blockwise flash-attention kernels in BOTH
# directions (flash_attention carries its own Pallas VJP); out_proj and the
# MLP run through the forward megakernels with custom VJPs backed by the
# backward megakernels.  Only LN1+QKV (a thin GEMM at long T) stays jnp.


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _out_residual_diff(ctx, res, wo, bo, interpret):
    from vit_tpu.ops.pallas.fused_block import out_residual

    return out_residual(ctx, res, wo, bo, interpret=interpret)


def _ores_fwd(ctx, res, wo, bo, interpret):
    return _out_residual_diff(ctx, res, wo, bo, interpret), (ctx, wo, bo)


def _ores_bwd(interpret, residuals, g):
    from vit_tpu.ops.pallas.backward import out_residual_bwd

    ctx, wo, bo = residuals
    dctx, dwo, dbo = out_residual_bwd(g, ctx, wo, interpret=interpret)
    return dctx, g, dwo.astype(wo.dtype), dbo.astype(bo.dtype)


_out_residual_diff.defvjp(_ores_fwd, _ores_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _ln_mlp_residual_diff(x1, s, b, w1, b1, w2, b2, eps, gelu_variant, interpret):
    from vit_tpu.ops.pallas.fused_block import ln_mlp_residual

    return ln_mlp_residual(
        x1, s, b, w1, b1, w2, b2, eps, gelu_variant, interpret=interpret
    )


def _lmr_fwd(x1, s, b, w1, b1, w2, b2, eps, gelu_variant, interpret):
    out = _ln_mlp_residual_diff(x1, s, b, w1, b1, w2, b2, eps, gelu_variant, interpret)
    return out, (x1, s, b, w1, b1, w2, b2)


def _lmr_bwd(eps, gelu_variant, interpret, residuals, g):
    from vit_tpu.ops.pallas.backward import ln_mlp_residual_bwd

    x1, s, b, w1, b1, w2, b2 = residuals
    dx1, ds, db, dw1, db1, dw2, db2 = ln_mlp_residual_bwd(
        g, x1, s, b, w1, b1, w2, eps, gelu_variant, interpret=interpret,
        residual=True,
    )
    return (
        dx1, ds.astype(s.dtype), db.astype(b.dtype), dw1.astype(w1.dtype),
        db1.astype(b1.dtype), dw2.astype(w2.dtype), db2.astype(b2.dtype),
    )


_ln_mlp_residual_diff.defvjp(_lmr_fwd, _lmr_bwd)


# -- regularized split pieces (train-time ToMe x dropout/drop-path) -----------
# The merged-token forward composes split kernels (A / B / C with a merge
# GEMM between B and C), so its regularizers ride the split train kernels
# (out_residual_train / ln_mlp_residual_train) with the split mask-
# regenerating backwards — same in-kernel masks as encoder_block_train.


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _out_residual_diff_train(ctx, res, wo, bo, dp_attn, seed, dropout_p,
                             interpret):
    return out_residual_train(
        ctx, res, wo, bo, dp_attn, seed, dropout_p, interpret=interpret
    )


def _orest_fwd(ctx, res, wo, bo, dp_attn, seed, dropout_p, interpret):
    out = _out_residual_diff_train(
        ctx, res, wo, bo, dp_attn, seed, dropout_p, interpret
    )
    return out, (ctx, wo, bo, dp_attn, seed)


def _orest_bwd(dropout_p, interpret, residuals, g):
    from vit_tpu.ops.pallas.backward import out_residual_bwd_train

    ctx, wo, bo, dp_attn, seed = residuals
    dctx, dwo, dbo = out_residual_bwd_train(
        g, ctx, wo, dp_attn, seed, dropout_p, interpret=interpret
    )
    # the residual gradient passes through untouched (g); masks/seed are
    # deterministic functions of the seed — nothing differentiates them
    return (
        dctx, g, dwo.astype(wo.dtype), dbo.astype(bo.dtype),
        jnp.zeros_like(dp_attn), None,
    )


_out_residual_diff_train.defvjp(_orest_fwd, _orest_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _ln_mlp_residual_diff_train(x1, s, b, w1, b1, w2, b2, dp_mlp, seed,
                                dropout_p, eps, gelu_variant, interpret):
    return ln_mlp_residual_train(
        x1, s, b, w1, b1, w2, b2, dp_mlp, seed, dropout_p, eps,
        gelu_variant, interpret=interpret,
    )


def _lmrt_fwd(x1, s, b, w1, b1, w2, b2, dp_mlp, seed, dropout_p, eps,
              gelu_variant, interpret):
    out = _ln_mlp_residual_diff_train(
        x1, s, b, w1, b1, w2, b2, dp_mlp, seed, dropout_p, eps,
        gelu_variant, interpret,
    )
    return out, (x1, s, b, w1, b1, w2, b2, dp_mlp, seed)


def _lmrt_bwd(dropout_p, eps, gelu_variant, interpret, residuals, g):
    from vit_tpu.ops.pallas.backward import ln_mlp_residual_bwd_train

    x1, s, b, w1, b1, w2, b2, dp_mlp, seed = residuals
    dx1, ds, db, dw1, db1, dw2, db2 = ln_mlp_residual_bwd_train(
        g, x1, s, b, w1, b1, w2, dp_mlp, seed, dropout_p, eps,
        gelu_variant, interpret=interpret,
    )
    return (
        dx1, ds.astype(s.dtype), db.astype(b.dtype), dw1.astype(w1.dtype),
        db1.astype(b1.dtype), dw2.astype(w2.dtype), db2.astype(b2.dtype),
        jnp.zeros_like(dp_mlp), None,
    )


_ln_mlp_residual_diff_train.defvjp(_lmrt_fwd, _lmrt_bwd)


def _long_seq_block_trainable(x2d, blk, num_heads, seq_len, eps, gelu_variant):
    """Differentiable long-sequence encoder block: flash attention (Pallas
    VJP) + megakernel out_proj/MLP (custom VJPs over the backward kernels).
    Mirrors fused_block._long_seq_block's primal structure."""
    from vit_tpu.ops import reference
    from vit_tpu.ops.pallas import interpret_default
    from vit_tpu.ops.pallas.flash_attention import flash_context_from_packed_qkv

    interpret = interpret_default()
    rows, d = x2d.shape
    b = rows // seq_len
    x3 = x2d.reshape(b, seq_len, d)
    h = reference.layer_norm(x3, blk["ln1_scale"], blk["ln1_bias"], eps)
    qkv = reference.linear(h, blk["wqkv"], blk["bqkv"])  # columns (H, 3, Dh)
    ctx2 = flash_context_from_packed_qkv(
        qkv, b, seq_len, num_heads, interpret=interpret
    )
    x1 = _out_residual_diff(ctx2, x2d, blk["wo"], blk["bo"], interpret)
    return _ln_mlp_residual_diff(
        x1, blk["ln2_scale"], blk["ln2_bias"], blk["w1"], blk["b1"],
        blk["w2"], blk["b2"], eps, gelu_variant, interpret,
    )


def encoder_block_trainable(
    x2d, blk, num_heads: int, seq_len: int, eps: float, gelu_variant: str = "exact"
):
    """The fused_train ops table's encoder block: megakernel forward +
    hand-written backward kernels at ViT-native sequence lengths, blockwise
    flash-attention VJP past VMEM_ATTENTION_MAX_T (any-resolution training)."""
    from vit_tpu.ops.pallas.fused_block import VMEM_ATTENTION_MAX_T

    if seq_len > VMEM_ATTENTION_MAX_T:
        return _long_seq_block_trainable(
            x2d, blk, num_heads, seq_len, eps, gelu_variant
        )
    return fused_encoder_block_trainable(
        x2d, blk, num_heads, seq_len, eps, gelu_variant
    )
