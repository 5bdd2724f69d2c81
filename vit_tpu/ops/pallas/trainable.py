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

from vit_tpu.ops.pallas.fused_block import (
    fused_encoder_block,
    ln_mlp_residual,
    ln_qkv_attn,
    out_residual,
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
