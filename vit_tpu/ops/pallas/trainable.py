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
        # (full per-head (T, T) scores resident); past this point the
        # primal falls back to blockwise flash attention, which has no
        # hand-written backward — fail with guidance instead of blowing
        # the VMEM budget at compile time.
        raise ValueError(
            f"fused_train supports seq_len <= {VMEM_ATTENTION_MAX_T} "
            f"(got {seq_len}); train long sequences with ops='xla' "
            "(autodiff through the flash/XLA path) or sequence "
            "parallelism (vit-tpu-train --sp)"
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
