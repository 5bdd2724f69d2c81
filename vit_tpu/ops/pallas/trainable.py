"""Differentiable wrapper for the fused encoder block.

``pallas_call`` has no automatic VJP, so the megakernel path can't be used
under ``jax.grad`` directly.  This wrapper gives the fused block a custom
VJP: the *forward* runs the three fused Pallas kernels (fast), the
*backward* recomputes the block with the jnp reference ops and
differentiates that (correct by construction, and the recompute doubles as
rematerialization — no activation stash).

Dedicated backward Pallas kernels are the designed next step; this makes
``ops='fused'`` trainable today with the same numerics as the xla path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax

from vit_tpu.ops.pallas.fused_block import fused_encoder_block


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_encoder_block_trainable(
    x2d, blk, num_heads: int, seq_len: int, eps: float, gelu_variant: str = "exact"
):
    return fused_encoder_block(x2d, blk, num_heads, seq_len, eps, gelu_variant)


def _fwd(x2d, blk, num_heads, seq_len, eps, gelu_variant):
    out = fused_encoder_block(x2d, blk, num_heads, seq_len, eps, gelu_variant)
    return out, (x2d, blk)


def _bwd(num_heads, seq_len, eps, gelu_variant, residuals, g):
    x2d, blk = residuals
    _, vjp = jax.vjp(
        lambda x, b: _reference_block_2d(x, b, num_heads, seq_len, eps, gelu_variant),
        x2d,
        blk,
    )
    return vjp(g)


fused_encoder_block_trainable.defvjp(_fwd, _bwd)
