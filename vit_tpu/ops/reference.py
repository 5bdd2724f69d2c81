"""Pure-jnp reference ops — the framework's correctness oracle.

Plays the role of the reference's scalar CPU path (ViT_seq.c:25-324): a slow,
obviously-correct implementation every optimized kernel is checked against.
Numerical conventions follow the reference CPU path (SURVEY.md §4):

  - LayerNorm: eps = 1e-6 *inside* the sqrt (ViT_seq.c:103-121).  (The
    reference GPU kernel omits eps entirely, kernel.cl:63 — we do not
    reproduce that bug.)
  - GELU: exact erf form ``0.5*x*(1+erf(x/sqrt(2)))`` (ViT_seq.c:231-238);
    a tanh-approximation twin is provided for parity with the reference GPU
    kernel (kernel.cl:434-446).
  - Linear: y = x @ W^T + b with W stored [out, in] is the *torchvision*
    layout (ViT_seq.c:240-250); here weights are pre-transposed to [in, out]
    at load time so the hot path is a plain x @ W (MXU-friendly).
  - Attention: packed QKV in_proj with row-block offsets 0/D/2D
    (ViT_seq.c:128-141), per-head scaled dot-product with max-subtracted
    softmax (ViT_seq.c:156-215) — vectorized over heads and batch here.

All ops are batched: activations are (..., T, D).  Everything is functional
and jit-safe (static shapes, no Python control flow on traced values).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def layer_norm(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """Per-token LayerNorm over the last axis (ViT_seq.c:103-121).

    Statistics are computed in float32 regardless of input dtype so the
    bf16 path keeps fp32-quality normalization.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(jnp.square(centered), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    out = centered * inv * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact-erf GELU, the reference CPU convention (ViT_seq.c:232)."""
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + jax.lax.erf(xf / math.sqrt(2.0)))
    return out.astype(x.dtype)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """Tanh-approximation GELU, the reference GPU convention (kernel.cl:442-443)."""
    xf = x.astype(jnp.float32)
    inner = 0.7978845608028654 * (xf + 0.044715 * xf * xf * xf)
    out = 0.5 * xf * (1.0 + jnp.tanh(inner))
    return out.astype(x.dtype)


# This JAX build's DEFAULT matmul precision computes fp32 dots in bf16 (one
# MXU pass), so the fp32 oracle path must pin precision=HIGHEST.  bf16
# operands take DEFAULT (single native MXU pass; HIGHEST costs ~10% there).
def _prec(x: jax.Array):
    return (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ W (+ b); W is [in, out] (pre-transposed torchvision [out, in],
    ViT_seq.c:240-250).  Accumulates in float32 on the MXU."""
    y = jnp.dot(x, w, preferred_element_type=jnp.float32, precision=_prec(x))
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def split_packed_qkv(qkv: jax.Array, num_heads: int):
    """Unpack a (..., T, 3D) projection with (head, {q,k,v}, head_dim)
    column order — THE packing contract (io/weights.py) — into per-head
    (..., H, T, Dh) q, k, v.  One source of truth for every attention
    implementation (XLA, ring-SP); the Pallas kernels slice the same
    columns in-kernel."""
    *lead, t, d3 = qkv.shape
    head_dim = d3 // (3 * num_heads)
    qkv = qkv.reshape(*lead, t, num_heads, 3, head_dim)
    q = jnp.moveaxis(qkv[..., 0, :], -2, -3)
    k = jnp.moveaxis(qkv[..., 1, :], -2, -3)
    v = jnp.moveaxis(qkv[..., 2, :], -2, -3)
    return q, k, v


def merge_heads(ctx: jax.Array) -> jax.Array:
    """(..., H, T, Dh) -> (..., T, H*Dh): inverse of split_packed_qkv's
    head split (the concat at ViT_seq.c:216-223)."""
    *lead, h, t, dh = ctx.shape
    return jnp.moveaxis(ctx, -3, -2).reshape(*lead, t, h * dh)


def attention(
    x: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    num_heads: int,
    *,
    return_probs: bool = False,
    logit_bias: Optional[jax.Array] = None,
    return_kmean: bool = False,
):
    """Multi-head self-attention (ViT_seq.c:123-229, vectorized).

    Args:
      x: (..., T, D) tokens.
      wqkv: (D, 3*D) packed in_proj, pre-transposed from torchvision's
        [3D, D] (Q/K/V row blocks at offsets 0/D/2D, ViT_seq.c:137-141) and
        column-reordered to (heads, 3, head_dim) blocks so a contiguous
        tensor-parallel shard of the output axis is a group of whole heads
        (see vit_tpu.io.weights.params_from_tensors).
      bqkv: (3*D,) packed in_proj bias, same column order.
      wo: (D, D) out_proj, pre-transposed.
      bo: (D,) out_proj bias.
      num_heads: head count; head_dim = D // num_heads.

    The reference loops heads serially with a 197x197 score buffer per head
    (ViT_opencl.c:523-564); here heads are a tensor axis and XLA batches the
    whole thing onto the MXU.  Softmax is max-subtracted (ViT_seq.c:171-189)
    and computed in float32.

    ``logit_bias`` (..., T) fp32, when given, adds a per-KEY bias to the
    scaled logits (ToMe proportional attention: softmax(qk^T/sqrt(dh) +
    log s), ops/tome.py).  ``return_kmean`` additionally returns the mean
    attention key over heads (..., T, head_dim) — ToMe's similarity
    metric.  The fused kernel twin of both lives in
    ops/pallas/fused_block.ln_qkv_attn.
    """
    *lead, t, d = x.shape
    qkv = linear(x, wqkv, bqkv)  # (..., T, 3D), columns (H, 3, Dh)-ordered
    q, k, v = split_packed_qkv(qkv, num_heads)
    head_dim = q.shape[-1]

    scale = 1.0 / math.sqrt(head_dim)  # 1/sqrt(64), ViT_seq.c:160
    scores = (
        jnp.einsum(
            "...hqd,...hkd->...hqk",
            q,
            k,
            preferred_element_type=jnp.float32,
            precision=_prec(x),
        )
        * scale
    )
    if logit_bias is not None:
        scores = scores + logit_bias[..., None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)  # fp32, max-subtracted
    ctx = jnp.einsum(
        "...hqk,...hkd->...hqd",
        probs.astype(x.dtype),
        v,
        preferred_element_type=jnp.float32,
        precision=_prec(x),
    ).astype(x.dtype)
    ctx = merge_heads(ctx)  # (..., T, D)
    out = linear(ctx, wo, bo)
    if return_probs:
        # interpretability probe: the reference materializes exactly these
        # per-head probability rows on device (ViT_opencl.c:523-532) but
        # never exposes them; here they're an opt-in second output
        return out, probs
    if return_kmean:
        return out, k.mean(axis=-3)  # heads axis of (..., H, T, Dh)
    return out


def dropout(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    """Inverted dropout (train-time scaling; eval applies nothing).

    The reference hard-codes every dropout to 0 (ViT_seq.c:10-21); this
    exists for the training recipe's torchvision-placement dropout."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0).astype(x.dtype)


def mlp(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    gelu_variant: str = "exact",
    inner_dropout=None,
) -> jax.Array:
    """MLP block: Linear(D->F) -> GELU -> Linear(F->D) (ViT_seq.c:251-268).

    ``inner_dropout``: optional ``(rng, rate)`` applying torchvision
    MLPBlock's dropout between GELU and the second linear (the post-FC2
    dropout is the caller's, models/vit.encoder_block)."""
    h = linear(x, w1, b1)
    h = gelu_exact(h) if gelu_variant == "exact" else gelu_tanh(h)
    if inner_dropout is not None:
        rng, rate = inner_dropout
        h = dropout(h, rate, rng)
    return linear(h, w2, b2)


def patch_embed(
    images: jax.Array, kernel: jax.Array, bias: jax.Array, patch_size: int
) -> jax.Array:
    """Patch embedding as reshape + GEMM — the idiomatic MXU formulation.

    Replaces the reference's naive 6-deep conv loop (ViT_seq.c:25-50) and
    Conv2d_Kernel (kernel.cl:120-175): a stride-p valid pxp conv over NCHW is
    exactly a GEMM on channel-major-flattened patches.

    Args:
      images: (..., C, H, W) in torchvision NCHW order.
      kernel: (C*p*p, D), the torchvision conv_proj_weight [D, C, p, p]
        flattened over (C, kh, kw) — matching the patch flatten order below
        (ViT_seq.c:36-41 indexing) — then transposed.
      bias: (D,).

    Returns:
      (..., num_patches, D) patch tokens, row-major over (gh, gw) — the same
      order as the reference's flatten_transpose (ViT_seq.c:52-70).
    """
    *lead, c, h, w = images.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = images.reshape(*lead, c, gh, p, gw, p)
    # -> (..., gh, gw, c, ph, pw): patch-major rows, channel-major within a patch
    x = jnp.moveaxis(x, (-5, -4, -3, -2, -1), (-3, -5, -2, -4, -1))
    x = x.reshape(*lead, gh * gw, c * p * p)
    return linear(x, kernel, bias)


def add_cls_and_pos(
    patches: jax.Array, cls_token: jax.Array, pos_embed: jax.Array
) -> jax.Array:
    """Prepend the learned prefix token(s) and add position embeddings
    (class_token ViT_seq.c:72-90, pos_emb ViT_seq.c:92-101).

    ``cls_token`` is either (D,) — the single CLS token, the reference's
    only case — or a (P, D) stack of prefix tokens (CLS + DeiT's
    distillation token; see vit_tpu.models.vit.prefix_tokens)."""
    *lead, n, d = patches.shape
    p = 1 if cls_token.ndim == 1 else cls_token.shape[0]
    cls = jnp.broadcast_to(
        cls_token.astype(patches.dtype).reshape(p, d), (*lead, p, d)
    )
    x = jnp.concatenate([cls, patches], axis=-2)
    return x + pos_embed.astype(patches.dtype)


def softmax(logits: jax.Array, axis: int = -1) -> jax.Array:
    """Max-subtracted softmax over class logits (ViT_seq.c:304-324), in fp32."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=axis)
