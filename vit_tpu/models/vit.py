"""Functional ViT forward pass on a params pytree.

Replaces the reference's two hand-unrolled model graphs (`ViT_seq`
ViT_seq.c:326-439 with 12 explicit Encoder calls at :366-426, and
`ViT_opencl` ViT_opencl.c:785-883 with the unrolled encoders at :813-871).
TPU-first differences:

  - Encoder layers are *stacked* on a leading axis and iterated with
    ``lax.scan`` — one compiled block body instead of 12 unrolled copies
    (faster compile, natural seam for pipeline-parallel sharding).
  - The whole batch flows through at once (the reference loops images
    serially, ViT_seq.c:354 / ViT_opencl.c:802); batching tokens across
    images is what fills the MXU (SURVEY.md §7 "hard parts").
  - Everything is a pure function of (params, images): XLA owns residency,
    so there are no host round-trips (the reference crosses PCIe ≥8x per
    encoder layer, SURVEY.md §3.2).

Params pytree layout (all weights pre-transposed to [in, out] at load time —
see vit_tpu.io.weights for the mapping from torchvision's 152-tensor layout):

  {
    'cls_token':  (D,),
    'patch_embed': {'kernel': (C*p*p, D), 'bias': (D,)},
    'pos_embed':  (T, D),
    'blocks': {                       # leading axis L = depth (stacked)
      'ln1_scale': (L, D), 'ln1_bias': (L, D),
      'wqkv': (L, D, 3D), 'bqkv': (L, 3D),   # columns (head, {q,k,v}, head_dim)-ordered
      'wo':   (L, D, D),  'bo':   (L, D),
      'ln2_scale': (L, D), 'ln2_bias': (L, D),
      'w1': (L, D, F), 'b1': (L, F),
      'w2': (L, F, D), 'b2': (L, D),
    },
    'ln_final': {'scale': (D,), 'bias': (D,)},
    'head': {'kernel': (D, num_classes), 'bias': (num_classes,)},
  }
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vit_tpu.config import ViTConfig
from vit_tpu.ops import reference
from vit_tpu.ops.dispatch import REFERENCE_OPS, OpsImpl

Params = Dict[str, Any]


def prefix_tokens(params: Params) -> jax.Array:
    """The learned prefix-token stack to prepend to the patch sequence:
    (D,) CLS alone (the reference's only case, ViT_seq.c:72-90), or the
    (2, D) [CLS, distillation] stack for DeiT-distilled params."""
    dist = params.get("dist_token")
    if dist is None:
        return params["cls_token"]
    return jnp.stack([params["cls_token"], dist])


def apply_head(x: jax.Array, params: Params, separate: bool = False):
    """Final-LN activations (..., T, D) -> logits (..., num_classes).

    CLS row through the classifier (ViT_seq.c:433-435); DeiT-distilled
    params additionally run the distillation token (row 1) through its own
    head and average the two — HF's DeiTForImageClassificationWithTeacher
    eval semantics.  ``separate`` returns the (cls_logits, dist_logits)
    pair instead of the average — the DeiT distillation loss trains each
    head against a different target (runtime.trainer.distillation_loss)."""
    logits = reference.linear(
        x[..., 0, :], params["head"]["kernel"], params["head"]["bias"]
    ).astype(jnp.float32)
    dist_head = params.get("head_dist")
    if dist_head is None:
        if separate:
            raise ValueError(
                "separate head logits need DeiT-distilled params (head_dist)"
            )
        return logits
    dist_logits = reference.linear(
        x[..., 1, :], dist_head["kernel"], dist_head["bias"]
    ).astype(jnp.float32)
    if separate:
        return logits, dist_logits
    return (logits + dist_logits) * 0.5


def encoder_block(
    x: jax.Array,
    blk: Dict[str, jax.Array],
    cfg: ViTConfig,
    ops: OpsImpl = REFERENCE_OPS,
    gelu_variant: str = "exact",
    dropout_rng: Optional[jax.Array] = None,
    drop_path_rate=0.0,
) -> jax.Array:
    """One pre-LN encoder block: LN1→MHA→residual; LN2→MLP→residual
    (Encoder, ViT_seq.c:271-302).

    ``dropout_rng``: when given and cfg.dropout > 0, applies dropout at
    torchvision's in-block training placement — after the attention
    out_proj, between the MLP's GELU and FC2 (via ops.mlp's
    ``inner_dropout`` hook), and after FC2 (torchvision's fourth site,
    on input+pos_embedding, lives in :func:`forward`; the reference
    hard-codes all dropouts to 0, ViT_seq.c:10-21, so inference parity
    is unaffected).  When given and cfg.drop_path > 0, additionally
    applies stochastic depth (per-SAMPLE residual-branch drop, the ViT
    regularizer the reference never needed) at ``drop_path_rate`` — a
    possibly-traced scalar, since the rate scales linearly with depth.
    """
    use_rng = dropout_rng is not None
    if use_rng:
        k1, k2, k3, k4, k5 = jax.random.split(dropout_rng, 5)
    h = ops.layer_norm(x, blk["ln1_scale"], blk["ln1_bias"], cfg.layernorm_eps)
    h = ops.attention(h, blk["wqkv"], blk["bqkv"], blk["wo"], blk["bo"], cfg.num_heads)
    if use_rng and cfg.dropout > 0:
        h = _dropout(h, cfg.dropout, k1)
    if use_rng and cfg.drop_path > 0:
        h = _drop_path(h, drop_path_rate, k3)
    x = x + h
    h = ops.layer_norm(x, blk["ln2_scale"], blk["ln2_bias"], cfg.layernorm_eps)
    mlp_kw = (
        {"inner_dropout": (k5, cfg.dropout)}
        if use_rng and cfg.dropout > 0 else {}
    )
    h = ops.mlp(x=h, w1=blk["w1"], b1=blk["b1"], w2=blk["w2"], b2=blk["b2"],
                gelu_variant=gelu_variant, **mlp_kw)
    if use_rng and cfg.dropout > 0:
        h = _dropout(h, cfg.dropout, k2)
    if use_rng and cfg.drop_path > 0:
        h = _drop_path(h, drop_path_rate, k4)
    return x + h


def _dp_rates(cfg: ViTConfig):
    """Per-layer stochastic-depth rates, scaled linearly from 0 at the
    first block to cfg.drop_path at the last (the standard schedule)."""
    if cfg.depth == 1:
        return [float(cfg.drop_path)]
    return [cfg.drop_path * l / (cfg.depth - 1) for l in range(cfg.depth)]


_dropout = reference.dropout


def _drop_path(x: jax.Array, rate, rng: jax.Array) -> jax.Array:
    """Stochastic depth: drop the whole residual branch per SAMPLE (leading
    axis), rescaling survivors by 1/(1-rate)."""
    keep = jax.random.bernoulli(
        rng, 1.0 - rate, (x.shape[0],) + (1,) * (x.ndim - 1)
    )
    return jnp.where(keep, x / (1.0 - rate), 0).astype(x.dtype)


def forward(
    params: Params,
    images: jax.Array,
    cfg: ViTConfig,
    ops: OpsImpl = REFERENCE_OPS,
    gelu_variant: str = "exact",
    unroll_layers: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    return_features: bool = False,
    separate_heads: bool = False,
) -> jax.Array:
    """Full forward pass: images (B, C, H, W) -> logits (B, num_classes),
    or the final-LN CLS embedding (B, D) when ``return_features`` (the
    transfer-learning feature vector; the reference has no analog — it
    always applies the head, ViT_seq.c:435), or the (cls_logits,
    dist_logits) pair when ``separate_heads`` (DeiT distillation training
    — requires distilled params).

    Pipeline mirrors ViT_seq (ViT_seq.c:337-439): patch-embed → CLS → pos →
    depth x encoder → final LN → CLS row → head linear.  Softmax is left to
    the caller (vit_tpu.ops.reference.softmax) like the reference separates
    `Softmax` (ViT_seq.c:304).

    ``dropout_rng`` enables training-mode dropout at torchvision's four
    sites (input+pos_embedding here; post-attention, intra-MLP, post-MLP
    in encoder_block) plus stochastic depth: supported on the unfused jnp
    block paths ('xla' and 'qat' ops) and on 'fused_train', whose
    megakernels apply the regularizers in-kernel from per-layer seeds
    (ops.encoder_block_train); the inference megakernel paths ('fused',
    'quant') and the per-op 'pallas' debugging tier have no hooks.
    """
    if dropout_rng is not None and ops.encoder_block is not None \
            and ops.encoder_block_train is None:
        raise ValueError(
            f"dropout/drop-path on ops={ops.name!r} has no kernel hooks — "
            "use ops='fused_train' (in-kernel regularizers) or 'xla'/'qat'"
        )
    if dropout_rng is not None and cfg.dropout > 0 and ops.name == "pallas":
        raise ValueError(
            "cfg.dropout > 0 needs ops.mlp's inner_dropout hook "
            "(torchvision's intra-MLP site) — use ops='fused_train', "
            "'xla', or 'qat'"
        )
    compute_dtype = params["pos_embed"].dtype
    x = images.astype(compute_dtype)
    x = ops.patch_embed(
        x, params["patch_embed"]["kernel"], params["patch_embed"]["bias"],
        cfg.patch_size,
    )
    x = reference.add_cls_and_pos(x, prefix_tokens(params), params["pos_embed"])
    if dropout_rng is not None and cfg.dropout > 0:
        # torchvision Encoder applies Dropout to input + pos_embedding
        # before the first block (its fourth dropout site)
        dropout_rng, k_pos = jax.random.split(dropout_rng)
        x = _dropout(x, cfg.dropout, k_pos)

    blocks = params["blocks"]
    if ops.encoder_block is not None:
        # Fused megakernel path: flat (B*T, D) activation, three Pallas
        # kernels per layer, zero layout shuffles.
        *lead, t, d = x.shape
        rows = 1
        for s in lead:
            rows *= s
        x2 = x.reshape(rows * t, d)

        if dropout_rng is not None:
            # regularized kernels: one uint32 seed per layer (scanned),
            # drop-path rate on the standard linear schedule
            seeds = jax.random.bits(dropout_rng, (cfg.depth,), jnp.uint32)
            rates = jnp.asarray(_dp_rates(cfg), jnp.float32)

            def body(carry, xs):
                blk, seed, rate = xs
                out = ops.encoder_block_train(
                    carry, blk, cfg.num_heads, t, cfg.layernorm_eps,
                    gelu_variant, seed, cfg.dropout, rate,
                )
                return out, None

            if unroll_layers:
                for l in range(cfg.depth):
                    blk = jax.tree.map(lambda a: a[l], blocks)
                    x2, _ = body(x2, (blk, seeds[l], rates[l]))
            else:
                x2, _ = jax.lax.scan(body, x2, (blocks, seeds, rates))
        else:
            def body(carry, blk):
                out = ops.encoder_block(
                    carry, blk, cfg.num_heads, t, cfg.layernorm_eps, gelu_variant
                )
                return out, None

            if unroll_layers:
                for l in range(cfg.depth):
                    blk = jax.tree.map(lambda a: a[l], blocks)
                    x2, _ = body(x2, blk)
            else:
                x2, _ = jax.lax.scan(body, x2, blocks)
        x = x2.reshape(*lead, t, d)
    elif unroll_layers:
        keys = (
            jax.random.split(dropout_rng, cfg.depth) if dropout_rng is not None else None
        )
        for l in range(cfg.depth):
            blk = jax.tree.map(lambda a: a[l], blocks)
            x = encoder_block(
                x, blk, cfg, ops, gelu_variant,
                keys[l] if keys is not None else None,
                _dp_rates(cfg)[l],
            )
    elif dropout_rng is not None:
        keys = jax.random.split(dropout_rng, cfg.depth)
        rates = jnp.asarray(_dp_rates(cfg), jnp.float32)

        def body(carry, xs):
            blk, key, rate = xs
            return (
                encoder_block(carry, blk, cfg, ops, gelu_variant, key, rate),
                None,
            )

        x, _ = jax.lax.scan(body, x, (blocks, keys, rates))
    else:
        def body(carry, blk):
            return encoder_block(carry, blk, cfg, ops, gelu_variant), None

        x, _ = jax.lax.scan(body, x, blocks)

    x = ops.layer_norm(
        x, params["ln_final"]["scale"], params["ln_final"]["bias"], cfg.layernorm_eps
    )
    if return_features:
        return x[..., 0, :].astype(jnp.float32)  # CLS row (ViT_seq.c:433)
    return apply_head(x, params, separate=separate_heads)


def attention_maps(
    params: Params,
    images: jax.Array,
    cfg: ViTConfig,
    gelu_variant: str = "exact",
) -> jax.Array:
    """Interpretability probe: (B, C, H, W) -> per-layer attention
    probabilities (depth, B, H, T, T) in fp32.

    Runs the jnp reference path (the probe is an oracle-grade tool, not a
    throughput path) and stacks each layer's softmax rows — the tensors
    the reference materializes per head (ViT_opencl.c:523-532) but never
    exposes.
    """
    compute_dtype = params["pos_embed"].dtype
    x = images.astype(compute_dtype)
    x = reference.patch_embed(
        x, params["patch_embed"]["kernel"], params["patch_embed"]["bias"],
        cfg.patch_size,
    )
    x = reference.add_cls_and_pos(x, prefix_tokens(params), params["pos_embed"])

    def body(carry, blk):
        h = reference.layer_norm(
            carry, blk["ln1_scale"], blk["ln1_bias"], cfg.layernorm_eps
        )
        h, probs = reference.attention(
            h, blk["wqkv"], blk["bqkv"], blk["wo"], blk["bo"],
            cfg.num_heads, return_probs=True,
        )
        c = carry + h
        h = reference.layer_norm(
            c, blk["ln2_scale"], blk["ln2_bias"], cfg.layernorm_eps
        )
        h = reference.mlp(
            h, blk["w1"], blk["b1"], blk["w2"], blk["b2"], gelu_variant
        )
        return c + h, probs.astype(jnp.float32)

    _, probs = jax.lax.scan(body, x, params["blocks"])
    return probs


def attention_rollout(probs: jax.Array, num_prefix_tokens: int = 1) -> jax.Array:
    """Attention rollout (Abnar & Zuidema 2020): per-layer probabilities
    (depth, B, H, T, T) -> CLS->patch relevance (B, T - num_prefix_tokens).

    Heads average, each layer mixes with the identity (residual flow) and
    renormalizes, layers compose by matrix product; the CLS row restricted
    to the patch columns (prefix tokens dropped — CLS itself, plus DeiT's
    distillation token when present) is the input-patch relevance map
    (reshape to the patch grid for a heatmap)."""
    a = probs.mean(axis=2)  # (depth, B, T, T)
    t = a.shape[-1]
    a = 0.5 * a + 0.5 * jnp.eye(t, dtype=a.dtype)
    a = a / a.sum(axis=-1, keepdims=True)

    def compose(carry, layer):
        # fp32 oracle-grade path: pin HIGHEST or this build's default
        # bf16-dot drift (~2.6e-3 rel) compounds over the depth-long
        # matrix-product chain (CLAUDE.md precision rule)
        return jnp.einsum(
            "bij,bjk->bik", layer, carry,
            precision=jax.lax.Precision.HIGHEST,
        ), None

    init = jnp.broadcast_to(jnp.eye(t, dtype=a.dtype), a.shape[1:])
    rollout, _ = jax.lax.scan(compose, init, a)
    return rollout[:, 0, num_prefix_tokens:]  # CLS attends-to-patches row


def logits_fn(cfg: ViTConfig, ops: OpsImpl = REFERENCE_OPS, **kw):
    """Convenience closure: (params, images) -> logits."""

    def fn(params, images):
        return forward(params, images, cfg, ops, **kw)

    return fn


def init_params(
    key: jax.Array, cfg: ViTConfig, dtype=jnp.float32
) -> Params:
    """Random-init a params pytree (truncated-normal-ish; ViT-standard scales).

    The reference has no initializer (weights always come from disk,
    Network.c:99-194); this exists for synthetic tests/benchmarks since the
    snapshot's large weight blobs are stripped (SURVEY.md §4 note), and for
    training.
    """
    d, f, t, p, c = cfg.embed_dim, cfg.mlp_dim, cfg.seq_len, cfg.patch_dim, cfg.num_classes
    L = cfg.depth
    keys = iter(jax.random.split(key, 16))

    def trunc(key, shape, fan_in):
        std = (1.0 / max(fan_in, 1)) ** 0.5
        return (jax.random.truncated_normal(key, -2, 2, shape, jnp.float32) * std).astype(dtype)

    out = {
        "cls_token": jnp.zeros((d,), dtype),
        "patch_embed": {
            "kernel": trunc(next(keys), (p, d), p),
            "bias": jnp.zeros((d,), dtype),
        },
        "pos_embed": (jax.random.normal(next(keys), (t, d), jnp.float32) * 0.02).astype(dtype),
        "blocks": {
            "ln1_scale": jnp.ones((L, d), dtype),
            "ln1_bias": jnp.zeros((L, d), dtype),
            "wqkv": trunc(next(keys), (L, d, 3 * d), d),
            "bqkv": jnp.zeros((L, 3 * d), dtype),
            "wo": trunc(next(keys), (L, d, d), d),
            "bo": jnp.zeros((L, d), dtype),
            "ln2_scale": jnp.ones((L, d), dtype),
            "ln2_bias": jnp.zeros((L, d), dtype),
            "w1": trunc(next(keys), (L, d, f), d),
            "b1": jnp.zeros((L, f), dtype),
            "w2": trunc(next(keys), (L, f, d), f),
            "b2": jnp.zeros((L, d), dtype),
        },
        "ln_final": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "head": {"kernel": trunc(next(keys), (d, c), d), "bias": jnp.zeros((c,), dtype)},
    }
    if cfg.distilled:
        # DeiT: distillation token (like CLS, zero-init) + its own head
        out["dist_token"] = jnp.zeros((d,), dtype)
        out["head_dist"] = {
            "kernel": trunc(next(keys), (d, c), d),
            "bias": jnp.zeros((c,), dtype),
        }
    return out


def init_head(key: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    """Fresh classification head only (same init rule as ``init_params``'s
    head leaf) — transfer learning swaps this over a loaded backbone
    without sampling the other ~86M parameters just to discard them."""
    d, c = cfg.embed_dim, cfg.num_classes
    std = (1.0 / max(d, 1)) ** 0.5
    kernel = (
        jax.random.truncated_normal(key, -2, 2, (d, c), jnp.float32) * std
    ).astype(dtype)
    return {"kernel": kernel, "bias": jnp.zeros((c,), dtype)}


def num_params(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def cast_params(params: Params, dtype) -> Params:
    """Cast all floating-point leaves (bf16 policy lives in runtime.engine).

    Non-float leaves pass through untouched, so a quantized pytree's int8
    weights survive (its fp32 SCALES still cast — use
    quant.cast_quantized_params for quantized trees, which keeps scales
    fp32)."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
        params,
    )
