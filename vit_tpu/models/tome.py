"""ToMe-accelerated ViT forward passes (inference only).

Token merging (ops/tome.py) shrinks the token count by a fixed r per
layer, so the per-layer shapes differ — the layer loop unrolls in Python
(12 static shapes instead of one scanned body; XLA compiles each once).
Two implementations, cross-checked against each other:

  - :func:`forward_xla`: pure-jnp (the readable oracle; also what CPU
    tests gate the kernels against).
  - :func:`forward_fused`: the production path — kernel A emits the ToMe
    similarity metric (mean attention key) for free and applies the
    proportional-attention log-size bias in-VMEM; the merge itself is
    XLA gather/scatter between kernels B and C.

The reference runs every layer at the full 197 tokens (ViT_seq.c:326-439);
this is the "change the arithmetic" lever the round-3 floor study pointed
at (docs/performance.md) — throughput beyond the fixed-T structural floor
at a controlled approximation cost (r=0 is bit-identical to the plain
paths).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vit_tpu.config import ViTConfig
from vit_tpu.models import vit
from vit_tpu.ops import reference, tome
from vit_tpu.ops.pallas import fused_block as FB


# Default schedule bucketing: merge each group of MERGE_CHUNK consecutive
# layers' budget at the group's first layer.  Same total reduction as the
# per-layer schedule at ~1/3 the distinct token counts, so the unrolled
# fused chain compiles ~15 distinct kernel programs instead of ~36 — this
# is what keeps deep/aggressive schedules (L/16, r=14/16) inside the
# backend's validated envelope (docs/performance.md backend-fault log).
# counts=... overrides (e.g. per-layer: tome.merge_counts(..) unchunked).
MERGE_CHUNK = 3

# Train-side default (forward_train).  The fwd+bwd chain's envelope turned
# out to be the OPPOSITE of the inference chain's: measured on-chip at
# B/16 r=13 b64, chunk=2 runs clean (45.2 ms/step) while chunk=3 and the
# coarser chunk=6 both hard-fault the TPU worker — so the failing resource
# is per-merge-event size (26 pairs/event vs 39/78), not the
# distinct-program count the inference fix targeted.  See
# docs/performance.md "backend-fault log" for the full measurement table.
TRAIN_MERGE_CHUNK = 2


def schedule(cfg: ViTConfig, r: int, chunk: int = MERGE_CHUNK):
    """The default (chunked) merge schedule for a (config, r) pair."""
    p = cfg.num_prefix_tokens
    counts = tome.compress_counts(
        tome.merge_counts(cfg.seq_len, cfg.depth, r, p), chunk,
        cfg.seq_len, p,
    )
    return tome.validate_counts(counts, cfg.seq_len, p)


def forward_xla(
    params: Dict[str, Any],
    images: jax.Array,
    cfg: ViTConfig,
    r: int,
    gelu_variant: str = "exact",
    counts=None,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """Pure-jnp ToMe forward: images (B, C, H, W) -> logits.

    The independent oracle for :func:`forward_fused` — deliberately kept
    on the gather/scatter merge (ops/tome.merge_tokens) so the production
    path's merge-matrix GEMM is cross-checked against different code.

    ``dropout_rng`` applies the regularizer recipe with masks
    BIT-IDENTICAL to :func:`forward_train`'s in-kernel ones (same
    position-hash, fused_block.dropout_mask / drop_path_scale_rows) —
    this is the grad-parity oracle for ToMe x dropout, in the mold of
    trainable.train_block_reference_2d."""
    check_config(cfg, r)
    use_reg = dropout_rng is not None
    if use_reg:
        from vit_tpu.ops.pallas.fused_block import (
            DROP_SITE_ATTN_OUT,
            DROP_SITE_DP_ATTN,
            DROP_SITE_DP_MLP,
            DROP_SITE_MLP_INNER,
            DROP_SITE_MLP_OUT,
            drop_path_scale_rows,
            dropout_mask,
        )

        rates = vit._dp_rates(cfg)

        def drop(h2d, seed_l, site, p_drop):
            if p_drop <= 0:
                return h2d
            m = dropout_mask(seed_l, site, 0, h2d.shape, p_drop)
            return h2d * m.astype(h2d.dtype)

    compute_dtype = params["pos_embed"].dtype
    x = images.astype(compute_dtype)
    x = reference.patch_embed(
        x, params["patch_embed"]["kernel"], params["patch_embed"]["bias"],
        cfg.patch_size,
    )
    x = reference.add_cls_and_pos(x, vit.prefix_tokens(params), params["pos_embed"])
    b = x.shape[0]
    d = x.shape[-1]
    if use_reg and cfg.dropout > 0:
        x = vit._dropout(
            x, cfg.dropout, jax.random.fold_in(dropout_rng, cfg.depth)
        )
    p = cfg.num_prefix_tokens
    counts = schedule(cfg, r) if counts is None else counts
    sizes = jnp.ones((b, cfg.seq_len), jnp.float32)
    merged_any = False  # sizes are all ones (bias 0) until the first merge
    for l in range(cfg.depth):
        blk = jax.tree.map(lambda a: a[l], params["blocks"])
        h = reference.layer_norm(
            x, blk["ln1_scale"], blk["ln1_bias"], cfg.layernorm_eps
        )
        bias = jnp.log(sizes) if merged_any else None
        out = reference.attention(
            h, blk["wqkv"], blk["bqkv"], blk["wo"], blk["bo"],
            cfg.num_heads, logit_bias=bias, return_kmean=counts[l] > 0,
        )
        attn, kmean = out if counts[l] > 0 else (out, None)
        if use_reg:
            t = x.shape[1]
            seed_l = jax.random.bits(
                jax.random.fold_in(dropout_rng, l), (), jnp.uint32
            )
            a2 = drop(
                attn.reshape(b * t, d), seed_l, DROP_SITE_ATTN_OUT,
                cfg.dropout,
            )
            dp_attn = drop_path_scale_rows(
                seed_l, DROP_SITE_DP_ATTN, b, t, rates[l]
            )
            attn = (a2 * dp_attn.astype(a2.dtype)).reshape(b, t, d)
        x = x + attn
        if counts[l] > 0:
            x, sizes = tome.merge_tokens(x, kmean, sizes, counts[l], p)
            merged_any = True
        h = reference.layer_norm(
            x, blk["ln2_scale"], blk["ln2_bias"], cfg.layernorm_eps
        )
        if use_reg:
            t = x.shape[1]
            h2 = h.reshape(b * t, d)
            u = reference.linear(h2, blk["w1"], blk["b1"])
            g = (
                reference.gelu_exact(u) if gelu_variant == "exact"
                else reference.gelu_tanh(u)
            )
            g = drop(g, seed_l, DROP_SITE_MLP_INNER, cfg.dropout)
            y = reference.linear(g, blk["w2"], blk["b2"])
            y = drop(y, seed_l, DROP_SITE_MLP_OUT, cfg.dropout)
            dp_mlp = drop_path_scale_rows(
                seed_l, DROP_SITE_DP_MLP, b, t, rates[l]
            )
            x = x + (y * dp_mlp.astype(y.dtype)).reshape(b, t, d)
        else:
            x = x + reference.mlp(
                h, blk["w1"], blk["b1"], blk["w2"], blk["b2"], gelu_variant
            )
    x = reference.layer_norm(
        x, params["ln_final"]["scale"], params["ln_final"]["bias"],
        cfg.layernorm_eps,
    )
    return vit.apply_head(x, params)


def check_config(cfg: ViTConfig, r: int) -> None:
    """Validate a (config, r) pair before building a ToMe forward.

    The kernel path runs every layer through the single-tile VMEM
    attention kernel (ln_qkv_attn) — past VMEM_ATTENTION_MAX_T tokens the
    plain paths switch to the blockwise flash composition, which has no
    ToMe hooks; reject instead of blowing the per-head (T, T) VMEM tile
    (on this backend that is a hard worker fault, not a clean error)."""
    if r < 0:
        raise ValueError(f"tome_r must be >= 0, got {r}")
    from vit_tpu.ops.pallas.fused_block import VMEM_ATTENTION_MAX_T

    if cfg.seq_len > VMEM_ATTENTION_MAX_T:
        raise ValueError(
            f"ToMe supports seq_len <= {VMEM_ATTENTION_MAX_T} "
            f"({cfg.name} has {cfg.seq_len}); long sequences use the "
            "flash-attention path without token merging"
        )


def fused_compiler_options():
    """jit compiler options for :func:`forward_fused` on TPU.

    The unrolled 36-kernel chain (3 pallas calls x depth) overflows XLA's
    default ~19 MiB scoped-VMEM operand-staging budget — and does so as a
    HARD WORKER FAULT at run time, not a compile error (bisected on-chip:
    12x[A+B+C] crashes, 12x[A+B], 12x[C], and 1x[A+B+C] all pass; the
    same jit with this limit passes).  Same knob the backward megakernels
    need (trainer.kernel_backward_compiler_options)."""
    if jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": "81920"}
    return None


def forward_fused(
    params: Dict[str, Any],
    images: jax.Array,
    cfg: ViTConfig,
    r: int,
    gelu_variant: str = "exact",
    interpret: bool | None = None,
    counts=None,
) -> jax.Array:
    """Kernel-path ToMe forward: kernel A (LN1+QKV+attention, log-size
    bias in-VMEM, metric emitted) -> kernel B (out_proj+residual) ->
    merge-matrix GEMM (ops/tome.merge_matrix) -> kernel C
    (LN2+MLP+residual), per layer, on the default chunked schedule."""
    check_config(cfg, r)
    if interpret is None:
        from vit_tpu.ops.pallas import interpret_default

        interpret = interpret_default()
    compute_dtype = params["pos_embed"].dtype
    x = images.astype(compute_dtype)
    x = reference.patch_embed(
        x, params["patch_embed"]["kernel"], params["patch_embed"]["bias"],
        cfg.patch_size,
    )
    x = reference.add_cls_and_pos(x, vit.prefix_tokens(params), params["pos_embed"])
    b, _, d = x.shape
    p = cfg.num_prefix_tokens
    counts = schedule(cfg, r) if counts is None else counts
    sizes = jnp.ones((b, cfg.seq_len), jnp.float32)
    merged_any = False  # sizes are all ones (bias 0) until the first merge
    for l in range(cfg.depth):
        blk = jax.tree.map(lambda a: a[l], params["blocks"])
        t = x.shape[1]
        x2 = x.reshape(b * t, d)
        # skip the metric output / bias operand on layers that don't need
        # them (no merge this layer / no merge happened yet) — part of the
        # r=0 overhead goes away
        out = FB.ln_qkv_attn(
            x2, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"], blk["bqkv"],
            cfg.num_heads, t, cfg.layernorm_eps, interpret=interpret,
            log_size=jnp.log(sizes) if merged_any else None,
            return_kmean=counts[l] > 0,
        )
        ctx, kmean = out if counts[l] > 0 else (out, None)
        y = FB.out_residual(ctx, x2, blk["wo"], blk["bo"], interpret=interpret)
        x = y.reshape(b, t, d)
        if counts[l] > 0:
            w, s_out = tome.merge_matrix(
                kmean.reshape(b, t, -1), sizes, counts[l], p
            )
            x = tome.apply_merge_matrix(x, w, s_out)
            sizes = s_out
            t = t - counts[l]
            merged_any = True
        x = FB.ln_mlp_residual(
            x.reshape(b * t, d), blk["ln2_scale"], blk["ln2_bias"],
            blk["w1"], blk["b1"], blk["w2"], blk["b2"], cfg.layernorm_eps,
            gelu_variant, interpret=interpret,
        ).reshape(b, t, d)
    x = reference.layer_norm(
        x, params["ln_final"]["scale"], params["ln_final"]["bias"],
        cfg.layernorm_eps,
    )
    return vit.apply_head(x, params)


def forward_quant(
    params: Dict[str, Any],
    images: jax.Array,
    cfg: ViTConfig,
    r: int,
    gelu_variant: str = "exact",
    interpret: bool | None = None,
    counts=None,
) -> jax.Array:
    """W8A8 ToMe forward over a QUANTIZED params tree
    (ops/quant.quantize_params): kernel A's int8 twin (LN1 -> dynamic-int8
    QKV GEMM -> fp attention with the log-size bias, metric emitted) ->
    kernel B (fp out_proj+residual — wo stays fp in the quant path) ->
    merge-matrix GEMM -> kernel C's int8 twin (LN2 -> int8 MLP).

    Composes the two independent throughput levers: int8 MXU rate on the
    GEMMs and ToMe's token-count reduction (docs/performance.md)."""
    from vit_tpu.ops.pallas import quant_kernels as QK

    check_config(cfg, r)
    if interpret is None:
        from vit_tpu.ops.pallas import interpret_default

        interpret = interpret_default()
    compute_dtype = params["pos_embed"].dtype
    x = images.astype(compute_dtype)
    x = reference.patch_embed(
        x, params["patch_embed"]["kernel"], params["patch_embed"]["bias"],
        cfg.patch_size,
    )
    x = reference.add_cls_and_pos(x, vit.prefix_tokens(params), params["pos_embed"])
    b, _, d = x.shape
    p = cfg.num_prefix_tokens
    counts = schedule(cfg, r) if counts is None else counts
    sizes = jnp.ones((b, cfg.seq_len), jnp.float32)
    merged_any = False
    for l in range(cfg.depth):
        blk = jax.tree.map(lambda a: a[l], params["blocks"])
        t = x.shape[1]
        x2 = x.reshape(b * t, d)
        out = QK.ln_qkv_attn_q8(
            x2, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"],
            blk["wqkv_scale"], blk["bqkv"], cfg.num_heads, t,
            cfg.layernorm_eps, interpret=interpret,
            log_size=jnp.log(sizes) if merged_any else None,
            return_kmean=counts[l] > 0,
        )
        ctx, kmean = out if counts[l] > 0 else (out, None)
        y = FB.out_residual(ctx, x2, blk["wo"], blk["bo"], interpret=interpret)
        x = y.reshape(b, t, d)
        if counts[l] > 0:
            w, s_out = tome.merge_matrix(
                kmean.reshape(b, t, -1), sizes, counts[l], p
            )
            x = tome.apply_merge_matrix(x, w, s_out)
            sizes = s_out
            t = t - counts[l]
            merged_any = True
        x = QK.ln_mlp_residual_q8(
            x.reshape(b * t, d), blk["ln2_scale"], blk["ln2_bias"],
            blk["w1"], blk["w1_scale"], blk["b1"],
            blk["w2"], blk["w2_scale"], blk["b2"], cfg.layernorm_eps,
            gelu_variant, interpret=interpret,
        ).reshape(b, t, d)
    x = reference.layer_norm(
        x, params["ln_final"]["scale"], params["ln_final"]["bias"],
        cfg.layernorm_eps,
    )
    return vit.apply_head(x, params)


def forward_train(
    params: Dict[str, Any],
    images: jax.Array,
    cfg: ViTConfig,
    r: int,
    gelu_variant: str = "exact",
    counts=None,
    separate_heads: bool = False,
    chunk: int | None = None,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """DIFFERENTIABLE kernel-path ToMe forward — train with merging active
    (the ToMe paper's other half: merging both speeds training and recovers
    the accuracy the off-the-shelf trade loses).

    ``dropout_rng`` enables the full regularizer recipe on merged tokens
    (the ToMe paper trains with dropout + stochastic depth): the split
    train kernels (out_residual_train / ln_mlp_residual_train) regenerate
    torchvision's three in-block dropout masks and the per-sample
    drop-path scales from a per-layer seed, exactly like
    encoder_block_train — the mask row-hash follows the CURRENT (merged)
    token count per layer.  Parity gate: :func:`forward_xla` with the same
    rng applies bit-identical masks in jnp (tests/test_tome.py).

    ``chunk`` overrides the merge-schedule bucketing (default
    :data:`TRAIN_MERGE_CHUNK` = 2, NOT the inference default): the
    fwd+bwd chain's backend envelope is per-merge-event size, not
    distinct-program count — measured at B/16 r=13 b64, chunk=2 runs
    clean on-chip while chunk=3/6 hard-fault the worker
    (docs/performance.md backend-fault log).

    Composition per layer: kernel A via its custom VJP
    (trainable.tome_ln_qkv_attn_diff — the backward recomputes the
    log-size-biased probs in VMEM), kernel B / kernel C via theirs, and
    the merge as the merge-matrix GEMM, whose build is stop-gradient (the
    matching is piecewise-constant; gradients flow through the GEMM
    itself).  Gradients land on the stacked params exactly like
    vit.forward's unrolled path."""
    from vit_tpu.ops.pallas import interpret_default, trainable as TR

    check_config(cfg, r)
    interpret = interpret_default()
    compute_dtype = params["pos_embed"].dtype
    x = images.astype(compute_dtype)
    x = reference.patch_embed(
        x, params["patch_embed"]["kernel"], params["patch_embed"]["bias"],
        cfg.patch_size,
    )
    x = reference.add_cls_and_pos(x, vit.prefix_tokens(params), params["pos_embed"])
    b, _, d = x.shape
    p = cfg.num_prefix_tokens
    if counts is None:
        counts = schedule(
            cfg, r, TRAIN_MERGE_CHUNK if chunk is None else chunk
        )
    sizes = jnp.ones((b, cfg.seq_len), jnp.float32)
    merged_any = False
    use_reg = dropout_rng is not None
    # Drop-path-only recipes (cfg.dropout == 0 — DeiT's and the ToMe
    # paper's actual setting) compose AROUND the clean kernels instead of
    # through the regularized `*_train` twins: the kernel returns
    # k(x) = x + f(x), so stochastic depth y = x + s*f(x) is the jnp lerp
    # x + s*(k(x) - x) — bit-identical masks (same drop_path_scale_rows
    # hash), XLA fuses the two elementwise ops.  NOTE: measured on-chip,
    # even this minimal delta still trips the merged-token train chain's
    # backend envelope (the chain itself sits at the edge — the sweep's
    # answer across chunks 1/2/3/6 is "none"; docs/performance.md round
    # 5); for regularized merged-token training on today's backend use
    # the xla tier (forward_xla), measured clean at 85.0 ms/step.
    dp_lerp = use_reg and float(cfg.dropout) == 0.0
    if use_reg:
        if cfg.dropout > 0:
            # torchvision's input+pos_embedding dropout site (vit.forward)
            x = vit._dropout(
                x, cfg.dropout, jax.random.fold_in(dropout_rng, cfg.depth)
            )
        rates = vit._dp_rates(cfg)
    for l in range(cfg.depth):
        blk = jax.tree.map(lambda a: a[l], params["blocks"])
        t = x.shape[1]
        x2 = x.reshape(b * t, d)
        out = TR.tome_ln_qkv_attn_diff(
            x2, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"], blk["bqkv"],
            jnp.log(sizes) if merged_any else None,
            cfg.num_heads, t, cfg.layernorm_eps, counts[l] > 0,
        )
        ctx, kmean = out if counts[l] > 0 else (out, None)
        if use_reg:
            seed_l = jax.random.bits(
                jax.random.fold_in(dropout_rng, l), (), jnp.uint32
            )
            dp_attn = TR.drop_path_scale_rows(
                seed_l, TR.DROP_SITE_DP_ATTN, b, t, rates[l]
            )
            if dp_lerp:
                k = TR._out_residual_diff(
                    ctx, x2, blk["wo"], blk["bo"], interpret
                )
                # rate 0 (layer 0 of the linear schedule): exact identity,
                # no lerp rounding
                y = k if float(rates[l]) == 0.0 else (
                    x2 + dp_attn.astype(k.dtype) * (k - x2)
                )
            else:
                y = TR._out_residual_diff_train(
                    ctx, x2, blk["wo"], blk["bo"], dp_attn, seed_l,
                    float(cfg.dropout), interpret,
                )
        else:
            y = TR._out_residual_diff(ctx, x2, blk["wo"], blk["bo"], interpret)
        x = y.reshape(b, t, d)
        if counts[l] > 0:
            w, s_out = tome.merge_matrix(
                jax.lax.stop_gradient(kmean.reshape(b, t, -1)),
                sizes, counts[l], p,
            )
            w = jax.lax.stop_gradient(w)
            sizes = jax.lax.stop_gradient(s_out)
            x = tome.apply_merge_matrix(x, w, sizes)
            t = t - counts[l]
            merged_any = True
        if use_reg:
            dp_mlp = TR.drop_path_scale_rows(
                seed_l, TR.DROP_SITE_DP_MLP, b, t, rates[l]
            )
            if dp_lerp:
                x2m = x.reshape(b * t, d)
                k = TR._ln_mlp_residual_diff(
                    x2m, blk["ln2_scale"], blk["ln2_bias"],
                    blk["w1"], blk["b1"], blk["w2"], blk["b2"],
                    cfg.layernorm_eps, gelu_variant, interpret,
                )
                x = (k if float(rates[l]) == 0.0 else (
                    x2m + dp_mlp.astype(k.dtype) * (k - x2m)
                )).reshape(b, t, d)
                continue
            x = TR._ln_mlp_residual_diff_train(
                x.reshape(b * t, d), blk["ln2_scale"], blk["ln2_bias"],
                blk["w1"], blk["b1"], blk["w2"], blk["b2"], dp_mlp, seed_l,
                float(cfg.dropout), cfg.layernorm_eps, gelu_variant,
                interpret,
            ).reshape(b, t, d)
        else:
            x = TR._ln_mlp_residual_diff(
                x.reshape(b * t, d), blk["ln2_scale"], blk["ln2_bias"],
                blk["w1"], blk["b1"], blk["w2"], blk["b2"], cfg.layernorm_eps,
                gelu_variant, interpret,
            ).reshape(b, t, d)
    x = reference.layer_norm(
        x, params["ln_final"]["scale"], params["ln_final"]["bias"],
        cfg.layernorm_eps,
    )
    return vit.apply_head(x, params, separate=separate_heads)
