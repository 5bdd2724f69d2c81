"""Sequence parallelism: ring attention over an 'sp' mesh axis.

The reference fixes T=197 and materializes per-head TxT score buffers
(ViT_opencl.c:523-532); SURVEY.md §2.3 records sequence parallelism as
absent.  This module adds it the TPU way: the TOKEN axis shards over 'sp'.
Every encoder op except attention (LN, MLP, residuals — and the patch
embed / pos add in front) is per-token and runs on local token blocks with
zero communication; even the patch embed reads only the image-row window
covering the shard's own tokens, so the full (B, T, D) sequence is never
materialized and per-chip activations stay O(T/n) end to end.  Attention — the one cross-token op — runs as **ring
attention**: each shard keeps its token block's Q and rotates the K/V
blocks around the ring with ``ppermute``, folding each incoming block into
a blockwise online softmax (the flash-attention recurrence, here across
chips instead of VMEM tiles).  No chip ever holds TxT scores or the full
K/V, so max sequence length scales linearly with the ring size.

Token counts that don't divide the ring (197 = 14^2 + CLS) zero-pad to the
next multiple; padded KEYS are masked to -inf before the softmax (garbage
keys would otherwise poison every query) and padded QUERY rows are
discarded on exit.

Composes with 'dp' (batch sharding) on the same mesh.  Pointless for the
reference's 197 tokens on one chip — flash attention covers that — but it
is the scaling path past single-chip HBM for long-token variants.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vit_tpu.config import ViTConfig
from vit_tpu.ops import reference


def _ring_attention(q, k, v, valid_q_keys, axis: str):
    """Blockwise-online-softmax attention across an ``axis`` ring.

    Args:
      q, k, v: (B, H, T_local, Dh) — this shard's token block.
      valid_q_keys: (n_shards, T_local) bool — for each ring SOURCE shard,
        which of its key rows are real tokens (False = zero padding).
      axis: mesh axis name to ring over.

    Returns (B, H, T_local, Dh) fp32 — softmax(QK^T/sqrt(Dh)) @ V over the
    FULL (global) key range, computed without ever materializing it.
    """
    n = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    scale = 1.0 / math.sqrt(q.shape[-1])
    prec = (
        jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    )  # fp32 dots compute in bf16 at DEFAULT on this build

    def fold(carry, k_blk, v_blk, src):
        """One online-softmax update with the key/value block from ``src``."""
        m, l, acc = carry
        s = (
            jnp.einsum(
                "bhqd,bhkd->bhqk", q, k_blk,
                preferred_element_type=jnp.float32, precision=prec,
            )
            * scale
        )
        s = jnp.where(valid_q_keys[src][None, None, None, :], s, -jnp.inf)
        m_new = jnp.maximum(m, s.max(axis=-1))
        # -inf - -inf = nan: guard the no-valid-key-seen-yet (m_new=-inf,
        # all-padding block) and masked-entry cases explicitly
        alpha = jnp.where(jnp.isinf(m_new), 0.0, jnp.exp(m - m_new))
        p = jnp.where(jnp.isinf(s), 0.0, jnp.exp(s - m_new[..., None]))
        l_new = l * alpha + p.sum(axis=-1)
        # probs cast down to the compute dtype, fp32 accumulation — same
        # as reference.attention; upcasting v_blk instead would double
        # the per-hop bandwidth in bf16 mode
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32, precision=prec,
        )
        return m_new, l_new, acc_new

    init = (
        jnp.full(q.shape[:-1], -jnp.inf, jnp.float32),  # running row max
        jnp.zeros(q.shape[:-1], jnp.float32),  # running denominator
        jnp.zeros(q.shape, jnp.float32),  # running weighted V sum
    )
    # local block first, then n-1 permute-then-fold hops: the last hop's
    # block is actually consumed, so no wasted trailing ppermute pair
    carry0 = fold(init, k, v, me)

    def step(carry, t):
        k_blk, v_blk, m, l, acc = carry
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        # after t hops the block we hold originated at shard (me - t) mod n
        m, l, acc = fold((m, l, acc), k_blk, v_blk, (me - t) % n)
        return (k_blk, v_blk, m, l, acc), None

    if n > 1:
        (_, _, _, l, acc), _ = jax.lax.scan(
            step, (k, v) + carry0, jnp.arange(1, n)
        )
    else:
        _, l, acc = carry0
    return acc / l[..., None]


def attention_sp(x_local, wqkv, bqkv, wo, bo, num_heads, valid_q_keys,
                 axis: str = "sp"):
    """Drop-in for ops.reference.attention on an sp-sharded token block:
    local QKV projection, ring attention, local out_proj (same packed
    (head, {q,k,v}, head_dim) column order — io/weights.py)."""
    qkv = reference.linear(x_local, wqkv, bqkv)
    q, k, v = reference.split_packed_qkv(qkv, num_heads)  # (B, H, Tl, Dh)
    ctx = _ring_attention(q, k, v, valid_q_keys, axis)
    ctx = reference.merge_heads(ctx.astype(x_local.dtype))
    return reference.linear(ctx, wo, bo)


def shard_forward_sp(cfg: ViTConfig, mesh: Mesh, gelu_variant: str = "exact",
                     ops_name: str = "xla"):
    """Build ``forward(params, images) -> logits`` with tokens sharded over
    'sp' (and the batch over 'dp' when the mesh has it).  Params replicate;
    each shard runs LN/MLP on its token block and ring attention across the
    ring; the CLS row (global token 0, on shard 0) is psum-gathered for the
    replicated head.

    ``ops_name='fused_train'`` runs each shard's post-ring compute — the
    out_proj+residual and LN2+MLP+residual, ~3/4 of the block's local
    FLOPs — through the differentiable split Pallas kernels (the same
    custom-VJP pieces train-time ToMe composes, ops/pallas/trainable.py);
    LN1+QKV stays jnp because its output feeds the cross-chip ring, which
    is XLA collectives by construction.  'xla' keeps the all-jnp block."""
    if ops_name not in ("xla", "fused_train"):
        raise ValueError(f"sp ops {ops_name!r}: use 'xla' or 'fused_train'")
    if "sp" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'sp' axis")
    n = mesh.shape["sp"]
    batch_spec = P("dp") if "dp" in mesh.axis_names else P()

    p = cfg.patch_size
    gh = gw = cfg.image_size // p
    n_patches = gh * gw
    n_prefix = cfg.num_prefix_tokens  # CLS (+ DeiT distillation token)
    t = n_patches + n_prefix
    t_local = -(-t // n)  # ceil: the ring pads the token axis
    if t_local < n_prefix:
        raise ValueError(
            f"sp={n} leaves {t_local} tokens/shard < {n_prefix} prefix "
            f"tokens — shard 0 must hold the full prefix"
        )
    # Each shard embeds only the image rows covering its own token block —
    # per-chip activation memory AND embed FLOPs stay O(T/n); the full
    # (B, T, D) sequence is never materialized anywhere.  Window sizes are
    # static; starts are traced (clamped) so everything stays jittable.
    win_len = min(2 * t_local, n_patches)  # patch window (covers any shard)
    rows = min(gh, (win_len - 1) // gw + 2)  # grid rows covering the window

    def local_fn(params, images):
        compute_dtype = params["pos_embed"].dtype
        b, d = images.shape[0], cfg.embed_dim
        sp_i = jax.lax.axis_index("sp")

        first_patch = sp_i * t_local - n_prefix  # global patch of local token 0
        aw = jnp.clip(first_patch, 0, n_patches - win_len)  # window start
        rw = jnp.clip(aw // gw, 0, gh - rows)  # grid-row window start
        img_rows = jax.lax.dynamic_slice_in_dim(
            images.astype(compute_dtype), rw * p, rows * p, axis=2
        )
        row_patches = reference.patch_embed(
            img_rows, params["patch_embed"]["kernel"],
            params["patch_embed"]["bias"], cfg.patch_size,
        )  # (B, rows*gw, D), first entry = global patch rw*gw
        win = jax.lax.dynamic_slice_in_dim(
            row_patches, aw - rw * gw, win_len, axis=1
        )
        # zero tail = the ring's token padding (keys masked below, padded
        # query rows discarded at exit); also absorbs the clamped slice of
        # fully-padding shards
        win_pad = jnp.concatenate(
            [win, jnp.zeros((b, t_local, d), win.dtype)], axis=1
        )
        raw = jax.lax.dynamic_slice_in_dim(
            win_pad, jnp.clip(first_patch - aw, 0, win_len), t_local, axis=1
        )  # shard s>0: tokens are patches [first_patch, +t_local)
        from vit_tpu.models import vit as vit_mod

        prefix = jnp.broadcast_to(
            vit_mod.prefix_tokens(params).astype(compute_dtype).reshape(
                n_prefix, d
            ),
            (b, n_prefix, d),
        )
        s0 = jnp.concatenate(
            [prefix, win_pad[:, : t_local - n_prefix]], axis=1
        )
        xl = jnp.where(sp_i == 0, s0, raw)
        # zero-padded pos table: padded shards read zeros, never a clamped
        # (wrong) slice that would shift valid rows' positions
        pos_pad = jnp.pad(
            params["pos_embed"].astype(compute_dtype),
            ((0, t_local * n - t), (0, 0)),
        )
        xl = xl + jax.lax.dynamic_slice_in_dim(
            pos_pad, sp_i * t_local, t_local, axis=0
        )[None]
        # which key rows of each SOURCE shard are real tokens
        valid = (
            jnp.arange(n)[:, None] * t_local + jnp.arange(t_local)[None, :]
        ) < t

        # the block structure itself is vit.encoder_block with attention
        # swapped for the ring — one source of truth for LN/MLP/residuals
        import dataclasses as _dc

        from vit_tpu.ops.dispatch import REFERENCE_OPS

        sp_ops = _dc.replace(
            REFERENCE_OPS,
            name="sp",
            attention=lambda h, wqkv, bqkv, wo, bo, nh: attention_sp(
                h, wqkv, bqkv, wo, bo, nh, valid, "sp"
            ),
        )

        if ops_name == "fused_train":
            from vit_tpu.ops.pallas import interpret_default
            from vit_tpu.ops.pallas import trainable as TR

            interp = interpret_default()

            def body(carry, blk):
                x = carry  # (B, T_local, D)
                bb, tl, dd = x.shape
                h = reference.layer_norm(
                    x, blk["ln1_scale"], blk["ln1_bias"], cfg.layernorm_eps
                )
                qkv = reference.linear(h, blk["wqkv"], blk["bqkv"])
                qh, kh, vh = reference.split_packed_qkv(qkv, cfg.num_heads)
                ctx = _ring_attention(qh, kh, vh, valid, "sp")
                ctx = reference.merge_heads(ctx.astype(x.dtype))
                x2 = TR._out_residual_diff(
                    ctx.reshape(bb * tl, dd), x.reshape(bb * tl, dd),
                    blk["wo"], blk["bo"], interp,
                )
                x3 = TR._ln_mlp_residual_diff(
                    x2, blk["ln2_scale"], blk["ln2_bias"],
                    blk["w1"], blk["b1"], blk["w2"], blk["b2"],
                    cfg.layernorm_eps, gelu_variant, interp,
                )
                return x3.reshape(bb, tl, dd), None

        else:

            def body(carry, blk):
                return (
                    vit_mod.encoder_block(carry, blk, cfg, sp_ops, gelu_variant),
                    None,
                )

        xl, _ = jax.lax.scan(body, xl, params["blocks"])
        xl = reference.layer_norm(
            xl, params["ln_final"]["scale"], params["ln_final"]["bias"],
            cfg.layernorm_eps,
        )
        # prefix tokens (CLS, + dist when distilled) = global tokens
        # 0..n_prefix-1: they live in shard 0's block; broadcast them
        head_rows = jax.lax.psum(
            jnp.where(
                sp_i == 0,
                xl[:, :n_prefix, :],
                jnp.zeros_like(xl[:, :n_prefix, :]),
            ),
            "sp",
        )
        return vit_mod.apply_head(head_rows, params)

    def fn(params, images):
        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), batch_spec),
            out_specs=batch_spec,
            check_vma=False,
        )(params, images)

    return fn


def make_sp_train_step(
    cfg: ViTConfig,
    optimizer,
    mesh: Mesh,
    gelu_variant: str = "exact",
    label_smoothing: float = 0.0,
    compute_dtype=None,
    remat: bool = True,
    ops_name: str = "xla",
):
    """Sequence-parallel TRAINING: grads flow backward through the ring —
    ``jax.grad`` transposes the shard_map, turning each forward ``ppermute``
    hop into the reverse-direction hop carrying K/V cotangents (the ring-
    attention backward), and psums the replicated params' cotangents.
    This is the long-sequence training strategy: per-chip activation memory
    stays O(T/n) while the loss matches the unsharded step exactly.

    ``ops_name='fused_train'`` runs the per-shard out_proj/MLP through the
    split Pallas kernels with their hand-written backwards (see
    :func:`shard_forward_sp`); remat is forced off there — the backward
    kernels already recompute in VMEM, stacking jax.checkpoint on top
    would re-run the forward a second time (docs/performance.md).

    Returns jitted ``(params, opt_state, images, labels) -> (params,
    opt_state, loss)`` with params/optimizer state replicated and the batch
    over 'dp' when the mesh has it."""
    import optax

    if ops_name == "fused_train":
        remat = False
    fwd = shard_forward_sp(cfg, mesh, gelu_variant, ops_name=ops_name)

    from vit_tpu.models import vit as vit_mod
    from vit_tpu.runtime.trainer import cross_entropy_loss

    def loss_fn(params, images, labels):
        def run(p, x):
            if compute_dtype is not None:  # mixed precision: fp32 masters
                p = vit_mod.cast_params(p, compute_dtype)
                x = x.astype(compute_dtype)
            return fwd(p, x)

        if remat:
            # rematerialize in the backward — at long T this is the whole
            # point of SP (activation memory O(T/n) without depth blowup)
            run = jax.checkpoint(run)
        return cross_entropy_loss(run(params, images), labels, label_smoothing)

    def step(params, opt_state, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # no donation, same rationale as make_pp_train_step: the caller places
    # params/opt_state with device_put (cli/train_setup.py), which ALIASES
    # the source arrays when the sharding already matches (e.g. a
    # resume/reload that re-enters already-replicated arrays) — donating
    # would delete the caller's buffers out from under checkpoint/eval code
    jit_kwargs = {}
    if ops_name == "fused_train":
        from vit_tpu.runtime.trainer import kernel_backward_compiler_options

        opts = kernel_backward_compiler_options()
        if opts:
            jit_kwargs["compiler_options"] = opts
    return jax.jit(step, **jit_kwargs)
