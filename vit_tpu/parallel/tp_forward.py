"""Tensor-parallel execution of the fused Pallas kernel paths.

GSPMD cannot partition a ``pallas_call``, so tensor parallelism for the
megakernel ('fused') and W8A8 ('quant') paths is explicit shard_map SPMD:

  - Kernel A (LN1+QKV+attention) is column-parallel: each tp shard holds the
    packed (head, {q,k,v}, head_dim) columns of its own heads — the loader's
    column order exists precisely for this seam (io/weights.py; the
    reference's analog is the per-head loop ViT_opencl.c:546, the "natural
    TP seam" per SURVEY.md §2.3) — and runs the attention core for those
    heads only.  No communication: LN input is replicated over tp.
  - out_proj is row-parallel: local context columns x the matching wo rows
    give an fp32 partial product; ``psum`` over tp completes it, and
    bias+residual ride the psum epilogue (XLA fuses the adds).
  - Kernel C (LN2+MLP) is Megatron column->row parallel: w1/b1 split the MLP
    hidden, w2 rows match, the kernel emits an fp32 partial (``partial=True``)
    and the second psum completes the block.

Two ICI all-reduces per layer over the (B_local*T, D) fp32 activation —
the canonical Megatron count.  dp composes freely: the batch splits over
'dp' while params replicate over it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vit_tpu.config import ViTConfig
from vit_tpu.ops import reference
from vit_tpu.parallel.sharding import param_pspecs


# -- differentiable kernel wrappers -------------------------------------------
# The TP block's only non-differentiable pieces are the two pallas_calls;
# giving them custom VJPs (reusing the backward megakernels with the
# residual joins disabled) makes fused_block_tp trainable — psum/pmax and
# the jnp epilogues transpose natively under shard_map.


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _ln_qkv_attn_diff(
    x2d, ln_scale, ln_bias, wqkv, bqkv, num_heads, seq_len, eps, interpret
):
    from vit_tpu.ops.pallas.fused_block import ln_qkv_attn

    return ln_qkv_attn(
        x2d, ln_scale, ln_bias, wqkv, bqkv, num_heads, seq_len, eps,
        interpret=interpret,
    )


def _lqa_fwd(x2d, ln_scale, ln_bias, wqkv, bqkv, num_heads, seq_len, eps, interpret):
    out = _ln_qkv_attn_diff(
        x2d, ln_scale, ln_bias, wqkv, bqkv, num_heads, seq_len, eps, interpret
    )
    return out, (x2d, ln_scale, ln_bias, wqkv, bqkv)


def _lqa_bwd(num_heads, seq_len, eps, interpret, res, g):
    from vit_tpu.ops.pallas.backward import ln_qkv_attn_bwd

    x2d, s, b, w, bq = res
    dx, ds, db, dw, dbq = ln_qkv_attn_bwd(
        g, None, x2d, s, b, w, bq, num_heads, seq_len, eps,
        interpret=interpret,
    )
    return dx, ds.astype(s.dtype), db.astype(b.dtype), dw.astype(w.dtype), dbq.astype(bq.dtype)


_ln_qkv_attn_diff.defvjp(_lqa_fwd, _lqa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _ln_mlp_partial_diff(x2d, ln_scale, ln_bias, w1, b1, w2, eps, gelu_variant, interpret):
    from vit_tpu.ops.pallas.fused_block import ln_mlp_residual

    return ln_mlp_residual(
        x2d, ln_scale, ln_bias, w1, b1, w2, jnp.zeros((w2.shape[-1],), x2d.dtype),
        eps, gelu_variant, interpret=interpret, partial=True,
    )


def _lmp_fwd(x2d, ln_scale, ln_bias, w1, b1, w2, eps, gelu_variant, interpret):
    out = _ln_mlp_partial_diff(
        x2d, ln_scale, ln_bias, w1, b1, w2, eps, gelu_variant, interpret
    )
    return out, (x2d, ln_scale, ln_bias, w1, b1, w2)


def _lmp_bwd(eps, gelu_variant, interpret, res, g):
    from vit_tpu.ops.pallas.backward import ln_mlp_residual_bwd

    x2d, s, b, w1, b1, w2 = res
    dx, ds, db, dw1, db1, dw2, _db2 = ln_mlp_residual_bwd(
        g.astype(x2d.dtype), x2d, s, b, w1, b1, w2, eps, gelu_variant,
        interpret=interpret, residual=False,
    )
    return (
        dx, ds.astype(s.dtype), db.astype(b.dtype),
        dw1.astype(w1.dtype), db1.astype(b1.dtype), dw2.astype(w2.dtype),
    )


_ln_mlp_partial_diff.defvjp(_lmp_fwd, _lmp_bwd)


def _ctx_long_seq_tp(x2d, blk, heads_local, seq_len, eps, quant, interpret):
    """Local-head attention context past VMEM_ATTENTION_MAX_T: LN + QKV in
    jnp (thin at long T; the quant path keeps the kernel's exact W8A8
    grouping via quant_kernels._qkv_q8), T^2 work through the blockwise
    flash-attention kernel — which carries its own Pallas VJP, so the fp
    path stays trainable.  Mirrors fused_block._long_seq_block's entry."""
    from vit_tpu.ops.pallas.flash_attention import flash_context_from_packed_qkv

    rows, d = x2d.shape
    b = rows // seq_len
    if quant:
        from vit_tpu.ops.pallas.quant_kernels import _qkv_q8

        qkv = _qkv_q8(
            x2d, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"],
            blk["wqkv_scale"], blk["bqkv"], eps,
        ).astype(x2d.dtype)
    else:
        x3 = x2d.reshape(b, seq_len, d)
        h = reference.layer_norm(x3, blk["ln1_scale"], blk["ln1_bias"], eps)
        qkv = reference.linear(h, blk["wqkv"], blk["bqkv"])
    return flash_context_from_packed_qkv(
        qkv, b, seq_len, heads_local, interpret=interpret
    )


def fused_block_tp(
    x2d: jax.Array,
    blk,
    heads_local: int,
    seq_len: int,
    eps: float,
    gelu_variant: str,
    axis: str,
    quant: bool,
    interpret: bool,
) -> jax.Array:
    """One pre-LN encoder block, this shard's slice: local-head attention,
    psum-completed out_proj and MLP (see module docstring).

    The fp path is differentiable (the two pallas_calls carry custom VJPs
    backed by the backward megakernels), so TP *training* of the fused
    path is jax.grad through this function."""
    from vit_tpu.ops.pallas import fused_block as _fb  # dynamic: tests patch it

    dtype = x2d.dtype
    if seq_len > _fb.VMEM_ATTENTION_MAX_T:
        ctx = _ctx_long_seq_tp(
            x2d, blk, heads_local, seq_len, eps, quant, interpret
        )
    elif quant:
        from vit_tpu.ops.pallas.quant_kernels import ln_qkv_attn_q8

        ctx = ln_qkv_attn_q8(
            x2d, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"],
            blk["wqkv_scale"], blk["bqkv"], heads_local, seq_len, eps,
            interpret=interpret,
        )
    else:
        ctx = _ln_qkv_attn_diff(
            x2d, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"], blk["bqkv"],
            heads_local, seq_len, eps, interpret,
        )
    # row-parallel out_proj: fp32 partial -> psum -> bias+residual epilogue
    part = jnp.dot(
        ctx, blk["wo"], preferred_element_type=jnp.float32,
        precision=_fb.dot_precision(dtype),
    )
    part = jax.lax.psum(part, axis)
    x2d = (
        part + blk["bo"].astype(jnp.float32) + x2d.astype(jnp.float32)
    ).astype(dtype)

    if quant:
        return _mlp_q8_tp(x2d, blk, eps, gelu_variant, axis, interpret)
    part2 = _ln_mlp_partial_diff(
        x2d, blk["ln2_scale"], blk["ln2_bias"], blk["w1"], blk["b1"],
        blk["w2"], eps, gelu_variant, interpret,
    )
    part2 = jax.lax.psum(part2, axis)
    return (
        part2 + blk["b2"].astype(jnp.float32) + x2d.astype(jnp.float32)
    ).astype(dtype)


def _mlp_q8_tp(x2d, blk, eps, variant, axis, interpret):
    """W8A8 MLP, tensor-parallel, THROUGH the real q8 Pallas kernels,
    matching the single-device kernel's quantization grouping exactly
    (quant_kernels._out_ln_mlp_q8_kernel).

    The mid activation's dynamic per-row int8 scale is an absmax over the
    FULL MLP-hidden row, but each shard holds only F/tp columns — so the
    MLP splits into two kernel calls around a cross-shard ``pmax`` of the
    row scale, and the FC2 accumulator psums *in int32* (dequant after the
    sum keeps the arithmetic identical to the unsharded kernel).
    ``_mlp_q8_tp_ref`` is the jnp parity oracle for this composition."""
    from vit_tpu.ops.pallas.fused_block import use_fast_erf
    from vit_tpu.ops.pallas.quant_kernels import fc2_q8_partial, ln_fc1_gelu_q8

    f32 = jnp.float32
    mid = ln_fc1_gelu_q8(
        x2d, blk["ln2_scale"], blk["ln2_bias"], blk["w1"], blk["w1_scale"],
        blk["b1"], eps, variant,
        # same erf form as the unsharded q8 kernel (tanh-form when the
        # compute dtype is bf16) — a different erf would shift values right
        # before the round(), letting tp>1 int8 codes drift off tp=1
        fast_erf=use_fast_erf(x2d.dtype), interpret=interpret,
    )
    # global (full-row) scale: pmax over the tp shards of the hidden axis
    mmax = jax.lax.pmax(jnp.max(jnp.abs(mid), axis=-1, keepdims=True), axis)
    ms = jnp.maximum(mmax / 127.0, 1e-12)
    acc2 = fc2_q8_partial(mid, ms, blk["w2"], interpret=interpret)
    acc2 = jax.lax.psum(acc2, axis)  # exact: int32 before dequant
    out = acc2.astype(f32) * ms * blk["w2_scale"].astype(f32)
    out = out + blk["b2"].astype(f32) + x2d.astype(f32)
    return out.astype(x2d.dtype)


def _mlp_q8_tp_ref(x2d, blk, eps, variant, axis):
    """jnp formulation of _mlp_q8_tp — the parity oracle the kernel pair is
    tested against (tests/test_parallel.py); math identical by design."""
    from vit_tpu.ops.pallas.fused_block import _gelu, _ln, use_fast_erf

    f32 = jnp.float32
    h = _ln(x2d, blk["ln2_scale"], blk["ln2_bias"], eps)  # fp32, full D
    absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    hs = jnp.maximum(absmax / 127.0, 1e-12)
    hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
    acc1 = jax.lax.dot_general(
        hq, blk["w1"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    mid = acc1.astype(f32) * hs * blk["w1_scale"].astype(f32)
    mid = _gelu(mid + blk["b1"].astype(f32), variant,
                fast_erf=use_fast_erf(x2d.dtype))
    mmax = jax.lax.pmax(jnp.max(jnp.abs(mid), axis=-1, keepdims=True), axis)
    ms = jnp.maximum(mmax / 127.0, 1e-12)
    mq = jnp.clip(jnp.round(mid / ms), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        mq, blk["w2"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc2 = jax.lax.psum(acc2, axis)
    out = acc2.astype(f32) * ms * blk["w2_scale"].astype(f32)
    out = out + blk["b2"].astype(f32) + x2d.astype(f32)
    return out.astype(x2d.dtype)


def _local_forward(
    params,
    images,
    cfg: ViTConfig,
    heads_local: int,
    gelu_variant: str,
    quant: bool,
    interpret: bool,
    axis: str = "tp",
    return_features: bool = False,
):
    """Per-shard forward (runs inside shard_map): replicated embeddings/head,
    TP encoder blocks.  Mirrors models/vit.forward's fused branch."""
    compute_dtype = params["pos_embed"].dtype
    x = images.astype(compute_dtype)
    x = reference.patch_embed(
        x, params["patch_embed"]["kernel"], params["patch_embed"]["bias"],
        cfg.patch_size,
    )
    from vit_tpu.models import vit as vit_mod

    x = reference.add_cls_and_pos(
        x, vit_mod.prefix_tokens(params), params["pos_embed"]
    )
    b, t, d = x.shape
    x2 = x.reshape(b * t, d)

    def body(carry, blk):
        out = fused_block_tp(
            carry, blk, heads_local, t, cfg.layernorm_eps, gelu_variant,
            axis, quant, interpret,
        )
        return out, None

    x2, _ = jax.lax.scan(body, x2, params["blocks"])
    x = x2.reshape(b, t, d)
    x = reference.layer_norm(
        x, params["ln_final"]["scale"], params["ln_final"]["bias"],
        cfg.layernorm_eps,
    )
    if return_features:
        return x[..., 0, :].astype(jnp.float32)
    return vit_mod.apply_head(x, params)


def shard_forward_tp(
    cfg: ViTConfig,
    mesh: Mesh,
    ops_name: str,
    params,
    gelu_variant: str = "exact",
    return_features: bool = False,
):
    """Build ``forward(params, images) -> logits`` running the fused or
    quant kernel path over a (dp x) tp mesh.

    Params must be placed with vit_tpu.parallel.param_shardings (same rules);
    the batch splits over 'dp' (replicated if the mesh has no dp axis).
    """
    if "tp" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'tp' axis")
    tp = mesh.shape["tp"]
    if cfg.num_heads % tp:
        raise ValueError(f"tp={tp} must divide num_heads={cfg.num_heads}")
    if cfg.mlp_dim % tp:
        raise ValueError(f"tp={tp} must divide mlp_dim={cfg.mlp_dim}")
    quant = ops_name == "quant"
    if ops_name not in ("fused", "quant"):
        raise ValueError(f"shard_forward_tp supports ops 'fused'/'quant', got {ops_name!r}")

    from vit_tpu.ops.pallas import interpret_default

    heads_local = cfg.num_heads // tp
    interpret = interpret_default()
    batch_spec = P("dp") if "dp" in mesh.axis_names else P()

    def local_fn(p, x):
        return _local_forward(
            p, x, cfg, heads_local, gelu_variant, quant, interpret,
            return_features=return_features,
        )

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(param_pspecs(mesh.axis_names, params), batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
