"""Quantization-aware training (QAT): fake-int8 forward, straight-through
backward.

The inference stack runs W8A8 int8 (ops/quant.py scheme: static symmetric
per-output-channel int8 weights, dynamic symmetric per-row int8
activations, int32 accumulation — ops/pallas/quant_kernels.py).  Post-
training quantization of an fp checkpoint usually costs some accuracy;
QAT closes the loop: train THROUGH the quantizer so the weights adapt to
it, then deploy on the int8 path with no surprise.

TPU-first mechanics: the forward applies quantize→dequantize ("fake
quant") at exactly the tensors the int8 kernels quantize — the QKV GEMM's
activations+weights and both MLP GEMMs' activations+weights (out_proj,
attention, embed and head stay fp, mirroring quantize_params) — so the
QAT loss IS the deployed int8 math up to fp32 summation order.  The
backward is the straight-through estimator: ``round`` passes gradients
unchanged (custom_vjp), clipping to [-127, 127] zeroes gradients outside
the representable range, and the dynamic scales are stop_gradient'ed (the
standard production recipe).  Everything is jnp, so the path trains under
GSPMD/dp meshes like the xla ops.

Reference analog: none — the reference is fp32 inference only
(SURVEY.md §2.1); this is framework capability beyond it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vit_tpu.ops import reference
from vit_tpu.ops.dispatch import OpsImpl


@jax.custom_vjp
def ste_round(x):
    """round() whose gradient is identity (straight-through estimator)."""
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_fwd, _ste_bwd)


def fake_quant_act(x: jax.Array) -> jax.Array:
    """Dynamic symmetric per-row int8 quantize->dequantize
    (ops/quant.py:quantize_activations semantics), STE backward."""
    xf = x.astype(jnp.float32)
    absmax = jax.lax.stop_gradient(jnp.max(jnp.abs(xf), axis=-1, keepdims=True))
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(ste_round(xf / scale), -127, 127)
    return (q * scale).astype(x.dtype)


def fake_quant_weight(w: jax.Array) -> jax.Array:
    """Symmetric per-output-channel (last axis) int8 quantize->dequantize
    (ops/quant.py:quantize_weight semantics), STE backward."""
    wf = w.astype(jnp.float32)
    absmax = jax.lax.stop_gradient(
        jnp.max(jnp.abs(wf), axis=tuple(range(wf.ndim - 1)), keepdims=True)
    )
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(ste_round(wf / scale), -127, 127)
    return (q * scale).astype(w.dtype)


def attention_qat(x, wqkv, bqkv, wo, bo, num_heads):
    """reference.attention with the QKV GEMM fake-quantized (the int8
    path's quantization point; out_proj and the attention core stay fp,
    matching ops/quant.quantize_params + the q8 kernels)."""
    return reference.attention(
        fake_quant_act(x), fake_quant_weight(wqkv), bqkv, wo, bo, num_heads
    )


def mlp_qat(x, w1, b1, w2, b2, gelu_variant: str = "exact",
            inner_dropout=None):
    """reference.mlp with both GEMMs fake-quantized (input and post-GELU
    activations per-row, w1/w2 per-channel).  ``inner_dropout``: optional
    ``(rng, rate)`` between GELU and FC2, same contract as reference.mlp —
    applied BEFORE FC2's activation fake-quant so the quantizer sees the
    activations it will see at that point in training."""
    h = reference.linear(fake_quant_act(x), fake_quant_weight(w1), b1)
    h = reference.gelu_exact(h) if gelu_variant == "exact" else reference.gelu_tanh(h)
    if inner_dropout is not None:
        rng, rate = inner_dropout
        h = reference.dropout(h, rate, rng)
    return reference.linear(fake_quant_act(h), fake_quant_weight(w2), b2)


QAT_OPS = OpsImpl(
    name="qat",
    layer_norm=reference.layer_norm,
    attention=attention_qat,
    mlp=mlp_qat,
    patch_embed=reference.patch_embed,
)
