"""Quantization utilities: int8 weights/activations with fp scales.

TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS),
making W8A8 GEMMs the main lever past bf16 for inference.  Scheme (the
standard production recipe for ViT-class models):

  - Weights: static symmetric per-output-channel int8,
    ``w_q[k, n] = round(w[k, n] / s_w[n])``.
  - Activations: dynamic symmetric per-row (per-token) int8, computed on
    the fly from the row absmax.
  - GEMM: int32 accumulation, dequantized with the rank-1 scale outer
    product ``s_x[m] * s_w[n]``.

The kernels live in ops/pallas/quant_kernels.py; this module holds the
numpy/jnp reference implementations they are tested against, and the
params-pytree quantizer.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class QuantizedLinear(NamedTuple):
    """int8 weight [in, out] + fp32 per-output-channel scale [out]."""

    w_q: Any  # int8 (K, N)
    scale: Any  # fp32 (N,)


def quantize_weight(w) -> QuantizedLinear:
    """Symmetric per-channel int8 quantization of a [K, N] (or stacked
    [L, K, N]) weight; channels = the last axis."""
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantizedLinear(w_q, scale.reshape(w.shape[-1]))


def quantize_weight_stacked(w) -> Tuple[Any, Any]:
    """[L, K, N] stacked weights -> (int8 [L, K, N], fp32 scales [L, N])."""
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=1, keepdims=True)  # (L, 1, N)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale[:, 0, :]


def quantize_activations(x) -> Tuple[Any, Any]:
    """Dynamic symmetric per-row int8: (..., K) -> int8 values + fp32 row
    scales (...,)."""
    xf = jnp.asarray(x, jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    x_q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_q, scale[..., 0]


def int8_matmul_reference(x_q, s_x, w_q, s_w, bias=None):
    """Reference W8A8 GEMM: dequantized int32 accumulation."""
    acc = jnp.dot(
        x_q.astype(jnp.int32), w_q.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * s_x[..., None] * s_w[None, :]
    if bias is not None:
        out = out + bias
    return out


def linear_w8a8(x, w_q, s_w, bias=None):
    """Drop-in fp-in/fp-out linear over an int8 weight (dynamic act quant)."""
    x_q, s_x = quantize_activations(x)
    return int8_matmul_reference(x_q, s_x, w_q, s_w, bias)


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the big GEMM weights of a ViT params pytree to int8.

    Returns a new pytree where wqkv/wo/w1/w2 are replaced by
    ``{name: int8, name_scale: fp32}`` pairs; LN/bias/embedding tensors stay
    fp.  Consumed by the 'quant' ops path.
    """
    blocks = dict(params["blocks"])
    out_blocks = dict(blocks)
    # wo stays fp: the out_proj+residual kernel runs in bf16
    for name in ("wqkv", "w1", "w2"):
        w_q, s = quantize_weight_stacked(blocks[name])
        out_blocks[name] = w_q
        out_blocks[name + "_scale"] = s
    out = dict(params)
    out["blocks"] = out_blocks
    return out


_QUANT_SCALE_KEYS = frozenset({"wqkv_scale", "w1_scale", "w2_scale"})


def cast_quantized_params(params: Dict[str, Any], dtype) -> Dict[str, Any]:
    """Cast fp leaves to the compute dtype, leaving int8 weights and their
    fp32 quantization scales untouched.  (LayerNorm's ln*_scale params are
    NOT quant scales and do get cast.)"""

    def rec(node, name=""):
        if isinstance(node, dict):
            return {k: rec(v, k) for k, v in node.items()}
        if node.dtype == jnp.int8 or name in _QUANT_SCALE_KEYS:
            return node
        return node.astype(dtype)

    return rec(params)
