"""Per-op parity tests: jnp reference ops vs independent NumPy math.

The reference had no unit tests (SURVEY.md §4) — its only oracle was the
dual CPU/GPU implementation cross-check.  These tests give each op the unit
oracle that design implies.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import erf

from vit_tpu.ops import reference as R


def test_layer_norm_matches_numpy(rng):
    x = rng.normal(size=(3, 7, 32)).astype(np.float32)
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)
    eps = 1e-6
    want = (x - x.mean(-1, keepdims=True)) / np.sqrt(
        x.var(-1, keepdims=True) + eps
    ) * scale + bias
    got = np.asarray(R.layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), eps))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gelu_exact_matches_erf_form(rng):
    x = rng.normal(size=(257,)).astype(np.float32) * 3
    want = 0.5 * x * (1 + erf(x / math.sqrt(2)))
    got = np.asarray(R.gelu_exact(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gelu_tanh_matches_reference_gpu_form(rng):
    # kernel.cl:442-443 constant 0.79788456
    x = rng.normal(size=(257,)).astype(np.float32) * 3
    want = 0.5 * x * (1 + np.tanh(0.79788456 * (x + 0.044715 * x**3)))
    got = np.asarray(R.gelu_tanh(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gelu_variants_differ_but_close(rng):
    # The reference deliberately diverges between CPU (erf) and GPU (tanh)
    # paths (SURVEY.md §4.3); both live here and stay within ~1e-3.
    x = rng.normal(size=(1000,)).astype(np.float32) * 2
    a = np.asarray(R.gelu_exact(jnp.asarray(x)))
    b = np.asarray(R.gelu_tanh(jnp.asarray(x)))
    assert 0 < np.abs(a - b).max() < 2e-3


def test_linear_matches_numpy(rng):
    x = rng.normal(size=(5, 19)).astype(np.float32)
    w = rng.normal(size=(19, 13)).astype(np.float32)
    b = rng.normal(size=(13,)).astype(np.float32)
    want = x @ w + b
    got = np.asarray(R.linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_matches_per_head_numpy(rng):
    # Vectorized attention vs the reference's serial per-head formulation
    # (ViT_seq.c:156-215).
    t, d, H = 9, 24, 3
    hd = d // H
    x = rng.normal(size=(t, d)).astype(np.float32)
    wqkv = rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.2
    bqkv = rng.normal(size=(3 * d,)).astype(np.float32)
    wo = rng.normal(size=(d, d)).astype(np.float32) * 0.2
    bo = rng.normal(size=(d,)).astype(np.float32)

    qkv = x @ wqkv + bqkv
    heads = []
    for h in range(H):  # packed columns are (head, {q,k,v}, head_dim)-ordered
        base = h * 3 * hd
        qh, kh, vh = (qkv[:, base + i * hd : base + (i + 1) * hd] for i in range(3))
        s = (qh @ kh.T) / math.sqrt(hd)
        e = np.exp(s - s.max(-1, keepdims=True))
        heads.append((e / e.sum(-1, keepdims=True)) @ vh)
    want = np.concatenate(heads, -1) @ wo + bo

    got = np.asarray(
        R.attention(
            jnp.asarray(x), jnp.asarray(wqkv), jnp.asarray(bqkv),
            jnp.asarray(wo), jnp.asarray(bo), H,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_attention_batched_equals_unbatched(rng):
    t, d, H, B = 6, 16, 2, 3
    x = rng.normal(size=(B, t, d)).astype(np.float32)
    wqkv = rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.3
    bqkv = np.zeros(3 * d, np.float32)
    wo = rng.normal(size=(d, d)).astype(np.float32) * 0.3
    bo = np.zeros(d, np.float32)
    args = [jnp.asarray(a) for a in (wqkv, bqkv, wo, bo)]
    full = np.asarray(R.attention(jnp.asarray(x), *args, H))
    for i in range(B):
        one = np.asarray(R.attention(jnp.asarray(x[i]), *args, H))
        np.testing.assert_allclose(full[i], one, atol=1e-5)


def test_patch_embed_matches_channel_major_flatten(rng):
    # Patch flatten order must match the reference conv indexing
    # (ViT_seq.c:36-41): patches row-major over (gh, gw), channel-major
    # within a patch.
    B, c, hw, ps, D = 2, 3, 8, 4, 5
    gh = gw = hw // ps
    imgs = rng.normal(size=(B, c, hw, hw)).astype(np.float32)
    kern = rng.normal(size=(c * ps * ps, D)).astype(np.float32)
    bias = rng.normal(size=(D,)).astype(np.float32)
    want = np.stack(
        [
            im.reshape(c, gh, ps, gw, ps).transpose(1, 3, 0, 2, 4).reshape(gh * gw, -1)
            @ kern
            + bias
            for im in imgs
        ]
    )
    got = np.asarray(
        R.patch_embed(jnp.asarray(imgs), jnp.asarray(kern), jnp.asarray(bias), ps)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_add_cls_and_pos(rng):
    n, d = 4, 6
    patches = rng.normal(size=(2, n, d)).astype(np.float32)
    cls = rng.normal(size=(d,)).astype(np.float32)
    pos = rng.normal(size=(n + 1, d)).astype(np.float32)
    got = np.asarray(
        R.add_cls_and_pos(jnp.asarray(patches), jnp.asarray(cls), jnp.asarray(pos))
    )
    want = np.concatenate([np.tile(cls, (2, 1, 1)), patches], axis=1) + pos
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_softmax_matches_numpy(rng):
    x = rng.normal(size=(3, 10)).astype(np.float32) * 5
    e = np.exp(x - x.max(-1, keepdims=True))
    want = e / e.sum(-1, keepdims=True)
    got = np.asarray(R.softmax(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-6)
