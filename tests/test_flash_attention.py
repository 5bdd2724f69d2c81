"""Blockwise flash-attention parity tests (online softmax) vs jnp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.ops.pallas.flash_attention import flash_attention


def _ref_attention(q, k, v):
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision="highest") / np.sqrt(dh)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v, precision="highest"
    )


@pytest.mark.parametrize(
    "t,bq,bk",
    [
        (64, 64, 64),    # single block
        (128, 64, 64),   # multi-block both axes
        (160, 64, 64),   # ragged final blocks (160 = 2.5 * 64)
        (96, 32, 96),    # k unblocked
        (100, 32, 32),   # everything ragged
    ],
)
def test_flash_matches_reference(t, bq, bk):
    key = jax.random.key(t)
    b, h, dh = 2, 2, 32
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    got = flash_attention(q, k, v, block_q=bq, block_k=bk, interpret=True)
    want = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_matches_single_tile_kernel():
    from vit_tpu.ops.pallas.attention_kernel import scaled_dot_product_attention

    key = jax.random.key(9)
    q = jax.random.normal(key, (3, 2, 80, 16), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (3, 2, 80, 16), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (3, 2, 80, 16), jnp.float32)
    a = flash_attention(q, k, v, block_q=32, block_k=32, interpret=True)
    b = scaled_dot_product_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("t", [577, 2048])
def test_flash_backward_matches_autodiff(t):
    """The blockwise flash VJP (round-2 verdict #1) vs jnp autodiff at the
    @384 token count (577, ragged 512-blocks) and a long sequence (2048)."""
    key = jax.random.key(t)
    b, h, dh = 1, 2, 32
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(key, 3), (b, h, t, dh), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) * g)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v) * g)

    got = jax.grad(loss_flash, (0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for name, a, b_ in zip("dq dk dv".split(), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-4, err_msg=name
        )


def test_flash_backward_ragged_blocks_small():
    # every block ragged on both axes, plus grad-of-grad sanity via jit
    t, bq, bk = 100, 32, 32
    key = jax.random.key(5)
    q = jax.random.normal(key, (2, 1, t, 16), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 1, t, 16), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 1, t, 16), jnp.float32)

    def loss(q, k, v):
        o = flash_attention(q, k, v, block_q=bq, block_k=bk, interpret=True)
        return jnp.sum(o * o)

    got = jax.jit(jax.grad(loss, (0, 1, 2)))(q, k, v)

    def loss_ref(q, k, v):
        o = _ref_attention(q, k, v)
        return jnp.sum(o * o)

    want = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)
        assert np.isfinite(np.asarray(a)).all()


def test_flash_extreme_logits_stable():
    # online softmax must survive large score magnitudes (fp32 statistics)
    key = jax.random.key(3)
    q = jax.random.normal(key, (1, 1, 64, 16), jnp.float32) * 30
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 64, 16), jnp.float32) * 30
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 1, 64, 16), jnp.float32)
    got = np.asarray(flash_attention(q, k, v, block_q=16, block_k=16, interpret=True))
    want = np.asarray(_ref_attention(q, k, v))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-4)
