"""Pallas-kernel parity tests vs the jnp reference ops (interpret mode on
CPU; compiled on TPU).  The reference had no per-op tests — this is the
framework's version of its dual-implementation cross-check, per kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vit_tpu.ops.pallas.attention_kernel as pattn
import vit_tpu.ops.pallas.ln_kernel as pln
import vit_tpu.ops.pallas.mlp_kernel as pmlp
from vit_tpu.ops import reference as R


@pytest.fixture(scope="module")
def key():
    return jax.random.key(42)


def test_layer_norm_parity(key):
    x = jax.random.normal(key, (3, 37, 128), jnp.float32) * 3 + 1
    scale = jax.random.normal(jax.random.fold_in(key, 1), (128,), jnp.float32)
    bias = jax.random.normal(jax.random.fold_in(key, 2), (128,), jnp.float32)
    got = pln.layer_norm(x, scale, bias, 1e-6, interpret=True)
    want = R.layer_norm(x, scale, bias, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_layer_norm_parity_bf16(key):
    x = (jax.random.normal(key, (4, 197, 128), jnp.float32) * 2).astype(jnp.bfloat16)
    scale = jnp.ones((128,), jnp.bfloat16)
    bias = jnp.zeros((128,), jnp.bfloat16)
    got = pln.layer_norm(x, scale, bias, 1e-6, interpret=True)
    want = R.layer_norm(x, scale, bias, 1e-6)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_layer_norm_ragged_rows(key):
    # 197 rows with block 64: exercises the padded final block
    x = jax.random.normal(key, (197, 256), jnp.float32)
    scale = jnp.ones((256,))
    bias = jnp.zeros((256,))
    got = pln.layer_norm(x, scale, bias, 1e-6, block_rows=64, interpret=True)
    want = R.layer_norm(x, scale, bias, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_flash_attention_core_parity(key):
    b, h, t, dh = 2, 3, 29, 16
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    got = pattn.scaled_dot_product_attention(q, k, v, interpret=True)
    # jnp reference
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision="highest") / np.sqrt(dh)
    want = jnp.einsum(
        "bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v, precision="highest"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_full_attention_parity(key, rng):
    t, d, H = 19, 32, 4
    x = jax.random.normal(key, (2, t, d), jnp.float32)
    wqkv = jax.random.normal(jax.random.fold_in(key, 1), (d, 3 * d)) * 0.3
    bqkv = jax.random.normal(jax.random.fold_in(key, 2), (3 * d,)) * 0.1
    wo = jax.random.normal(jax.random.fold_in(key, 3), (d, d)) * 0.3
    bo = jax.random.normal(jax.random.fold_in(key, 4), (d,)) * 0.1
    got = pattn.attention(x, wqkv, bqkv, wo, bo, H, interpret=True)
    want = R.attention(x, wqkv, bqkv, wo, bo, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("variant", ["exact", "tanh"])
def test_mlp_parity(key, variant):
    r, d, f = 67, 64, 256
    x = jax.random.normal(key, (r, d), jnp.float32)
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (d, f)) * 0.2
    b1 = jax.random.normal(jax.random.fold_in(key, 2), (f,)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(key, 3), (f, d)) * 0.2
    b2 = jax.random.normal(jax.random.fold_in(key, 4), (d,)) * 0.1
    got = pmlp.mlp(x, w1, b1, w2, b2, gelu_variant=variant, block_rows=32,
                   interpret=True)
    want = R.mlp(x, w1, b1, w2, b2, gelu_variant=variant)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_full_model_pallas_matches_xla(tiny_cfg, tiny_params, tiny_images):
    from vit_tpu.models import vit
    from vit_tpu.ops.dispatch import get_ops

    x = jnp.asarray(tiny_images)
    a = np.asarray(vit.forward(tiny_params, x, tiny_cfg, ops=get_ops("xla")))
    b = np.asarray(vit.forward(tiny_params, x, tiny_cfg, ops=get_ops("pallas")))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_full_model_fused_matches_xla(tiny_cfg, tiny_params, tiny_images):
    # The megakernel path (LN1+QKV / attn+out_proj+residual / LN2+MLP+residual)
    from vit_tpu.models import vit
    from vit_tpu.ops.dispatch import get_ops

    x = jnp.asarray(tiny_images)
    a = np.asarray(vit.forward(tiny_params, x, tiny_cfg, ops=get_ops("xla")))
    b = np.asarray(vit.forward(tiny_params, x, tiny_cfg, ops=get_ops("fused")))
    np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.parametrize("variant", ["exact", "tanh"])
def test_fused_block_parity(tiny_cfg, tiny_params, variant, key):
    # Single fused block vs the composed reference block on (B*T, D) data.
    import jax as _jax

    from vit_tpu.models import vit as vmodel
    from vit_tpu.ops.dispatch import REFERENCE_OPS
    from vit_tpu.ops.pallas.fused_block import fused_encoder_block

    t, d = tiny_cfg.seq_len, tiny_cfg.embed_dim
    x = jax.random.normal(key, (2, t, d), jnp.float32)
    blk = _jax.tree.map(lambda a: a[0], tiny_params["blocks"])
    want = vmodel.encoder_block(x, blk, tiny_cfg, REFERENCE_OPS, variant)
    got = fused_encoder_block(
        x.reshape(2 * t, d), blk, tiny_cfg.num_heads, t,
        tiny_cfg.layernorm_eps, variant, interpret=True,
    ).reshape(2, t, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ln_qkv_attn_kernel_parity(tiny_cfg, tiny_params, key):
    # The shipping merged kernel (LN1+QKV+attention) vs the composed
    # reference ops on (B*T, D) data.
    import jax as _jax

    from vit_tpu.ops.pallas.fused_block import ln_qkv_attn

    blk = _jax.tree.map(lambda a: a[0], tiny_params["blocks"])
    t, d, nh = tiny_cfg.seq_len, tiny_cfg.embed_dim, tiny_cfg.num_heads
    b = 3
    x = jax.random.normal(key, (b * t, d), jnp.float32)
    got = ln_qkv_attn(
        x, blk["ln1_scale"], blk["ln1_bias"], blk["wqkv"], blk["bqkv"],
        nh, t, 1e-6, interpret=True,
    ).reshape(b, t, d)
    # reference: LN -> attention WITHOUT out_proj (identity wo, zero bo)
    ln = R.layer_norm(x.reshape(b, t, d), blk["ln1_scale"], blk["ln1_bias"], 1e-6)
    want = R.attention(
        ln, blk["wqkv"], blk["bqkv"], jnp.eye(d, dtype=jnp.float32),
        jnp.zeros(d), nh,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_out_residual_kernel_parity(key):
    from vit_tpu.ops.pallas.fused_block import out_residual

    rows, d = 133, 64  # ragged final block
    ctx = jax.random.normal(key, (rows, d), jnp.float32)
    res = jax.random.normal(jax.random.fold_in(key, 1), (rows, d), jnp.float32)
    wo = jax.random.normal(jax.random.fold_in(key, 2), (d, d), jnp.float32) * 0.2
    bo = jax.random.normal(jax.random.fold_in(key, 3), (d,), jnp.float32)
    got = out_residual(ctx, res, wo, bo, block_rows=64, interpret=True)
    want = res + R.linear(ctx, wo, bo)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fast_erf_accuracy():
    """The tanh-form erf (bf16 compute paths) must stay within its
    documented bounds vs the A-S reference form everywhere."""
    import jax.numpy as jnp
    import numpy as np
    from scipy.special import erf as scipy_erf

    from vit_tpu.ops.pallas.fused_block import _erf_tanh_inner, _gelu

    x = jnp.asarray(np.linspace(-12, 12, 100001), jnp.float32)
    _, _, t = _erf_tanh_inner(x)
    assert float(jnp.abs(t - scipy_erf(np.asarray(x))).max()) < 5e-5
    g_fast = _gelu(x, "exact", fast_erf=True)
    g_ref = _gelu(x, "exact", fast_erf=False)
    assert float(jnp.abs(g_fast - g_ref).max()) < 1e-4


def test_fast_erf_grad_accuracy():
    import jax.numpy as jnp
    import numpy as np

    from vit_tpu.ops.pallas.backward import _gelu_grad

    x = jnp.asarray(np.linspace(-12, 12, 100001), jnp.float32)
    g_fast = _gelu_grad(x, "exact", fast_erf=True)
    g_ref = _gelu_grad(x, "exact", fast_erf=False)
    assert float(jnp.abs(g_fast - g_ref).max()) < 5e-4


def test_bf16_fused_uses_fast_erf_and_stays_close(tiny_cfg, tiny_params, tiny_images):
    """bf16 fused forward (fast-erf path) vs fp32 xla: within bf16 noise."""
    from vit_tpu.models import vit as vit_mod
    from vit_tpu.ops.dispatch import get_ops

    import jax
    import jax.numpy as jnp
    import numpy as np

    p32 = tiny_params
    want = np.asarray(vit_mod.forward(p32, jnp.asarray(tiny_images), tiny_cfg,
                                      get_ops("xla")))
    pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), tiny_params)
    got = np.asarray(vit_mod.forward(
        pbf, jnp.asarray(tiny_images, jnp.bfloat16), tiny_cfg, get_ops("fused")
    ))
    np.testing.assert_allclose(got, want, atol=0.1)  # bf16-path tolerance


def test_per_op_attention_long_seq_routes_to_flash(monkeypatch):
    """Past VMEM_ATTENTION_MAX_T the per-op attention must switch to the
    blockwise flash kernel (same switch the fused block makes) instead of
    compiling a (T, T) VMEM tile."""
    import importlib

    # the module, not the package's function re-export of the same name
    FA = importlib.import_module("vit_tpu.ops.pallas.flash_attention")
    from vit_tpu.ops.pallas import attention_kernel as AK
    from vit_tpu.ops.pallas import fused_block as FB

    monkeypatch.setattr(FB, "VMEM_ATTENTION_MAX_T", 16)
    calls = {"flash": 0}
    orig = FA.flash_attention

    def spy(*a, **k):
        calls["flash"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(FA, "flash_attention", spy)
    key = jax.random.key(0)
    q = jax.random.normal(key, (1, 2, 24, 16), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 24, 16), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 2, 24, 16), jnp.float32)
    got = AK.scaled_dot_product_attention(q, k, v, interpret=True)
    assert calls["flash"] == 1
    want = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q, k, precision="highest") / 4.0, -1
    )
    want = jnp.einsum("bhqk,bhkd->bhqd", want, v, precision="highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
