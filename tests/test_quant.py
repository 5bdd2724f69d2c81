"""W8A8 quantization tests: reference math, Pallas kernel parity, and
end-to-end int8 model accuracy vs the fp path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.ops import quant
from vit_tpu.ops import reference as R


def test_weight_quantization_roundtrip(rng):
    w = rng.normal(size=(64, 32)).astype(np.float32)
    wq = quant.quantize_weight(w)
    deq = np.asarray(wq.w_q, np.float32) * np.asarray(wq.scale)
    # per-channel int8: relative error bounded by ~1/127 of channel absmax
    err = np.abs(deq - w).max(0)
    assert (err <= np.abs(w).max(0) / 127 + 1e-7).all()


def test_activation_quantization_dynamic(rng):
    x = rng.normal(size=(5, 16)).astype(np.float32) * 10
    xq, s = quant.quantize_activations(x)
    deq = np.asarray(xq, np.float32) * np.asarray(s)[:, None]
    assert np.abs(deq - x).max() <= np.abs(x).max() / 127 + 1e-6


def test_w8a8_linear_close_to_fp(rng):
    x = rng.normal(size=(40, 96)).astype(np.float32)
    w = rng.normal(size=(96, 64)).astype(np.float32) * 0.1
    b = rng.normal(size=(64,)).astype(np.float32) * 0.1
    wq = quant.quantize_weight(w)
    got = np.asarray(quant.linear_w8a8(jnp.asarray(x), wq.w_q, wq.scale, b))
    want = x @ w + b
    # int8 noise: ~1% relative of output scale
    assert np.abs(got - want).max() < 0.05 * np.abs(want).max() + 0.02


def test_stacked_weight_quantization(rng):
    w = rng.normal(size=(3, 32, 16)).astype(np.float32)
    wq, s = quant.quantize_weight_stacked(w)
    assert wq.shape == w.shape and wq.dtype == jnp.int8
    assert s.shape == (3, 16)
    deq = np.asarray(wq, np.float32) * np.asarray(s)[:, None, :]
    assert np.abs(deq - w).max() < np.abs(w).max() / 100


def test_quantize_params_structure(tiny_params):
    qp = quant.quantize_params(tiny_params)
    blocks = qp["blocks"]
    for name in ("wqkv", "w1", "w2"):
        assert blocks[name].dtype == jnp.int8
        assert name + "_scale" in blocks
    assert blocks["wo"].dtype != jnp.int8  # stays fp (fused with attention)


def test_ln_qkv_attn_q8_kernel_parity(tiny_cfg, tiny_params):
    # The shipping int8 kernel: LN -> dynamic-int8 QKV GEMM -> attention,
    # vs the same math composed from the reference quant/attention ops.
    import math

    from vit_tpu.ops.pallas.quant_kernels import ln_qkv_attn_q8

    blk = jax.tree.map(lambda a: a[0], tiny_params["blocks"])
    d, hd, nh, t = (tiny_cfg.embed_dim, tiny_cfg.head_dim,
                    tiny_cfg.num_heads, tiny_cfg.seq_len)
    b = 2
    x = jax.random.normal(jax.random.key(0), (b * t, d), jnp.float32)
    wq, ws = quant.quantize_weight_stacked(blk["wqkv"][None])
    got = np.asarray(
        ln_qkv_attn_q8(x, blk["ln1_scale"], blk["ln1_bias"], wq[0], ws[0],
                       blk["bqkv"], nh, t, 1e-6, interpret=True)
    )
    ln = R.layer_norm(x, blk["ln1_scale"], blk["ln1_bias"], 1e-6)
    qkv = np.asarray(quant.linear_w8a8(ln, wq[0], ws[0], blk["bqkv"]))
    qkv = qkv.reshape(b, t, 3 * d)
    want = np.zeros((b, t, d), np.float32)
    for i in range(b):
        for h in range(nh):
            base = h * 3 * hd
            q = qkv[i, :, base : base + hd]
            k = qkv[i, :, base + hd : base + 2 * hd]
            v = qkv[i, :, base + 2 * hd : base + 3 * hd]
            s = (q @ k.T) / math.sqrt(hd)
            e = np.exp(s - s.max(-1, keepdims=True))
            want[i, :, h * hd : (h + 1) * hd] = (e / e.sum(-1, keepdims=True)) @ v
    np.testing.assert_allclose(got.reshape(b, t, d), want, atol=2e-4)


def test_full_model_quant_close_to_fp(tiny_cfg, tiny_params, tiny_images):
    from vit_tpu.models import vit
    from vit_tpu.ops.dispatch import get_ops

    x = jnp.asarray(tiny_images)
    fp = np.asarray(vit.forward(tiny_params, x, tiny_cfg, ops=get_ops("xla")))
    qparams = quant.quantize_params(tiny_params)
    q8 = np.asarray(vit.forward(qparams, x, tiny_cfg, ops=get_ops("quant")))
    # int8 noise accumulates over layers; labels must survive, logits close
    assert (fp.argmax(-1) == q8.argmax(-1)).all()
    assert np.abs(fp - q8).max() < 0.15


def test_q8_long_seq_fallback_matches_kernel(tiny_cfg, tiny_params,
                                             tiny_images, monkeypatch):
    """Past VMEM_ATTENTION_MAX_T the quant block must switch to the
    flash-attention composition (quant_kernels._long_seq_block_q8) with the
    SAME W8A8 QKV grouping — not fail to compile a (T,T) VMEM tile."""
    from vit_tpu.models import vit
    from vit_tpu.ops.dispatch import get_ops
    from vit_tpu.ops.pallas import fused_block as FB

    x = jnp.asarray(tiny_images)
    qparams = quant.quantize_params(tiny_params)
    want = np.asarray(vit.forward(qparams, x, tiny_cfg, ops=get_ops("quant")))
    monkeypatch.setattr(FB, "VMEM_ATTENTION_MAX_T", 4)  # T=5 > 4
    got = np.asarray(vit.forward(qparams, x, tiny_cfg, ops=get_ops("quant")))
    # identical int8 codes; only the attention accumulation order differs
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_engine_int8_path(tiny_cfg, tiny_params, tiny_images):
    from vit_tpu.runtime import InferenceEngine

    fp = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops="xla",
                         batch_pad=4)
    q8 = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops="quant",
                         batch_pad=4)
    lf, _ = fp.classify(tiny_images)
    lq, _ = q8.classify(tiny_images)
    assert (lf == lq).all()


def test_quant_params_shard_on_mesh(tiny_cfg, tiny_params):
    import jax as _jax
    import pytest as _pytest

    if _jax.device_count() < 8:
        _pytest.skip("needs 8 virtual devices")
    from vit_tpu.parallel import make_mesh, shard_params

    mesh = make_mesh({"dp": 4, "tp": 2})
    qp = quant.quantize_params(tiny_params)
    sharded = shard_params(_jax.tree.map(jnp.asarray, qp), mesh)
    # quant scales shard with their weight's output axis
    assert sharded["blocks"]["wqkv_scale"].sharding.spec == _jax.sharding.PartitionSpec(None, "tp")
    assert sharded["blocks"]["w2_scale"].sharding.is_fully_replicated
    assert sharded["blocks"]["wqkv"].dtype == jnp.int8


def test_cast_quantized_params_casts_ln_scales(tiny_params):
    qp = quant.quantize_params(jax.tree.map(jnp.asarray, tiny_params))
    cast = quant.cast_quantized_params(qp, jnp.bfloat16)
    blocks = cast["blocks"]
    assert blocks["ln1_scale"].dtype == jnp.bfloat16  # LN params ARE cast
    assert blocks["wqkv_scale"].dtype == jnp.float32  # quant scales are not
    assert blocks["wqkv"].dtype == jnp.int8


def test_engine_accepts_quant_with_tp_mesh(tiny_cfg, tiny_params):
    # Round 1 rejected tp meshes on the quant path; the shard_map TP
    # integration (parallel/tp_forward.py) now supports it — parity vs the
    # single-device path is asserted in test_parallel.py.
    import jax as _jax
    import pytest as _pytest

    if _jax.device_count() < 8:
        _pytest.skip("needs 8 virtual devices")
    from vit_tpu.parallel import make_mesh
    from vit_tpu.runtime import InferenceEngine

    mesh = make_mesh({"dp": 4, "tp": 2})
    eng = InferenceEngine(tiny_cfg, tiny_params, ops="quant", mesh=mesh)
    assert eng._tp_shard_map
    assert eng.params["blocks"]["wqkv"].dtype == jnp.int8


def test_ln_qkv_attn_q8a_kernel_parity(rng):
    """int8-attention kernel A (round-3 floor attack): the in-kernel int8
    score/context dots must match a jnp mirror of the same quantization
    math exactly-ish (fp32 ordering noise only), and stay close to the
    bf16-attention q8 kernel on mild-logit data."""
    from vit_tpu.ops.pallas.quant_kernels import ln_qkv_attn_q8, ln_qkv_attn_q8a

    t, d, nh = 64, 64, 4
    dh = d // nh
    x = jnp.asarray(rng.normal(size=(t, d)), jnp.float32)
    s1 = jnp.ones((d,), jnp.float32)
    b1 = jnp.zeros((d,), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (d, 3 * d)), jnp.int8)
    # small scales keep scores mild (|s|~1), the regime real ViTs live in
    ws = jnp.asarray(rng.uniform(0.0002, 0.0008, (3 * d,)), jnp.float32)
    bq = jnp.asarray(0.01 * rng.normal(size=(3 * d,)), jnp.float32)

    def jnp_mirror():
        from vit_tpu.ops.pallas.fused_block import _ln

        h = _ln(x, s1[None], b1[None], 1e-6)
        absmax = jnp.max(jnp.abs(h), -1, keepdims=True)
        hs = jnp.maximum(absmax / 127.0, 1e-12)
        hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            hq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        qkv = (acc.astype(jnp.float32) * hs * ws[None] + bq[None]).astype(
            jnp.float32
        )
        outs = []
        scale = 1.0 / np.sqrt(dh)
        for hh in range(nh):
            base = hh * 3 * dh
            q = qkv[:, base : base + dh]
            kt = qkv[:, base + dh : base + 2 * dh].T
            v = qkv[:, base + 2 * dh : base + 3 * dh]
            qs = jnp.maximum(jnp.max(jnp.abs(q), -1, keepdims=True) / 127.0, 1e-12)
            ks = jnp.maximum(jnp.max(jnp.abs(kt), 0, keepdims=True) / 127.0, 1e-12)
            q8 = jnp.clip(jnp.round(q / qs), -127, 127).astype(jnp.int8)
            kt8 = jnp.clip(jnp.round(kt / ks), -127, 127).astype(jnp.int8)
            s = jax.lax.dot_general(
                q8, kt8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (qs * scale) * ks
            m = jnp.max(s, -1, keepdims=True)
            e = jnp.exp(s - m)
            inv = 1.0 / jnp.sum(e, -1, keepdims=True)
            p8 = jnp.round(e * 127.0).astype(jnp.int8)
            vs = jnp.maximum(jnp.max(jnp.abs(v), 0, keepdims=True) / 127.0, 1e-12)
            v8 = jnp.clip(jnp.round(v / vs), -127, 127).astype(jnp.int8)
            ctx = jax.lax.dot_general(
                p8, v8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (inv / 127.0) * vs
            outs.append(ctx)
        return jnp.concatenate(outs, -1)

    got = np.asarray(
        ln_qkv_attn_q8a(x, s1, b1, wq, ws, bq, nh, t, 1e-6, interpret=True)
    )
    want = np.asarray(jnp_mirror())
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # mild logits: int8 attention stays close to the bf16-attention kernel
    ref = np.asarray(
        ln_qkv_attn_q8(x, s1, b1, wq, ws, bq, nh, t, 1e-6, interpret=True)
    )
    rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert rel < 0.05, rel
