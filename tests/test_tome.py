"""ToMe token merging (ops/tome.py, models/tome.py): merge correctness
against a NumPy oracle, r=0 degeneracy to the plain forward, and
fused-kernel vs jnp parity (the kernel emits the metric and applies the
proportional-attention bias in-VMEM)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.config import VIT_B_16
from vit_tpu.models import tome as tome_model
from vit_tpu.models import vit
from vit_tpu.ops import tome


@pytest.fixture(scope="module")
def cfg():
    # 65 tokens: enough rounds of merging to exercise the schedule
    return dataclasses.replace(
        VIT_B_16, depth=3, embed_dim=64, num_heads=4, image_size=64,
        patch_size=8, num_classes=11, name="vit_tome_test",
    )


@pytest.fixture(scope="module")
def params(cfg):
    return vit.init_params(jax.random.key(0), cfg)


@pytest.fixture(scope="module")
def images(cfg):
    rng = np.random.default_rng(3)
    s = cfg.image_size
    return jnp.asarray(rng.normal(size=(2, 3, s, s)), jnp.float32)


def _merge_oracle(x, metric, size, r, protected):
    """Independent NumPy bipartite-soft-matching implementation."""
    xp, sp = x[:protected], size[:protected]
    xr = x[protected:].astype(np.float64)
    mr = metric[protected:].astype(np.float64)
    sr = size[protected:].astype(np.float64)
    mr = mr / (np.linalg.norm(mr, axis=-1, keepdims=True) + 1e-6)
    a_idx, b_idx = np.arange(0, len(xr), 2), np.arange(1, len(xr), 2)
    scores = mr[a_idx] @ mr[b_idx].T
    best = scores.argmax(-1)
    best_val = scores[np.arange(len(a_idx)), best]
    order = np.argsort(-best_val, kind="stable")
    src, keep = order[:r], np.sort(order[r:])
    xa, sa = xr[a_idx], sr[a_idx]
    xb, sb = xr[b_idx].copy(), sr[b_idx].copy()
    wsum = xb * sb[:, None]
    for i in src:
        wsum[best[i]] += xa[i] * sa[i]
        sb[best[i]] += sa[i]
    xb = wsum / sb[:, None]
    return (
        np.concatenate([xp, xa[keep], xb], 0),
        np.concatenate([sp, sa[keep], sb], 0),
    )


def test_merge_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    t, d, r, p = 21, 8, 5, 2
    x = rng.normal(size=(3, t, d)).astype(np.float32)
    m = rng.normal(size=(3, t, d)).astype(np.float32)
    s = rng.integers(1, 4, size=(3, t)).astype(np.float32)
    got_x, got_s = tome.merge_tokens(
        jnp.asarray(x), jnp.asarray(m), jnp.asarray(s), r, p
    )
    assert got_x.shape == (3, t - r, d) and got_s.shape == (3, t - r)
    for i in range(3):
        want_x, want_s = _merge_oracle(x[i], m[i], s[i], r, p)
        np.testing.assert_allclose(np.asarray(got_x[i]), want_x, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_s[i]), want_s, atol=1e-5)


def test_merge_conserves_size_and_protects_prefix():
    rng = np.random.default_rng(1)
    t, d, r, p = 18, 8, 4, 2
    x = jnp.asarray(rng.normal(size=(2, t, d)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(2, t, d)), jnp.float32)
    s = jnp.ones((2, t), jnp.float32)
    out, s_out = tome.merge_tokens(x, m, s, r, p)
    # every original token is still represented exactly once
    np.testing.assert_allclose(np.asarray(s_out).sum(-1), t, atol=1e-5)
    # the protected prefix rows pass through bit-identically
    np.testing.assert_array_equal(np.asarray(out[:, :p]), np.asarray(x[:, :p]))


def test_merge_counts_schedule():
    # 10 full rounds of 16, then the floor clip: t=37 -> min(16, 37-33)=4,
    # then 0 (final T = 33; tail layers below ~30 tokens are FLOP-trivial
    # and the fused chain faults on them — ops/tome.merge_counts)
    assert tome.merge_counts(197, 12, 16, 1) == [16] * 10 + [4, 0]
    counts = tome.merge_counts(197, 12, 13, 1)
    assert 197 - sum(counts) >= 33
    # short sequences never merge below the floor
    assert tome.merge_counts(21, 12, 8, 1) == [0] * 12
    assert tome.merge_counts(197, 12, 0, 1) == [0] * 12


def test_r0_matches_plain_forward(cfg, params, images):
    want = np.asarray(vit.forward(params, images, cfg))
    got = np.asarray(tome_model.forward_xla(params, images, cfg, r=0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_matches_xla(cfg, params, images):
    """The production kernel path (metric + log-size bias in-VMEM) must
    reproduce the jnp ToMe forward — same merges, same logits."""
    for r in (0, 4):
        a = np.asarray(tome_model.forward_xla(params, images, cfg, r=r))
        b = np.asarray(tome_model.forward_fused(params, images, cfg, r=r))
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=f"r={r}")


def test_kernel_logsize_and_kmean_parity(cfg, params):
    """Kernel A's new outputs/operands against the jnp twin directly."""
    from vit_tpu.ops.pallas import fused_block as FB

    rng = np.random.default_rng(5)
    b, t, d = 2, cfg.seq_len, cfg.embed_dim
    x = jnp.asarray(rng.normal(size=(b, t, d)) * 0.1, jnp.float32)
    sizes = jnp.asarray(rng.integers(1, 5, size=(b, t)), jnp.float32)
    blk = jax.tree.map(lambda a: a[0], params["blocks"])

    import vit_tpu.ops.reference as R

    ln = R.layer_norm(x, blk["ln1_scale"], blk["ln1_bias"], cfg.layernorm_eps)
    want_ctx, want_kmean = R.attention(
        ln, blk["wqkv"], blk["bqkv"],
        jnp.eye(d, dtype=jnp.float32), jnp.zeros((d,), jnp.float32),
        cfg.num_heads, logit_bias=jnp.log(sizes), return_kmean=True,
    )
    got_ctx, got_kmean = FB.ln_qkv_attn(
        x.reshape(b * t, d), blk["ln1_scale"], blk["ln1_bias"],
        blk["wqkv"], blk["bqkv"], cfg.num_heads, t, cfg.layernorm_eps,
        interpret=True, log_size=jnp.log(sizes), return_kmean=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_ctx), np.asarray(want_ctx).reshape(b * t, d), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_kmean),
        np.asarray(want_kmean).reshape(b * t, -1), atol=1e-5,
    )


def test_engine_tome(cfg, params, images):
    """InferenceEngine(tome_r=...) classifies through the merged forward;
    r=0 engine matches the plain engine exactly."""
    from vit_tpu.runtime import InferenceEngine

    plain = InferenceEngine(cfg, params, dtype="float32", ops="fused",
                            batch_pad=2)
    merged = InferenceEngine(cfg, params, dtype="float32", ops="fused",
                             batch_pad=2, tome_r=4)
    lp, _ = plain.classify(np.asarray(images))
    lm, tm = merged.classify(np.asarray(images))
    assert lm.shape == lp.shape and np.isfinite(tm).all()
    with pytest.raises(ValueError, match="tome"):
        InferenceEngine(cfg, params, ops="pallas", tome_r=4)


def test_serving_wraps_tome_engine(cfg, params):
    """make_serve_fn must trace the engine's RAW forward: wrapping the
    jitted one nests its compiler_options inside the serve jit, which JAX
    rejects outright (found live: the --tome serve selftest crashed)."""
    from vit_tpu.runtime import InferenceEngine
    from vit_tpu.runtime.serving import make_serve_fn

    eng = InferenceEngine(cfg, params, dtype="float32", ops="fused",
                          batch_pad=2, tome_r=4)
    fn = make_serve_fn(eng)
    s = cfg.image_size
    x, n = eng._stage(np.zeros((2, 3, s, s), np.float32))
    labels, top, probs = fn(eng.params, x)
    assert labels.shape[0] >= 2
    assert np.isfinite(np.asarray(top)).all()


def test_cli_tome(cfg, monkeypatch, capsys, tmp_path):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.main import main as cli_main
    from vit_tpu.io import checkpoint as ckpt

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tome_test", cfg)
    ckpt.save_npz(
        vit.init_params(jax.random.key(0), cfg), tmp_path / "w.npz"
    )
    rc = cli_main([
        "--config", "vit_tome_test", "--weights", str(tmp_path / "w.npz"),
        "--synth", "2", "--ops", "fused", "--tome", "4", "--dtype",
        "float32", "--no-compile-cache",
    ])
    assert rc == 0
    assert "[0] label:" in capsys.readouterr().out
    # W8A8 composition: --ops quant + --tome classifies end-to-end
    rc = cli_main([
        "--config", "vit_tome_test", "--weights", str(tmp_path / "w.npz"),
        "--synth", "2", "--ops", "quant", "--tome", "4",
        "--no-compile-cache",
    ])
    assert rc == 0
    assert "[0] label:" in capsys.readouterr().out
    # the per-op pallas debug tier has no ToMe hooks
    rc = cli_main([
        "--config", "vit_tome_test", "--weights", str(tmp_path / "w.npz"),
        "--synth", "2", "--ops", "pallas", "--tome", "4",
        "--no-compile-cache",
    ])
    assert rc == 2
    assert "--tome" in capsys.readouterr().err
    # negative r fails at parse time, BEFORE the (expensive) weight load
    rc = cli_main([
        "--config", "vit_tome_test", "--weights", str(tmp_path / "w.npz"),
        "--synth", "2", "--ops", "fused", "--tome", "-4",
        "--no-compile-cache",
    ])
    assert rc == 2
    assert ">= 0" in capsys.readouterr().err


def test_bench_tome_smoke(capsys):
    """scripts/bench_tome.py --smoke must keep working (CI gate, same
    convention as the staged pod benchmark)."""
    import sys as _sys
    from pathlib import Path

    scripts = Path(__file__).resolve().parent.parent / "scripts"
    _sys.path.insert(0, str(scripts))
    try:
        import bench_tome
    finally:
        _sys.path.remove(str(scripts))
    assert bench_tome.main(["--smoke", "--r", "0,4"]) == 0
    out = capsys.readouterr().out
    assert out.count("img/s") == 2
    # the smoke config must actually merge (T 65 -> 57 at r=4), so the
    # in-model merge wiring can't rot behind a no-op schedule
    assert "65-> 57" in out
    # the W8A8 composition (models/tome.forward_quant)
    assert bench_tome.main(["--smoke", "--r", "4", "--ops", "quant"]) == 0
    out = capsys.readouterr().out
    assert "ops=quant" in out and "65-> 57" in out


def test_distilled_protects_both_prefix_tokens(cfg, params):
    """On a DeiT config both CLS and the distillation token are protected."""
    dcfg = dataclasses.replace(cfg, distilled=True, name="deit_tome_test")
    dparams = vit.init_params(jax.random.key(2), dcfg)
    rng = np.random.default_rng(4)
    s = dcfg.image_size
    imgs = jnp.asarray(rng.normal(size=(2, 3, s, s)), jnp.float32)
    a = np.asarray(tome_model.forward_xla(dparams, imgs, dcfg, r=4))
    b = np.asarray(tome_model.forward_fused(dparams, imgs, dcfg, r=4))
    np.testing.assert_allclose(a, b, atol=2e-4)
    assert np.isfinite(a).all()


def test_merge_matrix_matches_gather_merge():
    """The production merge-matrix GEMM (ops/tome.merge_matrix) must equal
    the gather/scatter merge exactly (same matching, same weighted
    averages, same row layout)."""
    rng = np.random.default_rng(7)
    b, t, d, dm, r, p = 3, 33, 16, 8, 6, 2
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    metric = jnp.asarray(rng.normal(size=(b, t, dm)), jnp.float32)
    size = jnp.asarray(rng.integers(1, 5, size=(b, t)), jnp.float32)
    want_x, want_s = tome.merge_tokens(x, metric, size, r, p)
    w, s_out = tome.merge_matrix(metric, size, r, p)
    got_x = tome.apply_merge_matrix(x, w, s_out)
    np.testing.assert_allclose(np.asarray(s_out), np.asarray(want_s))
    np.testing.assert_allclose(
        np.asarray(got_x), np.asarray(want_x), atol=1e-5
    )
    # size conservation through the matrix form
    np.testing.assert_allclose(
        np.asarray(s_out.sum(-1)), np.asarray(size.sum(-1)), rtol=1e-6
    )


def test_merge_matrix_is_differentiable():
    """Train-time ToMe: gradients flow through the merge GEMM (the
    matching is piecewise-constant / stop-grad, the values are not)."""
    rng = np.random.default_rng(8)
    b, t, d, dm, r, p = 2, 17, 8, 4, 3, 1
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    metric = jnp.asarray(rng.normal(size=(b, t, dm)), jnp.float32)
    size = jnp.ones((b, t), jnp.float32)

    def loss(x):
        w, s_out = tome.merge_matrix(metric, size, r, p)
        return jnp.sum(tome.apply_merge_matrix(x, w, s_out) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_compress_counts_and_validate():
    """Chunked schedules conserve the total reduction, shrink the distinct
    token-count set, and stay within the bipartite cap."""
    seq, depth, r, p = 197, 12, 13, 1
    per_layer = tome.merge_counts(seq, depth, r, p)
    chunked = tome.compress_counts(per_layer, 3, seq, p)
    assert sum(chunked) == sum(per_layer)
    assert len(chunked) == depth

    def distinct_ts(counts):
        t, seen = seq, set()
        for c in counts:
            seen.add(t)      # attention half
            t -= c
            seen.add(t)      # MLP half
        return seen

    assert len(distinct_ts(chunked)) < len(distinct_ts(per_layer))
    tome.validate_counts(chunked, seq, p)
    with pytest.raises(ValueError, match="bipartite|exist at"):
        tome.validate_counts([98, 98], 197, 1)
    # chunk=1 is the identity
    assert tome.compress_counts(per_layer, 1, seq, p) == per_layer
    # aggressive r at depth: a group's budget can exceed the bipartite
    # A-set at its start layer (r=14 wants 38 pairs at t=71 where only 35
    # exist — found live, campaign r4); the cap+carry keeps every group
    # executable and validate_counts must pass for the whole r sweep
    for rr in range(1, 33):
        for pp in (1, 2):
            pl = tome.merge_counts(seq, depth, rr, pp)
            ch = tome.compress_counts(pl, 3, seq, pp)
            tome.validate_counts(ch, seq, pp)
            assert sum(ch) <= sum(pl)  # carry may drop a tail residue
    # r=14's specific shape: group 9 takes the 35-pair cap, carry dropped
    ch14 = tome.compress_counts(tome.merge_counts(seq, depth, 14, 1), 3, seq, 1)
    assert ch14[9] == 35 and sum(ch14) >= sum(
        tome.merge_counts(seq, depth, 14, 1)
    ) - 3


def test_fused_matches_xla_per_layer_schedule(cfg, params, images):
    """Explicit counts override: both paths on the same per-layer
    schedule still agree (the default is chunked)."""
    counts = tome.merge_counts(
        cfg.seq_len, cfg.depth, 4, cfg.num_prefix_tokens
    )
    a = np.asarray(
        tome_model.forward_xla(params, images, cfg, 4, counts=counts)
    )
    b = np.asarray(
        tome_model.forward_fused(
            params, images, cfg, 4, interpret=True, counts=counts
        )
    )
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_tome_forward_train_grads_match_xla(cfg, params, images):
    """Train-time ToMe (models/tome.forward_train): the differentiable
    kernel halves + merge-matrix GEMM must match jax autodiff of the jnp
    ToMe forward — same schedule (the TRAIN_MERGE_CHUNK default), same
    stop-gradient matching."""
    r = 4
    counts = tome_model.schedule(cfg, r, tome_model.TRAIN_MERGE_CHUNK)

    def loss_k(p):
        return jnp.sum(jnp.sin(tome_model.forward_train(p, images, cfg, r)))

    def loss_x(p):
        return jnp.sum(
            jnp.sin(tome_model.forward_xla(p, images, cfg, r, counts=counts))
        )

    np.testing.assert_allclose(
        float(loss_k(params)), float(loss_x(params)), rtol=1e-5
    )
    gk = jax.grad(loss_k)(params)
    gx = jax.grad(loss_x)(params)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(b).max())
        assert np.abs(a - b).max() / scale < 2e-4


def test_tome_forward_train_chunk_override(cfg, params, images):
    """The train-side ``chunk`` knob (backend-envelope control for the
    fwd+bwd chain): an override away from TRAIN_MERGE_CHUNK must (a)
    actually change the schedule and (b) still match jax autodiff of the
    jnp forward run on the SAME counts."""
    r = 4
    coarse = tome_model.schedule(cfg, r, chunk=3)
    assert coarse != tome_model.schedule(
        cfg, r, tome_model.TRAIN_MERGE_CHUNK
    )  # knob is live

    def loss_k(p):
        return jnp.sum(
            jnp.sin(tome_model.forward_train(p, images, cfg, r, chunk=3))
        )

    def loss_x(p):
        return jnp.sum(
            jnp.sin(tome_model.forward_xla(p, images, cfg, r, counts=coarse))
        )

    np.testing.assert_allclose(
        float(loss_k(params)), float(loss_x(params)), rtol=1e-5
    )
    gk = jax.grad(loss_k)(params)
    gx = jax.grad(loss_x)(params)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(b).max())
        assert np.abs(a - b).max() / scale < 2e-4


def test_tome_train_dropout_matches_xla_twin(cfg, params, images):
    """ToMe x dropout/drop-path (VERDICT r4 composition hole b): the
    kernel-path forward_train and the jnp forward_xla twin regenerate
    BIT-IDENTICAL masks from the same rng, so outputs AND grads must
    match; and the regularizers must actually fire."""
    rcfg = dataclasses.replace(cfg, dropout=0.15, drop_path=0.2)
    r = 4
    counts = tome_model.schedule(rcfg, r, chunk=2)
    rng = jax.random.key(42)

    def loss_k(p):
        return jnp.sum(jnp.sin(tome_model.forward_train(
            p, images, rcfg, r, counts=counts, dropout_rng=rng
        )))

    def loss_x(p):
        return jnp.sum(jnp.sin(tome_model.forward_xla(
            p, images, rcfg, r, counts=counts, dropout_rng=rng
        )))

    np.testing.assert_allclose(
        float(loss_k(params)), float(loss_x(params)), rtol=1e-5
    )
    gk = jax.grad(loss_k)(params)
    gx = jax.grad(loss_x)(params)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(b).max())
        assert np.abs(a - b).max() / scale < 2e-4

    # the masks actually drop something: regularized != unregularized
    plain = tome_model.forward_train(params, images, rcfg, r, counts=counts)
    reg = tome_model.forward_train(
        params, images, rcfg, r, counts=counts, dropout_rng=rng
    )
    assert np.abs(np.asarray(reg) - np.asarray(plain)).max() > 1e-3
    # deterministic given the rng
    reg2 = tome_model.forward_train(
        params, images, rcfg, r, counts=counts, dropout_rng=rng
    )
    np.testing.assert_array_equal(np.asarray(reg), np.asarray(reg2))


def test_tome_train_droppath_only_lerp_matches_xla(cfg, params, images):
    """Drop-path-only recipe (cfg.dropout == 0 — DeiT's/the ToMe paper's
    actual setting): forward_train composes stochastic depth AROUND the
    clean kernels as the lerp x + s*(k(x) - x) instead of entering the
    regularized ``*_train`` twins (whose merged-token chain hard-faults
    the TPU worker on-chip, docs/performance.md round 5).  Outputs and
    grads must still match the jnp twin with bit-identical masks."""
    rcfg = dataclasses.replace(cfg, dropout=0.0, drop_path=0.2)
    r = 4
    counts = tome_model.schedule(rcfg, r, chunk=2)
    rng = jax.random.key(11)

    def loss_k(p):
        return jnp.sum(jnp.sin(tome_model.forward_train(
            p, images, rcfg, r, counts=counts, dropout_rng=rng
        )))

    def loss_x(p):
        return jnp.sum(jnp.sin(tome_model.forward_xla(
            p, images, rcfg, r, counts=counts, dropout_rng=rng
        )))

    np.testing.assert_allclose(
        float(loss_k(params)), float(loss_x(params)), rtol=1e-5
    )
    gk = jax.grad(loss_k)(params)
    gx = jax.grad(loss_x)(params)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(b).max())
        assert np.abs(a - b).max() / scale < 2e-4

    # stochastic depth actually fires (some sample dropped at rate 0.2)
    plain = tome_model.forward_train(params, images, rcfg, r, counts=counts)
    reg = tome_model.forward_train(
        params, images, rcfg, r, counts=counts, dropout_rng=rng
    )
    assert np.abs(np.asarray(reg) - np.asarray(plain)).max() > 1e-3


def test_tome_train_dropout_zero_rates_is_identity(cfg, params, images):
    """rng threaded but rates at 0.0: the regularized path must reproduce
    the plain forward exactly (plumbing does not perturb the math)."""
    r = 4
    counts = tome_model.schedule(cfg, r, chunk=2)
    plain = tome_model.forward_train(params, images, cfg, r, counts=counts)
    reg = tome_model.forward_train(
        params, images, cfg, r, counts=counts, dropout_rng=jax.random.key(7)
    )
    np.testing.assert_allclose(
        np.asarray(reg), np.asarray(plain), atol=1e-6
    )


def test_train_cli_tome(cfg, monkeypatch, capsys):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tome_test", cfg)
    base = ["--config", "vit_tome_test", "--steps", "2", "--batch", "4",
            "--dp", "1", "--no-compile-cache"]
    assert train_main(base + ["--ops", "fused_train", "--tome", "4"]) == 0
    out = capsys.readouterr().out
    assert "tome training: r=4" in out and "step    1" in out
    # exclusions
    assert train_main(base + ["--ops", "qat", "--tome", "4"]) == 2
    assert train_main(
        base + ["--ops", "fused_train", "--tome", "4", "--mae"]
    ) == 2
    capsys.readouterr()


def test_train_cli_tome_with_dropout(cfg, monkeypatch, capsys):
    """--tome + --dropout/--drop-path composes (VERDICT r4 item 6b): the
    regularized merged-token step runs on both op paths."""
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tome_test", cfg)
    base = ["--config", "vit_tome_test", "--steps", "2", "--batch", "4",
            "--dp", "1", "--no-compile-cache", "--tome", "4",
            "--dropout", "0.1", "--drop-path", "0.1"]
    assert train_main(base + ["--ops", "fused_train"]) == 0
    out = capsys.readouterr().out
    assert "tome training: r=4" in out and "dropout: 0.1" in out
    assert "step    1" in out
    assert train_main(base + ["--ops", "xla"]) == 0
    capsys.readouterr()


def test_train_cli_tome_droppath_only(cfg, monkeypatch, capsys):
    """--tome + --drop-path WITHOUT --dropout (the DeiT/ToMe-paper
    recipe) runs through the stochastic-depth lerp around the clean
    kernels (models/tome.forward_train dp_lerp; note the on-chip
    backend envelope still faults even on this minimal chain — the
    xla tier is the on-chip route, docs/performance.md round 5)."""
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tome_test", cfg)
    base = ["--config", "vit_tome_test", "--steps", "2", "--batch", "4",
            "--dp", "1", "--no-compile-cache", "--tome", "4",
            "--drop-path", "0.1"]
    assert train_main(base + ["--ops", "fused_train"]) == 0
    out = capsys.readouterr().out
    assert "tome training: r=4" in out and "step    1" in out
    capsys.readouterr()


def test_train_cli_tome_chunk(cfg, monkeypatch, capsys):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tome_test", cfg)
    base = ["--config", "vit_tome_test", "--steps", "2", "--batch", "4",
            "--dp", "1", "--no-compile-cache"]
    assert train_main(base + ["--ops", "fused_train", "--tome", "4",
                              "--tome-chunk", "3"]) == 0
    out = capsys.readouterr().out
    final_t = cfg.seq_len - sum(tome_model.schedule(cfg, 4, chunk=3))
    assert f"tome training: r=4 (chunk 3, final {final_t} tokens)" in out
    # exclusions: chunk without --tome, and chunk < 1
    assert train_main(base + ["--ops", "fused_train",
                              "--tome-chunk", "2"]) == 2
    assert train_main(base + ["--ops", "fused_train", "--tome", "4",
                              "--tome-chunk", "0"]) == 2
    capsys.readouterr()


# ---------------------------------------------------------------------------
# ToMe x W8A8 composition (models/tome.forward_quant): the int8 kernel-A
# twin gains the ToMe hooks (log-size bias on the fp attention, mean-key
# metric) and a standalone int8 kernel C carries the post-merge MLP.
# ---------------------------------------------------------------------------


def _quant_tree(params):
    from vit_tpu.ops import quant

    return quant.quantize_params(jax.tree.map(jnp.asarray, params))


def test_quant_tome_r0_matches_plain_quant(cfg, params, images):
    # r=0 runs the split A / B / C int8 chain with no merges — same math
    # as the production merged-B+C quant path, so logits must agree.
    from vit_tpu.runtime import InferenceEngine

    plain = InferenceEngine(cfg, params, dtype="float32", ops="quant",
                            batch_pad=2)
    got = np.asarray(
        tome_model.forward_quant(_quant_tree(params), images, cfg, r=0)
    )
    np.testing.assert_allclose(got, np.asarray(plain.logits(images)),
                               atol=1e-5)


def test_quant_tome_matches_jnp_oracle(cfg, params, images):
    # Full r>0 parity against an inline jnp oracle sharing only the W8A8
    # grouping helpers (QK._qkv_q8 / _quant_rows are plain jnp): attention
    # with the log-size bias written independently, and the merge on the
    # gather form (ops.tome.merge_tokens) — cross-checking the production
    # merge-matrix GEMM with different code.
    from vit_tpu.models.vit import prefix_tokens
    from vit_tpu.ops import reference
    from vit_tpu.ops.pallas import quant_kernels as QK
    from vit_tpu.ops.pallas.fused_block import _gelu

    qparams = _quant_tree(params)
    r = 4
    counts = tome_model.schedule(cfg, r)

    x = reference.patch_embed(
        images, qparams["patch_embed"]["kernel"],
        qparams["patch_embed"]["bias"], cfg.patch_size,
    )
    x = reference.add_cls_and_pos(
        x, prefix_tokens(qparams), qparams["pos_embed"]
    )
    b = x.shape[0]
    p = cfg.num_prefix_tokens
    dh = cfg.embed_dim // cfg.num_heads
    sizes = jnp.ones((b, cfg.seq_len), jnp.float32)
    merged = False
    for l in range(cfg.depth):
        blk = jax.tree.map(lambda a: a[l], qparams["blocks"])
        t = x.shape[1]
        qkv = jax.vmap(
            lambda row: QK._qkv_q8(
                row, blk["ln1_scale"].reshape(1, -1),
                blk["ln1_bias"].reshape(1, -1), blk["wqkv"],
                blk["wqkv_scale"].reshape(1, -1),
                blk["bqkv"].reshape(1, -1), cfg.layernorm_eps,
            )
        )(x)  # (b, t, 3D), fp32
        heads_ctx, kacc = [], 0.0
        for h in range(cfg.num_heads):
            base = h * 3 * dh
            q = qkv[..., base : base + dh]
            k = qkv[..., base + dh : base + 2 * dh]
            v = qkv[..., base + 2 * dh : base + 3 * dh]
            s = jnp.einsum("bqd,bkd->bqk", q, k) / (dh ** 0.5)
            if merged:
                s = s + jnp.log(sizes)[:, None, :]
            a = jax.nn.softmax(s, axis=-1)
            heads_ctx.append(jnp.einsum("bqk,bkd->bqd", a, v))
            kacc = kacc + k
        ctx = jnp.concatenate(heads_ctx, -1)
        kmean = kacc / cfg.num_heads
        x = x + ctx @ blk["wo"] + blk["bo"]
        if counts[l] > 0:
            x, sizes = tome.merge_tokens(x, kmean, sizes, counts[l], p)
            merged = True
        h_ln = reference.layer_norm(
            x, blk["ln2_scale"], blk["ln2_bias"], cfg.layernorm_eps
        )
        hq, hs = QK._quant_rows(h_ln)
        mid = (
            jnp.einsum("btk,kf->btf", hq.astype(jnp.int32),
                       blk["w1"].astype(jnp.int32)).astype(jnp.float32)
            * hs * blk["w1_scale"][None, None, :]
        )
        mid = _gelu(mid + blk["b1"], "exact", fast_erf=False)
        mq, ms = QK._quant_rows(mid)
        out = (
            jnp.einsum("btf,fk->btk", mq.astype(jnp.int32),
                       blk["w2"].astype(jnp.int32)).astype(jnp.float32)
            * ms * blk["w2_scale"][None, None, :]
        )
        x = x + out + blk["b2"]
    x = reference.layer_norm(
        x, qparams["ln_final"]["scale"], qparams["ln_final"]["bias"],
        cfg.layernorm_eps,
    )
    want = np.asarray(vit.apply_head(x, qparams))

    got = np.asarray(tome_model.forward_quant(qparams, images, cfg, r=r))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_engine_quant_tome(cfg, params, images):
    # the engine route: quantizes the tree itself and jits forward_quant
    from vit_tpu.runtime import InferenceEngine

    eng = InferenceEngine(cfg, params, dtype="float32", ops="quant",
                          batch_pad=2, tome_r=4)
    labels, probs = eng.classify(np.asarray(images))
    assert labels.shape == (2,) and np.isfinite(probs).all()
    want = np.asarray(
        tome_model.forward_quant(_quant_tree(params), images, cfg, r=4)
    )
    np.testing.assert_allclose(np.asarray(eng.logits(images)), want,
                               atol=1e-5)


def test_engine_quant_tome_dp_mesh(cfg, params, images):
    # quant x ToMe under a dp shard_map mesh matches single-device
    from vit_tpu.parallel import make_mesh
    from vit_tpu.runtime import InferenceEngine

    if jax.device_count() < 2:
        pytest.skip("needs 2 virtual devices")
    mesh = make_mesh({"dp": 2}, jax.devices()[:2])
    single = InferenceEngine(cfg, params, dtype="float32", ops="quant",
                             batch_pad=2, tome_r=4)
    sharded = InferenceEngine(cfg, params, dtype="float32", ops="quant",
                              batch_pad=2, tome_r=4, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(sharded.logits(images)),
        np.asarray(single.logits(images)), atol=1e-5,
    )
