"""MAE pretraining (models/mae.py): masking properties, loss oracle,
encoder parity with the classifier forward, fused-kernel path, mesh step,
backbone extraction, and a convergence gate."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_tpu.config import DEIT_B_16
from vit_tpu.models import mae, vit
from vit_tpu.ops.dispatch import get_ops
from vit_tpu.runtime import trainer


MCFG = mae.MAEConfig(mask_ratio=0.5, decoder_dim=32, decoder_depth=1,
                     decoder_heads=2, norm_pix_loss=True)


@pytest.fixture(scope="module")
def mae_params(tiny_cfg):
    return mae.init_mae_params(jax.random.PRNGKey(3), tiny_cfg, MCFG)


def test_random_mask_properties(tiny_cfg):
    n = tiny_cfg.num_patches
    keep, restore, mask = mae.random_mask(jax.random.PRNGKey(0), 8, n, 3)
    assert keep.shape == (8, 3) and restore.shape == (8, n)
    for b in range(8):
        row_keep = set(np.asarray(keep[b]).tolist())
        assert len(row_keep) == 3  # distinct indices
        # mask is 0 exactly on the kept patches
        kept_by_mask = {i for i in range(n) if mask[b, i] == 0.0}
        assert kept_by_mask == row_keep
    # restore is the inverse shuffle: restore[shuffle[i]] == i
    noise_keep2, _, mask2 = mae.random_mask(jax.random.PRNGKey(1), 8, n, 3)
    assert not np.array_equal(np.asarray(mask), np.asarray(mask2))
    # deterministic in the key
    keep3, _, _ = mae.random_mask(jax.random.PRNGKey(0), 8, n, 3)
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(keep3))


def test_patchify_matches_patch_embed_rows(tiny_cfg, tiny_params, tiny_images):
    """patchify's flatten order must be the patch-embed GEMM's input rows
    (ViT_seq.c:36-41) or pixel targets and predictions would be permuted."""
    x = jnp.asarray(tiny_images)
    rows = mae.patchify(x, tiny_cfg.patch_size)
    pe = tiny_params["patch_embed"]
    want = np.asarray(
        get_ops("xla").patch_embed(x, pe["kernel"], pe["bias"], tiny_cfg.patch_size)
    )
    got = np.asarray(rows @ pe["kernel"] + pe["bias"])
    np.testing.assert_allclose(got, want, atol=1e-5)
    # and unpatchify inverts it exactly
    np.testing.assert_array_equal(
        np.asarray(mae.unpatchify(rows, tiny_cfg)), np.asarray(x)
    )


def test_loss_matches_numpy_oracle(tiny_cfg, mae_params, tiny_images):
    x = jnp.asarray(tiny_images)
    rng = jax.random.PRNGKey(7)
    loss, (pred, mask) = mae.forward_loss(
        mae_params, x, rng, tiny_cfg, MCFG, return_pred=True
    )
    target = np.asarray(mae.patchify(x, tiny_cfg.patch_size), np.float64)
    mean = target.mean(-1, keepdims=True)
    var = target.var(-1, keepdims=True)
    target = (target - mean) / np.sqrt(var + 1e-6)
    per_patch = ((np.asarray(pred, np.float64) - target) ** 2).mean(-1)
    m = np.asarray(mask, np.float64)
    want = (per_patch * m).sum() / m.sum()
    assert abs(float(loss) - want) < 1e-5


def test_loss_ignores_visible_patches(tiny_cfg, mae_params, tiny_images):
    """Only masked patches are scored (He et al. §3.4): zeroing the
    prediction on every visible patch must not change the loss."""
    x = jnp.asarray(tiny_images)
    rng = jax.random.PRNGKey(5)
    loss, (pred, mask) = mae.forward_loss(
        mae_params, x, rng, tiny_cfg, MCFG, return_pred=True
    )
    target = mae.patchify(x.astype(jnp.float32), tiny_cfg.patch_size)
    mean = target.mean(-1, keepdims=True)
    var = target.var(-1, keepdims=True)
    target = (target - mean) * jax.lax.rsqrt(var + 1e-6)
    per_patch = jnp.square(pred - target).mean(-1)
    masked_only = (per_patch * mask).sum() / mask.sum()
    unmasked_mean = per_patch.mean()
    assert abs(float(loss) - float(masked_only)) < 1e-6
    assert abs(float(loss) - float(unmasked_mean)) > 1e-6  # gate has teeth


def test_encode_matches_classifier_forward(tiny_cfg, mae_params, tiny_images):
    """With keep = identity (nothing masked), the MAE encoder IS the
    classifier trunk: CLS row must equal vit.forward's features."""
    x = jnp.asarray(tiny_images)
    keep = jnp.broadcast_to(
        jnp.arange(tiny_cfg.num_patches, dtype=jnp.int32),
        (x.shape[0], tiny_cfg.num_patches),
    )
    tokens = mae.encode(mae_params, x, keep, tiny_cfg)
    bb = mae.extract_backbone(mae_params, jax.random.PRNGKey(0), tiny_cfg)
    feats = vit.forward(bb, x, tiny_cfg, return_features=True)
    np.testing.assert_allclose(
        np.asarray(tokens[:, 0, :], np.float32), np.asarray(feats), atol=1e-5
    )


def test_forward_loss_fused_train_matches_xla(tiny_cfg, mae_params, tiny_images):
    """The encoder runs through the trainable megakernels (interpret mode
    off-TPU) at the masked token count; same mask → same loss."""
    x = jnp.asarray(tiny_images)
    rng = jax.random.PRNGKey(11)
    a = mae.forward_loss(mae_params, x, rng, tiny_cfg, MCFG, ops=get_ops("xla"))
    b = mae.forward_loss(
        mae_params, x, rng, tiny_cfg, MCFG, ops=get_ops("fused_train")
    )
    assert abs(float(a) - float(b)) < 1e-4
    ga = jax.grad(
        lambda p: mae.forward_loss(p, x, rng, tiny_cfg, MCFG, ops=get_ops("xla"))
    )(mae_params)
    gb = jax.grad(
        lambda p: mae.forward_loss(
            p, x, rng, tiny_cfg, MCFG, ops=get_ops("fused_train")
        )
    )(mae_params)
    for pa, pb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=5e-4)


def test_mae_step_on_mesh(tiny_cfg, mae_params, tiny_images):
    from vit_tpu.parallel import make_mesh

    mesh = make_mesh({"dp": 4, "tp": 2})
    opt = optax.adamw(1e-3)
    # the jitted step donates params/opt_state — work on copies so the
    # module-scoped fixture survives for later tests
    params = jax.tree.map(jnp.copy, mae_params)
    opt_state = opt.init(params)
    step = trainer.jit_mae_step_for_mesh(
        tiny_cfg, MCFG, opt, mesh, params, opt_state
    )
    x = jnp.concatenate([jnp.asarray(tiny_images)] * 2)  # batch 8 over dp=4
    p, o, loss = step(params, opt_state, x, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(mae_params), jax.tree.leaves(p))
    )
    assert moved


def test_mae_convergence(tiny_cfg, tiny_images):
    """Overfit the reconstruction on 4 images: loss must drop well below
    its starting value within a bounded step count."""
    params = mae.init_mae_params(jax.random.PRNGKey(0), tiny_cfg, MCFG)
    opt = optax.adamw(3e-3)
    step = jax.jit(trainer.make_mae_train_step(tiny_cfg, MCFG, opt))
    opt_state = opt.init(params)
    x = jnp.asarray(tiny_images)
    first = None
    for i in range(60):
        params, opt_state, loss = step(
            params, opt_state, x, jax.random.PRNGKey(i % 4)
        )
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first, (first, float(loss))


def test_extract_backbone_structure(tiny_cfg, mae_params):
    bb = mae.extract_backbone(mae_params, jax.random.PRNGKey(2), tiny_cfg)
    ref = vit.init_params(jax.random.PRNGKey(0), tiny_cfg)
    assert jax.tree.structure(bb) == jax.tree.structure(ref)
    assert mae.is_mae_params(mae_params)
    assert not mae.is_mae_params(bb)
    # encoder leaves are shared, not re-initialized
    np.testing.assert_array_equal(
        np.asarray(bb["blocks"]["wqkv"]), np.asarray(mae_params["blocks"]["wqkv"])
    )


def test_mae_config_validation(tiny_cfg):
    with pytest.raises(ValueError, match="distilled"):
        mae.check_config(DEIT_B_16)
    with pytest.raises(ValueError, match="visible"):
        mae.MAEConfig(mask_ratio=1.0).len_keep(tiny_cfg)
    # mask_ratio 0 masks nothing: the loss would be identically zero
    with pytest.raises(ValueError, match="masked patch"):
        mae.MAEConfig(mask_ratio=0.0).len_keep(tiny_cfg)
    with pytest.raises(ValueError, match="divisible"):
        mae.MAEConfig(decoder_dim=33, decoder_heads=2).decoder_cfg(tiny_cfg)
    # positivity validates BEFORE divisibility (heads=0 must not be a
    # ZeroDivisionError, which the CLI's ValueError handler can't catch)
    for bad in (
        mae.MAEConfig(decoder_heads=0),
        mae.MAEConfig(decoder_dim=-512),
        mae.MAEConfig(decoder_depth=0),
    ):
        with pytest.raises(ValueError, match="positive"):
            bad.decoder_cfg(tiny_cfg)


def test_train_cli_mae_pretrain_then_finetune(tiny_cfg, monkeypatch, capsys,
                                              tmp_path):
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs 2 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    bb = tmp_path / "backbone.npz"
    raw = tmp_path / "mae.npz"
    rc = train_main([
        "--config", "vit_tiny_test", "--mae", "--steps", "3", "--batch", "4",
        "--dp", "2", "--ops", "xla", "--mask-ratio", "0.5",
        "--mae-decoder", "32,1,2", "--save-backbone", str(bb),
        "--save", str(raw), "--no-compile-cache",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mae: mask_ratio 0.5" in out and "step    2" in out
    assert bb.exists() and raw.exists()
    # the backbone fine-tunes through the ordinary transfer path
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "1", "--batch", "4",
        "--dp", "1", "--ops", "xla", "--init-weights", str(bb),
        "--num-classes", "5", "--no-compile-cache",
    ])
    assert rc == 0
    # the RAW mae tree (decoder, no head) is refused with the recipe
    from vit_tpu.io.load_any import load_params_any

    with pytest.raises(ValueError, match="save-backbone"):
        load_params_any(raw, tiny_cfg)


def test_train_cli_mae_flag_validation(tiny_cfg, monkeypatch, capsys):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    base = ["--config", "vit_tiny_test", "--steps", "1", "--batch", "4",
            "--no-compile-cache"]
    assert train_main(base + ["--mae", "--augment", "flip"]) == 2
    assert train_main(base + ["--mae", "--num-classes", "5"]) == 2
    assert train_main(base + ["--mae", "--mae-decoder", "bogus"]) == 2
    assert train_main(base + ["--mae", "--mask-ratio", "1.5"]) == 2
    assert train_main(base + ["--mae", "--mae-decoder", "32,1,0"]) == 2
    assert train_main(base + ["--save-backbone", "x.npz"]) == 2
    # MAE-only flags without --mae are an error, not silently ignored
    assert train_main(base + ["--mask-ratio", "0.5"]) == 2
    assert train_main(base + ["--mae-decoder", "32,1,2"]) == 2
    assert train_main(base + ["--no-norm-pix"]) == 2
    capsys.readouterr()


def test_mixed_precision_mae_step(tiny_cfg, mae_params, tiny_images):
    opt = optax.adamw(1e-3)
    step = jax.jit(
        trainer.make_mae_train_step(
            tiny_cfg, MCFG, opt, compute_dtype=jnp.bfloat16
        )
    )
    opt_state = opt.init(mae_params)
    p, o, loss = step(
        mae_params, opt_state, jnp.asarray(tiny_images), jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(loss))
    # master weights stay fp32
    assert p["blocks"]["wqkv"].dtype == jnp.float32
