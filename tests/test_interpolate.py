"""Position-embedding interpolation tests (resolution transfer)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.io.interpolate import adapt_params_resolution, interpolate_pos_embed


def test_identity_when_same_grid():
    pe = jnp.asarray(np.random.default_rng(0).normal(size=(17, 8)), jnp.float32)
    out = interpolate_pos_embed(pe, 4, 4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pe))


def test_shapes_and_cls_preserved():
    pe = jnp.asarray(np.random.default_rng(0).normal(size=(1 + 4 * 4, 8)), jnp.float32)
    out = interpolate_pos_embed(pe, 4, 6)
    assert out.shape == (1 + 36, 8)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(pe[0]))  # CLS


def test_constant_field_is_invariant():
    # a constant position table must stay constant under resize
    pe = jnp.ones((1 + 9, 5), jnp.float32) * 3.5
    out = interpolate_pos_embed(pe, 3, 7)
    np.testing.assert_allclose(np.asarray(out), 3.5, atol=1e-5)


def test_wrong_rows_raises():
    with pytest.raises(ValueError):
        interpolate_pos_embed(jnp.zeros((10, 4)), 4, 6)


def test_adapt_params_runs_model_at_new_resolution(tiny_cfg, tiny_params, tiny_images):
    from vit_tpu.models import vit

    to_cfg = tiny_cfg.with_image_size(48)  # 2x2 grid -> 3x3 grid
    params384 = adapt_params_resolution(tiny_params, tiny_cfg, to_cfg)
    assert params384["pos_embed"].shape == (to_cfg.seq_len, tiny_cfg.embed_dim)
    imgs = np.random.default_rng(0).normal(
        size=(2, 3, to_cfg.image_size, to_cfg.image_size)
    ).astype(np.float32)
    logits = vit.forward(params384, jnp.asarray(imgs), to_cfg)
    assert logits.shape == (2, to_cfg.num_classes)
    assert np.isfinite(np.asarray(logits)).all()


def test_adapt_rejects_architecture_mismatch(tiny_cfg, tiny_params):
    bad = dataclasses.replace(tiny_cfg, embed_dim=tiny_cfg.embed_dim * 2)
    with pytest.raises(ValueError):
        adapt_params_resolution(tiny_params, tiny_cfg, bad)


def test_bicubic_matches_torch_exactly():
    """The resize must reproduce torch F.interpolate bicubic (Keys kernel
    a=-0.75, border replicate) — torchvision's interpolate_embeddings uses
    align_corners=True; jax.image.resize's a=-0.5 kernel drifts off a
    torchvision-interpolated checkpoint."""
    torch = pytest.importorskip("torch")
    import numpy as np

    from vit_tpu.io.interpolate import bicubic_resize_grid

    rng = np.random.default_rng(11)
    for (h, w, th, tw, ac) in [(14, 14, 24, 24, True), (14, 14, 24, 24, False),
                               (7, 7, 3, 5, True), (4, 6, 9, 8, False)]:
        grid = rng.normal(size=(h, w, 5)).astype(np.float32)
        got = np.asarray(bicubic_resize_grid(grid, (th, tw), align_corners=ac))
        want = torch.nn.functional.interpolate(
            torch.from_numpy(grid).permute(2, 0, 1)[None],
            size=(th, tw), mode="bicubic", align_corners=ac,
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"{(h, w, th, tw, ac)}")


def test_bicubic_resize_pins_highest_precision():
    """This JAX build contracts fp32 matmuls in bf16 at DEFAULT precision
    on TPU (CLAUDE.md); the torch-exact resize must pin HIGHEST or the
    @384 pos-embed transfer drifts ~2.6e-3 on the real chip — the same
    order as the a=-0.75 vs a=-0.5 kernel gap this module eliminates.
    (CPU parity tests can't see it: CPU default precision is exact.)"""
    import jax
    import numpy as np

    from vit_tpu.io.interpolate import bicubic_resize_grid

    jaxpr = jax.make_jaxpr(lambda g: bicubic_resize_grid(g, (24, 24)))(
        np.zeros((14, 14, 8), np.float32)
    )
    dots = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert dots, "expected dot_general eqns in the resize jaxpr"
    hi = jax.lax.Precision.HIGHEST
    for e in dots:
        assert e.params["precision"] == (hi, hi), e.params
