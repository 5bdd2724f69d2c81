"""Model-level differential tests: jitted jnp forward vs the independent
NumPy oracle — the TPU analog of the reference's ViT_seq/ViT_opencl
cross-check (Main.c:48-53, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.models import oracle, vit


def test_forward_matches_oracle(tiny_cfg, tiny_params, tiny_images):
    logits = np.asarray(vit.forward(tiny_params, jnp.asarray(tiny_images), tiny_cfg))
    want = oracle.forward(tiny_params, tiny_images, tiny_cfg)
    assert np.abs(logits - want).max() < 1e-3  # BASELINE.md north-star gate
    np.testing.assert_allclose(logits, want, atol=1e-4)


def test_scan_equals_unrolled(tiny_cfg, tiny_params, tiny_images):
    x = jnp.asarray(tiny_images)
    a = np.asarray(vit.forward(tiny_params, x, tiny_cfg, unroll_layers=False))
    b = np.asarray(vit.forward(tiny_params, x, tiny_cfg, unroll_layers=True))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_forward_is_jittable(tiny_cfg, tiny_params, tiny_images):
    fn = jax.jit(vit.logits_fn(tiny_cfg))
    logits = fn(tiny_params, jnp.asarray(tiny_images))
    assert logits.shape == (len(tiny_images), tiny_cfg.num_classes)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_batch_row_independence(tiny_cfg, tiny_params, tiny_images):
    # Batched forward must equal per-image forward (the reference runs the
    # batch serially, ViT_seq.c:354; we must match while batching).
    x = jnp.asarray(tiny_images)
    full = np.asarray(vit.forward(tiny_params, x, tiny_cfg))
    one = np.asarray(vit.forward(tiny_params, x[1:2], tiny_cfg))
    np.testing.assert_allclose(full[1:2], one, atol=1e-5)


def test_param_count_matches_config(tiny_cfg, tiny_params):
    assert vit.num_params(tiny_params) == tiny_cfg.num_params()


def test_with_image_size_rejects_non_patch_multiple(tiny_cfg):
    # fail at config time, not as a raw reshape error deep in the forward
    import pytest

    from vit_tpu.config import VIT_H_14

    with pytest.raises(ValueError, match="patch_size"):
        VIT_H_14.with_image_size(384)  # 384 % 14 != 0
    assert tiny_cfg.with_image_size(64).seq_len == 17  # (64/16)^2 + 1


def test_probabilities_agree_with_oracle(tiny_cfg, tiny_params, tiny_images):
    from vit_tpu.ops import reference as R

    logits = vit.forward(tiny_params, jnp.asarray(tiny_images), tiny_cfg)
    probs = np.asarray(R.softmax(logits))
    want = oracle.probabilities(oracle.forward(tiny_params, tiny_images, tiny_cfg))
    np.testing.assert_allclose(probs, want, atol=1e-5)
    assert (np.argmax(probs, -1) == np.argmax(want, -1)).all()


def test_bf16_forward_close_to_fp32(tiny_cfg, tiny_params, tiny_images):
    bf16_params = vit.cast_params(tiny_params, jnp.bfloat16)
    a = np.asarray(vit.forward(tiny_params, jnp.asarray(tiny_images), tiny_cfg))
    b = np.asarray(vit.forward(bf16_params, jnp.asarray(tiny_images), tiny_cfg))
    # bf16 activations: expect ~1e-2 absolute agreement on O(1) logits
    assert np.abs(a - b).max() < 5e-2
    assert (np.argmax(a, -1) == np.argmax(b, -1)).all()


def test_init_head_matches_init_params_head_leaf(tiny_cfg):
    """init_head (transfer-learning fast path) must produce the same
    shapes/dtypes and init scale family as init_params' head leaf."""
    import jax
    import numpy as np

    from vit_tpu.models import vit

    full = vit.init_params(jax.random.key(0), tiny_cfg)["head"]
    head = vit.init_head(jax.random.key(1), tiny_cfg)
    assert head["kernel"].shape == full["kernel"].shape
    assert head["bias"].shape == full["bias"].shape
    assert head["kernel"].dtype == full["kernel"].dtype
    # same truncated-normal scale rule: std ~ 1/sqrt(embed_dim)
    std = float(np.asarray(head["kernel"], np.float32).std())
    want = (1.0 / tiny_cfg.embed_dim) ** 0.5
    assert 0.5 * want < std < 1.5 * want
    assert not np.any(np.asarray(head["bias"]))


def test_wide_head_config_smoke(tiny_cfg, tiny_images):
    """vit_b_16_wide-style geometry (fewer, wider heads in the same tensor
    shapes) must run through every dispatch surface and match the oracle —
    the config exists for the dh=128 MXU-lane headroom study
    (docs/performance.md kernel-A floor)."""
    import dataclasses

    from vit_tpu.config import VIT_B_16_WIDE

    assert VIT_B_16_WIDE.num_params() == dataclasses.replace(
        VIT_B_16_WIDE, num_heads=12
    ).num_params()
    assert not VIT_B_16_WIDE.native_checkpoints
    wide = dataclasses.replace(
        tiny_cfg, num_heads=2, native_checkpoints=False, name="tiny_wide"
    )
    params = vit.init_params(jax.random.key(3), wide)
    logits = np.asarray(
        jax.jit(vit.logits_fn(wide))(params, jnp.asarray(tiny_images))
    )
    want = oracle.forward(params, tiny_images, wide)
    np.testing.assert_allclose(logits, want, atol=1e-4)
