"""InferenceEngine tests: dtype policy, batch padding, classify output."""

import jax.numpy as jnp
import numpy as np

from vit_tpu.models import oracle, vit
from vit_tpu.runtime import InferenceEngine


def test_engine_fp32_matches_direct_forward(tiny_cfg, tiny_params, tiny_images):
    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=4)
    got = np.asarray(engine.logits(tiny_images))
    want = np.asarray(vit.forward(tiny_params, jnp.asarray(tiny_images), tiny_cfg))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_engine_pads_odd_batches(tiny_cfg, tiny_params, tiny_images):
    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=4)
    got3 = np.asarray(engine.logits(tiny_images[:3]))  # pads 3 -> 4
    got4 = np.asarray(engine.logits(tiny_images))
    assert got3.shape == (3, tiny_cfg.num_classes)
    np.testing.assert_allclose(got3, got4[:3], atol=1e-5)


def test_engine_classify_matches_oracle(tiny_cfg, tiny_params, tiny_images):
    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=4)
    labels, probs = engine.classify(tiny_images)
    want = oracle.probabilities(oracle.forward(tiny_params, tiny_images, tiny_cfg))
    assert (labels == want.argmax(-1)).all()
    np.testing.assert_allclose(probs, want.max(-1), atol=1e-4)


def test_engine_bf16_labels_match_fp32(tiny_cfg, tiny_params, tiny_images):
    fp32 = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=4)
    bf16 = InferenceEngine(tiny_cfg, tiny_params, dtype="bfloat16", batch_pad=4)
    l32, _ = fp32.classify(tiny_images)
    l16, _ = bf16.classify(tiny_images)
    assert (l32 == l16).all()


def test_engine_gelu_variants_diverge_slightly(tiny_cfg, tiny_params, tiny_images):
    # erf (reference CPU) vs tanh (reference GPU kernel) — the framework
    # keeps both conventions (SURVEY.md §4.3).
    a = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", gelu_variant="exact",
                        batch_pad=4)
    b = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", gelu_variant="tanh",
                        batch_pad=4)
    la = np.asarray(a.logits(tiny_images))
    lb = np.asarray(b.logits(tiny_images))
    assert 0 < np.abs(la - lb).max() < 0.05


def test_phase_report(tiny_cfg, tiny_params, tiny_images):
    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=4)
    report = engine.phase_report(tiny_images, iters=1)
    for phase in ("patch_embed+pos", "attention", "mlp", "final_ln+head"):
        assert phase in report


def test_phase_report_rejects_quant(tiny_cfg, tiny_params, tiny_images):
    import pytest as _pytest

    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", ops="quant",
                             batch_pad=4)
    with _pytest.raises(NotImplementedError):
        engine.phase_report(tiny_images)


def test_features_extraction(tiny_cfg, tiny_params, tiny_images):
    from vit_tpu.ops import reference as R

    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=4)
    feats = np.asarray(engine.features(tiny_images))
    assert feats.shape == (len(tiny_images), tiny_cfg.embed_dim)
    # head(features) must reproduce the logits
    logits = np.asarray(engine.logits(tiny_images))
    manual = feats @ np.asarray(tiny_params["head"]["kernel"]) + np.asarray(
        tiny_params["head"]["bias"]
    )
    np.testing.assert_allclose(manual, logits, atol=1e-4)


def _second_params(tiny_cfg, seed=7):
    from vit_tpu.io import weights as wio

    return wio.params_from_tensors(
        wio.synth_reference_tensors(tiny_cfg, seed=seed), tiny_cfg
    )


def test_swap_params_hot_reloads_weights(tiny_cfg, tiny_params, tiny_images):
    """Zero-downtime reload: after swap_params the engine serves exactly
    what a fresh engine built on the new checkpoint serves — same compiled
    programs, new weights."""
    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=4)
    before = np.asarray(engine.logits(tiny_images))
    new_params = _second_params(tiny_cfg)
    fresh = InferenceEngine(tiny_cfg, new_params, dtype="float32", batch_pad=4)
    want = np.asarray(fresh.logits(tiny_images))
    engine.swap_params(new_params)
    after = np.asarray(engine.logits(tiny_images))
    np.testing.assert_array_equal(after, want)
    assert np.abs(after - before).max() > 1e-3  # actually new weights


def test_swap_params_requantizes_for_quant_engine(tiny_cfg, tiny_params, tiny_images):
    engine = InferenceEngine(
        tiny_cfg, tiny_params, dtype="float32", ops="quant", batch_pad=4
    )
    new_params = _second_params(tiny_cfg)
    engine.swap_params(new_params)  # fp pytree -> re-quantized in place
    fresh = InferenceEngine(
        tiny_cfg, new_params, dtype="float32", ops="quant", batch_pad=4
    )
    np.testing.assert_array_equal(
        np.asarray(engine.logits(tiny_images)),
        np.asarray(fresh.logits(tiny_images)),
    )


def test_swap_params_rejects_mismatched_checkpoint(tiny_cfg, tiny_params):
    import dataclasses

    import pytest as _pytest

    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=4)
    wrong_cfg = dataclasses.replace(
        tiny_cfg, num_classes=tiny_cfg.num_classes + 2, name="tiny_wrong"
    )
    with _pytest.raises(ValueError, match="shapes"):
        engine.swap_params(_second_params(wrong_cfg))
    # the old weights keep serving after a rejected swap
    assert np.isfinite(np.asarray(engine.logits(
        np.zeros((1, 3, tiny_cfg.image_size, tiny_cfg.image_size), np.float32)
    ))).all()
