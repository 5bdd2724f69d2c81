"""HF transformers ViT converter tests: build a tiny HF model offline,
convert, and check logits parity against the HF forward itself."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vit_tpu.io.hf_convert import config_from_hf, params_from_hf_state_dict
from vit_tpu.models import vit


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.ViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=256,
        image_size=32,
        patch_size=16,
        num_channels=3,
        num_labels=11,
        hidden_act="gelu",  # exact-erf GELU, matching our 'exact' variant
    )
    torch.manual_seed(0)
    model = transformers.ViTForImageClassification(hf_cfg).eval()
    return hf_cfg, model


def test_config_mapping(hf_model):
    hf_cfg, _ = hf_model
    cfg = config_from_hf(hf_cfg)
    assert cfg.embed_dim == 64 and cfg.depth == 2 and cfg.num_heads == 4
    assert cfg.seq_len == 5  # (32/16)^2 + 1
    assert cfg.mlp_dim == 256
    assert cfg.num_classes == 11


def test_logits_match_hf_forward(hf_model):
    hf_cfg, model = hf_model
    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(3, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        want = model(torch.from_numpy(images)).logits.numpy()
    got = np.asarray(vit.forward(params, jnp.asarray(images), cfg))
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert (got.argmax(-1) == want.argmax(-1)).all()


def test_missing_key_raises(hf_model):
    hf_cfg, model = hf_model
    cfg = config_from_hf(hf_cfg)
    sd = dict(model.state_dict())
    del sd["vit.layernorm.weight"]
    with pytest.raises(KeyError):
        params_from_hf_state_dict(sd, cfg)


def test_num_classes_mismatch_actionable_error(hf_model):
    """A config/checkpoint head-width mismatch must fail with a message
    naming --num-classes, not die inside reshape."""
    import dataclasses

    hf_cfg, model = hf_model
    cfg = dataclasses.replace(config_from_hf(hf_cfg), num_classes=1000)
    with pytest.raises(ValueError, match="--num-classes"):
        params_from_hf_state_dict(model.state_dict(), cfg)


def test_resolution_mismatch_actionable_error(hf_model):
    import dataclasses

    hf_cfg, model = hf_model
    cfg = config_from_hf(hf_cfg)
    cfg = dataclasses.replace(cfg, image_size=cfg.image_size * 2)
    with pytest.raises(ValueError, match="position embeddings"):
        params_from_hf_state_dict(model.state_dict(), cfg)


def test_bf16_state_dict_converts(hf_model):
    """.numpy() rejects bfloat16 tensors; the converter must go through
    .float() (same fix in torch_convert._to_numpy)."""
    hf_cfg, model = hf_model
    cfg = config_from_hf(hf_cfg)
    sd = {k: v.to(torch.bfloat16) for k, v in model.state_dict().items()}
    params = params_from_hf_state_dict(sd, cfg)
    assert params["head"]["kernel"].dtype == np.float32

    from vit_tpu.io.torch_convert import _to_numpy

    out = _to_numpy(torch.ones(3, dtype=torch.bfloat16))
    assert out.dtype == np.float32
