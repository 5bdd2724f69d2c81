"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the real environment has one TPU
chip; multi-chip sharding is validated on forced host devices, matching the
driver's dryrun).  Environment must be set before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import dataclasses

import jax

# The environment's sitecustomize force-registers the axon TPU platform and
# overrides JAX_PLATFORMS; undo it before any backend initializes.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.config import VIT_B_16, ViTConfig


@pytest.fixture(scope="session")
def tiny_cfg() -> ViTConfig:
    """A scaled-down ViT that keeps every structural property of B/16
    (CLS token, pre-LN blocks, packed QKV) but runs in milliseconds."""
    return dataclasses.replace(
        VIT_B_16,
        depth=2,
        embed_dim=64,
        num_heads=4,
        image_size=32,
        patch_size=16,
        num_classes=11,
        name="vit_tiny_test",
    )


@pytest.fixture(scope="session")
def tiny_params(tiny_cfg):
    from vit_tpu.io import weights as wio

    tensors = wio.synth_reference_tensors(tiny_cfg, seed=1)
    params = wio.params_from_tensors(tensors, tiny_cfg)
    return jax.tree.map(jnp.asarray, params)


@pytest.fixture(scope="session")
def tiny_images(tiny_cfg):
    from vit_tpu.io import images as iio

    return iio.synth_images(4, tiny_cfg, seed=2)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
