"""Model-variant coverage: every registered config (B/16, B/32, L/16, L/32,
H/14, 384px) builds, shape-checks, and has a consistent weight-spec table —
via jax.eval_shape so nothing big actually runs."""

import jax
import jax.numpy as jnp
import pytest

from vit_tpu.config import CONFIGS, get_config
from vit_tpu.io import weights as wio
from vit_tpu.models import vit


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_variant_forward_shape(name):
    cfg = get_config(name)

    def build_and_run(key):
        params = vit.init_params(key, cfg)
        imgs = jnp.zeros((2, cfg.in_channels, cfg.image_size, cfg.image_size))
        return vit.forward(params, imgs, cfg)

    out = jax.eval_shape(build_and_run, jax.random.key(0))
    assert out.shape == (2, cfg.num_classes)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_variant_param_count_consistency(name):
    cfg = get_config(name)
    params = jax.eval_shape(lambda k: vit.init_params(k, cfg), jax.random.key(0))
    total = sum(int(jnp.prod(jnp.asarray(l.shape))) for l in jax.tree.leaves(params))
    assert total == cfg.num_params()
    if cfg.distilled:
        # the reference Weight_*.bin layout cannot represent the
        # distillation token/head — the loaders gate it (test_deit.py)
        return
    # weight-spec table agrees with the pytree
    spec_total = sum(
        int(jnp.prod(jnp.asarray(shape)))
        for _, _, shape in wio.reference_tensor_specs(cfg)
    )
    assert spec_total == cfg.num_params()


def test_known_param_counts():
    # torchvision-published parameter counts (sanity anchors)
    assert abs(get_config("vit_b_16").num_params() - 86_567_656) < 1000
    assert abs(get_config("vit_l_16").num_params() - 304_326_632) < 1000


def test_384_variant_token_count():
    cfg = get_config("vit_b_16_384")
    assert cfg.seq_len == 577  # BASELINE.json config 4


def test_bench_multichip_smoke(capsys):
    """The staged pod benchmark (scripts/bench_multichip.py) must keep
    working on the virtual CPU mesh so the measurement path can't rot
    while awaiting multi-chip hardware (round-2 verdict task 6)."""
    import json
    import sys
    from pathlib import Path

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    scripts = Path(__file__).resolve().parent.parent / "scripts"
    sys.path.insert(0, str(scripts))
    try:
        import bench_multichip
    finally:
        sys.path.remove(str(scripts))
    rc = bench_multichip.main(["--smoke"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    # dp-infer, dpxtp-infer, dpxsp-infer (ring), pp-infer, dp-train,
    # zero1-train, fsdp-train
    assert len(lines) == 7
    recs = [json.loads(l) for l in lines]
    for rec in recs:
        assert "error" not in rec, rec
        assert rec["value"] > 0 and rec["n_chips"] >= 2
        assert rec["unit"] == "images/sec"
    meshes = [rec["mesh"] for rec in recs]
    assert {"dp": 8} in meshes and {"dp": 4, "tp": 2} in meshes
    assert {"dp": 2, "sp": 4} in meshes and {"pp": 2} in meshes
    train = [rec for rec in recs if rec.get("train_step")]
    assert len(train) == 3
    assert {t["ops_impl"] for t in train} == {
        "fused_train", "xla+zero1", "xla+fsdp"
    }
    by_mode = {t["ops_impl"]: t for t in train}
    # the measured per-device HBM cut: zero1 shards the moments (~dp x
    # less opt state than params x 2), fsdp shards the params too
    z, f = by_mode["xla+zero1"], by_mode["xla+fsdp"]
    assert z["per_device_opt_state_mb"] < 0.5 * z["per_device_param_mb"]
    assert f["per_device_param_mb"] < 0.5 * z["per_device_param_mb"]
