"""Weight loader tests: format round-trip, 6-decimal rounding parity
(Network.c:184-187), torchvision-layout repacking, and — when the real
reference checkpoint is present — shape validation against it."""

from pathlib import Path

import numpy as np
import pytest

from vit_tpu.config import VIT_B_16
from vit_tpu.io import weights as wio

REFERENCE_NETWORK_DIR = Path("/root/reference/Network")


def test_round6_matches_reference_semantics():
    # C roundf: halves away from zero (0.2941325 -> 0.294133, not .294132)
    x = np.array(
        [0.12345649, -0.98765449, 1.5e-7, 123.4567891, 0.2941325, -0.6259065],
        np.float32,
    )
    got = wio.round6(x)
    # ties scale to *.5 in fp32 and must round away from zero:
    # 0.2941325 -> 294132.5 -> 0.294133; -0.98765449 -> -987654.5 -> -0.987655
    np.testing.assert_array_equal(
        got[[2, 4, 5]],
        np.float32([0.0, 0.294133, -0.625907]),
    )
    np.testing.assert_array_equal(got[[0, 1]], np.float32([0.123456, -0.987655]))


def test_spec_count_is_152_for_b16():
    # 4 + 12*12 + 4 tensors (SURVEY.md §5 index layout)
    assert len(wio.reference_tensor_specs(VIT_B_16)) == 152


def test_save_load_roundtrip(tmp_path, tiny_cfg):
    tensors = wio.synth_reference_tensors(tiny_cfg, seed=3)
    wio.save_reference_weights(tensors, tmp_path, tiny_cfg)
    loaded = wio.load_reference_tensors(tmp_path, tiny_cfg, round_to_6dp=False)
    assert set(loaded) == set(tensors)
    for idx in tensors:
        np.testing.assert_array_equal(loaded[idx], tensors[idx])


def test_load_applies_rounding(tmp_path, tiny_cfg):
    tensors = wio.synth_reference_tensors(tiny_cfg, seed=3)
    wio.save_reference_weights(tensors, tmp_path, tiny_cfg)
    loaded = wio.load_reference_tensors(tmp_path, tiny_cfg, round_to_6dp=True)
    for idx in tensors:
        np.testing.assert_array_equal(loaded[idx], wio.round6(tensors[idx]))


def test_missing_file_raises_without_synth(tmp_path, tiny_cfg):
    tensors = wio.synth_reference_tensors(tiny_cfg, seed=3)
    del tensors[1]
    wio.save_reference_weights(tensors, tmp_path, tiny_cfg)
    with pytest.raises(FileNotFoundError):
        wio.load_reference_tensors(tmp_path, tiny_cfg)


def test_missing_file_synthesized_when_allowed(tmp_path, tiny_cfg):
    tensors = wio.synth_reference_tensors(tiny_cfg, seed=3)
    del tensors[1]
    wio.save_reference_weights(tensors, tmp_path, tiny_cfg)
    loaded = wio.load_reference_tensors(tmp_path, tiny_cfg, allow_synth=True)
    assert loaded[1].shape == (
        tiny_cfg.embed_dim, tiny_cfg.in_channels, tiny_cfg.patch_size, tiny_cfg.patch_size
    )


def test_params_repack_shapes(tiny_cfg):
    params = wio.params_from_tensors(
        wio.synth_reference_tensors(tiny_cfg, seed=0), tiny_cfg
    )
    d, f, L = tiny_cfg.embed_dim, tiny_cfg.mlp_dim, tiny_cfg.depth
    assert params["patch_embed"]["kernel"].shape == (tiny_cfg.patch_dim, d)
    assert params["pos_embed"].shape == (tiny_cfg.seq_len, d)
    assert params["blocks"]["wqkv"].shape == (L, d, 3 * d)
    assert params["blocks"]["w1"].shape == (L, d, f)
    assert params["blocks"]["w2"].shape == (L, f, d)
    assert params["head"]["kernel"].shape == (d, tiny_cfg.num_classes)


def test_qkv_packing_order(tiny_cfg):
    # torchvision in_proj rows are Q/K/V blocks at offsets 0/D/2D
    # (ViT_seq.c:137-141); the repack transposes AND reorders columns to
    # (head, {q,k,v}, head_dim) blocks for clean tensor-parallel sharding.
    tensors = wio.synth_reference_tensors(tiny_cfg, seed=0)
    d, hd = tiny_cfg.embed_dim, tiny_cfg.head_dim
    in_proj = tensors[6]  # layer 0 in_proj_weight, [3D, D]
    bias = tensors[7]
    params = wio.params_from_tensors(tensors, tiny_cfg)
    wqkv = params["blocks"]["wqkv"][0]
    bqkv = params["blocks"]["bqkv"][0]
    for h in range(tiny_cfg.num_heads):
        base = h * 3 * hd
        for i, off in enumerate((0, d, 2 * d)):  # q, k, v torchvision rows
            tv_rows = in_proj[off + h * hd : off + (h + 1) * hd]
            np.testing.assert_array_equal(
                wqkv[:, base + i * hd : base + (i + 1) * hd], tv_rows.T
            )
            np.testing.assert_array_equal(
                bqkv[base + i * hd : base + (i + 1) * hd],
                bias[off + h * hd : off + (h + 1) * hd],
            )


@pytest.mark.skipif(
    not REFERENCE_NETWORK_DIR.exists(), reason="reference checkpoint not mounted"
)
def test_real_reference_checkpoint_loads():
    # The snapshot strips 37 large blobs; allow_synth fills those, every
    # present file must parse into its documented shape.
    params = wio.load_reference_weights(
        REFERENCE_NETWORK_DIR, VIT_B_16, allow_synth=True
    )
    assert params["pos_embed"].shape == (197, 768)
    assert params["head"]["kernel"].shape == (768, 1000)
    assert params["blocks"]["wqkv"].shape == (12, 768, 2304)
    # class_token from the real file should be non-trivial
    assert np.abs(params["cls_token"]).sum() > 0


def test_params_to_tensors_roundtrip(tiny_cfg):
    # params -> tensors must invert tensors -> params bit-exactly
    tensors = wio.synth_reference_tensors(tiny_cfg, seed=9)
    params = wio.params_from_tensors(tensors, tiny_cfg)
    back = wio.tensors_from_params(params, tiny_cfg)
    assert set(back) == set(tensors)
    for idx in tensors:
        np.testing.assert_array_equal(back[idx], tensors[idx],
                                      err_msg=f"tensor {idx}")
