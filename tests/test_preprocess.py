"""Real-image preprocessing (io/preprocess.py): torchvision eval-transform
semantics (resize shorter side -> center crop -> ImageNet normalize) and the
CLI --images path.  The reference consumes only pre-preprocessed blobs
(Network.c:24-97); this layer is what produced them."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from vit_tpu.io.preprocess import (  # noqa: E402
    IMAGENET_MEAN,
    IMAGENET_STD,
    PreprocessError,
    collect_image_paths,
    load_and_preprocess,
    preprocess_image,
)


def test_constant_image_normalizes_exactly():
    arr = np.full((100, 100, 3), 128, np.uint8)
    out = preprocess_image(arr, image_size=64)
    assert out.shape == (3, 64, 64) and out.dtype == np.float32
    want = (128 / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    for c in range(3):
        np.testing.assert_allclose(out[c], want[c], atol=1e-6)


def test_shorter_side_resize_and_center_crop():
    # 200x100 (w x h): shorter side is h -> resized to resize_size; the
    # center crop must come from the horizontal middle.  Paint the middle
    # half white, the flanks black: the crop sees only white.
    arr = np.zeros((100, 200, 3), np.uint8)
    arr[:, 50:150] = 255
    out = preprocess_image(arr, image_size=64, resize_size=72)
    white = (1.0 - IMAGENET_MEAN) / IMAGENET_STD
    for c in range(3):
        np.testing.assert_allclose(out[c], white[c], atol=1e-5)


def test_identity_size_is_pure_crop():
    # already resize_size x resize_size: resize is identity, crop is the
    # exact center window
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (72, 72, 3), np.uint8).astype(np.uint8)
    out = preprocess_image(arr, image_size=64, resize_size=72)
    manual = arr[4:68, 4:68].astype(np.float32) / 255.0
    manual = (manual - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, manual.transpose(2, 0, 1), atol=1e-6)


def test_train_mode_keeps_full_frame():
    """mode='train' must preserve border content the eval center crop
    discards (the on-device RandomResizedCrop samples from the whole
    frame)."""
    arr = np.zeros((200, 400, 3), np.uint8)  # wide: eval crops the flanks
    arr[:, :40] = 255  # white left border
    ev = preprocess_image(arr, image_size=64, mode="eval")
    tr = preprocess_image(arr, image_size=64, mode="train")
    white = ((1.0 - IMAGENET_MEAN) / IMAGENET_STD)[0]
    assert abs(float(ev[0].max()) - white) > 0.1  # border gone in eval
    assert abs(float(tr[0, :, 0].mean()) - white) < 0.1  # kept in train
    with pytest.raises(ValueError, match="mode"):
        preprocess_image(arr, 64, mode="banana")


def test_grayscale_and_rgba_convert():
    g = Image.fromarray(np.full((80, 80), 200, np.uint8), "L")
    out = preprocess_image(g, image_size=64)
    assert out.shape == (3, 64, 64)
    rgba = Image.fromarray(
        np.full((80, 80, 4), 200, np.uint8), "RGBA"
    )
    out2 = preprocess_image(rgba, image_size=64)
    np.testing.assert_allclose(out, out2, atol=1e-6)


def test_collect_paths_dir_and_files(tmp_path):
    for name in ("b.png", "a.jpg", "notes.txt"):
        (tmp_path / name).write_bytes(b"x")
    paths = collect_image_paths([str(tmp_path)])
    assert [p.name for p in paths] == ["a.jpg", "b.png"]  # sorted, filtered
    # explicit file args pass through even with odd extensions
    paths2 = collect_image_paths([str(tmp_path / "notes.txt")])
    assert paths2[0].name == "notes.txt"
    with pytest.raises(FileNotFoundError):
        collect_image_paths([str(tmp_path / "missing.png")])
    with pytest.raises(PreprocessError, match="no image files"):
        collect_image_paths([])


def test_load_and_preprocess_batch(tmp_path, tiny_cfg):
    rng = np.random.default_rng(1)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 256, (50, 40, 3), np.uint8).astype(np.uint8)
        ).save(tmp_path / f"img{i}.png")
    batch, names = load_and_preprocess([str(tmp_path)], tiny_cfg)
    assert batch.shape == (3, 3, tiny_cfg.image_size, tiny_cfg.image_size)
    assert batch.dtype == np.float32 and np.isfinite(batch).all()
    assert all(n.endswith(f"img{i}.png") for i, n in enumerate(names))


def test_folder_dataset_layout(tmp_path):
    from vit_tpu.io.preprocess import folder_dataset

    rng = np.random.default_rng(3)
    for cls in ("dog", "cat"):  # sorted -> cat=0, dog=1
        (tmp_path / cls).mkdir()
        for i in range(2):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), np.uint8).astype(np.uint8)
            ).save(tmp_path / cls / f"{i}.png")
    paths, labels, names = folder_dataset(tmp_path)
    assert names == ["cat", "dog"]
    assert [p.parent.name for p in paths] == ["cat", "cat", "dog", "dog"]
    np.testing.assert_array_equal(labels, [0, 0, 1, 1])
    with pytest.raises(PreprocessError, match="class subdirectories"):
        folder_dataset(tmp_path / "cat")  # no subdirs inside


def test_eval_cli_image_dir(tmp_path, tiny_cfg, capsys, monkeypatch):
    import json

    import vit_tpu.config as config_mod
    from vit_tpu.cli.eval import main as eval_main
    from vit_tpu.io import weights as wio

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=1),
        tmp_path / "Network", tiny_cfg,
    )
    rng = np.random.default_rng(4)
    root = tmp_path / "val"
    for cls in ("a", "b", "c"):
        (root / cls).mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), np.uint8).astype(np.uint8)
            ).save(root / cls / f"{i}.png")
    rc = eval_main([
        "--config", "vit_tiny_test", "--weights", str(tmp_path / "Network"),
        "--image-dir", str(root), "--batch", "4", "--dtype", "float32",
        "--ops", "xla", "--json", "--no-compile-cache",
    ])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["n"] == 6
    assert 0.0 <= payload["top1"] <= 1.0


def test_image_folder_dataset_stream(tmp_path):
    from vit_tpu.io.dataset import ImageFolderDataset

    rng = np.random.default_rng(6)
    for cls in ("x", "y"):
        (tmp_path / cls).mkdir()
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), np.uint8).astype(np.uint8)
            ).save(tmp_path / cls / f"{i}.png")
    ds = ImageFolderDataset(tmp_path, image_size=32, threads=2)
    assert len(ds) == 6 and ds.has_labels
    np.testing.assert_array_equal(ds.labels(), [0, 0, 0, 1, 1, 1])
    batch = ds.read([0, 5])
    assert batch.shape == (2, 3, 32, 32) and batch.dtype == np.float32
    # epoch stream: one epoch covers every sample exactly once
    seen = []
    for imgs, labs in ds.batches(2, shuffle=True, seed=0, epochs=1):
        assert imgs.shape == (2, 3, 32, 32) and labs.shape == (2,)
        seen.extend(labs.tolist())
    assert sorted(seen) == [0, 0, 0, 1, 1, 1]


def test_train_cli_image_dir(tmp_path, tiny_cfg, capsys, monkeypatch):
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs 2 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rng = np.random.default_rng(7)
    root = tmp_path / "train"
    for cls in ("a", "b"):
        (root / cls).mkdir(parents=True)
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), np.uint8).astype(np.uint8)
            ).save(root / cls / f"{i}.png")
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "2", "--batch", "4",
        "--dp", "2", "--ops", "xla", "--image-dir", str(root),
        "--augment", "flip", "--no-compile-cache",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "raw images in 2 class folders" in out and "step    1" in out


def test_cli_images_flag(tmp_path, tiny_cfg, capsys, monkeypatch):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.main import main
    from vit_tpu.io import weights as wio

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=1),
        tmp_path / "Network", tiny_cfg,
    )
    rng = np.random.default_rng(2)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 256, (48, 48, 3), np.uint8).astype(np.uint8)
        ).save(tmp_path / f"photo{i}.jpg")
    rc = main([
        "--config", "vit_tiny_test", "--weights", str(tmp_path / "Network"),
        "--images", str(tmp_path / "photo0.jpg"), str(tmp_path / "photo1.jpg"),
        "--dtype", "float32", "--ops", "xla", "--batch-pad", "2",
        "--no-compile-cache",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "photo0.jpg" in out and "photo1.jpg" in out
    assert "label:" in out


def test_resize_and_crop_match_torchvision_formulas():
    """torchvision F.resize TRUNCATES the long side (int(size*long/short))
    and F.center_crop offsets with int(round(diff/2.0)) — both off-by-one
    traps vs the naive round()/floor (the bug class that makes outputs not
    bit-comparable with torchvision-preprocessed golden data)."""
    rng = np.random.default_rng(7)
    h, w = 13, 20  # int(16*20/13)=24 but round(24.615)=25
    arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    out = preprocess_image(arr, image_size=14, resize_size=16)
    img = Image.fromarray(arr).convert("RGB")
    new_w, new_h = int(16 * w / h), 16  # torchvision: truncate
    left = int(round((new_w - 14) / 2.0))
    top = int(round((new_h - 14) / 2.0))
    ref = img.resize((new_w, new_h), Image.Resampling.BILINEAR).crop(
        (left, top, left + 14, top + 14)
    )
    want = (np.asarray(ref, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, want.transpose(2, 0, 1), atol=1e-6)


def test_center_crop_offset_rounds_half_up_like_torchvision():
    """Odd diff with a .5 offset: torchvision computes
    int(round((29-14)/2.0)) = int(round(7.5)) = 8, not floor's 7."""
    h, w = 16, 29
    col = np.arange(w, dtype=np.uint8)[None, :, None].repeat(h, 0).repeat(3, 2)
    out = preprocess_image(col, image_size=14, resize_size=16)
    # resize is identity here (short side already 16, long int(16*29/16)=29)
    first_col_value = out[0, 0, 0] * IMAGENET_STD[0] + IMAGENET_MEAN[0]
    assert round(float(first_col_value) * 255) == 8  # crop starts at col 8


def test_train_mode_rejects_resize_size():
    """mode='train' stages the full frame; an explicit resize_size would
    be silently ignored — the guard must live here, not only one level up
    in dataset.py, so direct callers get the same error."""
    img = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(ValueError, match="eval-transform knob"):
        preprocess_image(img, image_size=4, resize_size=16, mode="train")
