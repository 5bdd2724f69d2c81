"""Sharded training dataset (io/dataset.py) + the native threaded gather
reader (native/vitio.cpp: vitio_gather_read).  Reads must be byte-identical
between the native and NumPy paths; the batch iterator must reshuffle per
epoch reproducibly."""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from vit_tpu.io import native
from vit_tpu.io.dataset import BinShardDataset
from vit_tpu.io.images import save_image_bin

REPO = Path(__file__).resolve().parents[1]


def _make_shards(tmp_path, counts=(5, 3, 7), shape=(3, 8, 8), labels=True):
    rng = np.random.default_rng(0)
    all_imgs, all_labs = [], []
    for i, n in enumerate(counts):
        imgs = rng.normal(size=(n, *shape)).astype(np.float32)
        save_image_bin(imgs, tmp_path / f"shard{i}.bin")
        all_imgs.append(imgs)
        if labels:
            labs = rng.integers(0, 11, n).astype("<i4")
            labs.tofile(tmp_path / f"shard{i}.labels.bin")
            all_labs.append(labs)
    return (
        np.concatenate(all_imgs),
        np.concatenate(all_labs) if labels else None,
    )


@pytest.fixture(scope="module")
def built_lib():
    if not native.gather_available():
        if shutil.which("make") and shutil.which("g++"):
            subprocess.run(["make", "-C", str(REPO / "native")], check=True)
            native._load_attempted = False
            native._lib = None
        if not native.gather_available():
            pytest.skip("native gather reader not built and no toolchain")


def test_index_and_sequential_read(tmp_path):
    imgs, labs = _make_shards(tmp_path)
    ds = BinShardDataset(tmp_path)
    assert len(ds) == 15 and ds.sample_shape == (3, 8, 8)
    np.testing.assert_array_equal(ds.read(range(15)), imgs)
    np.testing.assert_array_equal(ds.labels(), labs)


def test_scattered_read_crosses_shards(tmp_path):
    imgs, _ = _make_shards(tmp_path)
    ds = BinShardDataset(tmp_path)
    idx = [14, 0, 6, 5, 13, 2]  # out of order, all three shards
    np.testing.assert_array_equal(ds.read(idx), imgs[idx])


def test_native_gather_matches_numpy(tmp_path, built_lib, monkeypatch):
    imgs, _ = _make_shards(tmp_path)
    ds = BinShardDataset(tmp_path, threads=4)
    idx = np.random.default_rng(3).permutation(15)
    got_native = ds.read(idx)
    monkeypatch.setattr(native, "gather_available", lambda: False)
    got_numpy = BinShardDataset(tmp_path).read(idx)
    np.testing.assert_array_equal(got_native, got_numpy)
    np.testing.assert_array_equal(got_native, imgs[idx])


def test_native_gather_rejects_out_of_range_path_index(tmp_path, built_lib):
    # The C worker indexes paths[sample_path[i]] unchecked; the ctypes
    # wrapper must turn a corrupted/stale index into a Python ValueError
    # instead of an out-of-bounds read (io/native.py gather_read).
    _make_shards(tmp_path)
    ds = BinShardDataset(tmp_path)
    paths = [str(p) for p in ds.paths]
    for bad in (np.array([0, 99], np.int32), np.array([-1], np.int32)):
        with pytest.raises(ValueError, match="dataset index"):
            native.gather_read(
                paths, bad, np.zeros(len(bad), np.int64), sample_bytes=4
            )


def test_batches_shuffle_and_epoch_streams(tmp_path):
    imgs, labs = _make_shards(tmp_path)
    ds = BinShardDataset(tmp_path)
    it = ds.batches(4, shuffle=True, seed=7, epochs=2)
    batches = list(it)
    assert len(batches) == 6  # 2 epochs x floor(15/4)
    for xb, yb in batches:
        assert xb.shape == (4, 3, 8, 8) and yb.shape == (4,)
        # every (image, label) pair must be a real sample
        for x, y in zip(xb, yb):
            j = np.flatnonzero((imgs == x).all(axis=(1, 2, 3)))
            assert len(j) == 1 and labs[j[0]] == y
    # epoch 0 and epoch 1 use different permutations...
    e0 = np.concatenate([b[1] for b in batches[:3]])
    e1 = np.concatenate([b[1] for b in batches[3:]])
    assert not np.array_equal(e0, e1)
    # ...and the whole stream is reproducible from the seed
    again = list(ds.batches(4, shuffle=True, seed=7, epochs=2))
    for (xa, ya), (xb2, yb2) in zip(batches, again):
        np.testing.assert_array_equal(xa, xb2)
        np.testing.assert_array_equal(ya, yb2)


def test_shard_split_partitions_each_epoch(tmp_path):
    """shard=(i, n) host splits: union over hosts covers each epoch exactly
    once, disjointly (every host slices the SAME seed-determined perm)."""
    _, labs = _make_shards(tmp_path, counts=(6, 6))
    ds = BinShardDataset(tmp_path)
    seen = []
    for pid in range(2):
        for xb, yb in ds.batches(3, seed=5, epochs=1, shard=(pid, 2)):
            assert xb.shape == (3, 3, 8, 8)
            seen.append(yb)
    got = np.sort(np.concatenate(seen))
    np.testing.assert_array_equal(got, np.sort(labs))
    with pytest.raises(ValueError, match="shard"):
        next(ds.batches(2, shard=(2, 2)))


def test_shard_split_equal_lengths_with_ragged_count(tmp_path):
    """With len(ds) % n != 0, every host must see the SAME number of
    batches per epoch (slices truncate to len//n) or the hosts' epoch
    streams drift apart."""
    imgs = np.random.default_rng(4).normal(size=(7, 3, 8, 8)).astype(np.float32)
    save_image_bin(imgs, tmp_path / "s.bin")
    np.arange(7, dtype="<i4").tofile(tmp_path / "s.labels.bin")  # unique ids
    ds = BinShardDataset(tmp_path)
    per_host = [
        list(ds.batches(3, seed=2, epochs=2, shard=(pid, 2)))
        for pid in range(2)
    ]
    assert len(per_host[0]) == len(per_host[1]) == 2  # 1 batch/epoch each
    # within one epoch the two hosts' samples are disjoint
    e0 = np.concatenate([per_host[0][0][1], per_host[1][0][1]])
    assert len(set(e0.tolist())) == len(e0)


def test_train_cli_multihost_single_process(tiny_cfg, tmp_path, monkeypatch,
                                            capsys):
    """--multihost degenerates to single-process: the make_array global
    batch assembly and shard-split stream run for real on the CPU mesh."""
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rng = np.random.default_rng(2)
    imgs = rng.normal(
        size=(8, tiny_cfg.in_channels, tiny_cfg.image_size, tiny_cfg.image_size)
    ).astype(np.float32)
    save_image_bin(imgs, tmp_path / "s0.bin")
    rng.integers(0, tiny_cfg.num_classes, 8).astype("<i4").tofile(
        tmp_path / "s0.labels.bin"
    )
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "3", "--batch", "4",
        "--dp", "2", "--data-dir", str(tmp_path), "--ops", "xla",
        "--multihost", "--no-compile-cache",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "multihost: 1 host(s)" in out
    assert out.count("loss") >= 3


def test_train_cli_multihost_image_dir(tiny_cfg, tmp_path, monkeypatch,
                                       capsys):
    """--multihost with a raw-image folder: the ImageFolderDataset's
    EpochStream shard-split drives the global batch assembly."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rng = np.random.default_rng(3)
    for cls in ("a", "b"):
        (tmp_path / cls).mkdir()
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), np.uint8).astype(np.uint8)
            ).save(tmp_path / cls / f"{i}.png")
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "2", "--batch", "4",
        "--dp", "2", "--image-dir", str(tmp_path), "--ops", "xla",
        "--multihost", "--no-compile-cache",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "multihost: 1 host(s)" in out and out.count("loss") >= 2


def test_skip_batches_fast_forwards_resume(tmp_path):
    """batches(skip_batches=k) yields exactly the stream an uninterrupted
    run would see from batch k on — including across epoch boundaries —
    without reading the skipped data (the --resume fast-forward)."""
    _make_shards(tmp_path, counts=(5, 3, 7))  # 15 samples
    ds = BinShardDataset(tmp_path, require_labels=True)
    full = []
    it = ds.batches(4, shuffle=True, seed=9, epochs=3)  # 3 batches/epoch
    for imgs, labs in it:
        full.append((imgs, labs))
    assert len(full) == 9
    for k in (2, 3, 5):  # within epoch 0, exact boundary, inside epoch 1
        skipped = list(ds.batches(4, shuffle=True, seed=9, epochs=3,
                                  skip_batches=k))
        assert len(skipped) == 9 - k
        for (xi, yi), (xj, yj) in zip(skipped, full[k:]):
            np.testing.assert_array_equal(xi, xj)
            np.testing.assert_array_equal(yi, yj)


def test_train_cli_eval_every(tiny_cfg, tmp_path, monkeypatch, capsys):
    """--eval-data-dir/--eval-every: held-out top-1 printed mid-training
    and logged to the jsonl stream."""
    import json

    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rng = np.random.default_rng(2)
    for sub in ("train", "val"):
        d = tmp_path / sub
        d.mkdir()
        imgs = rng.normal(
            size=(8, tiny_cfg.in_channels, tiny_cfg.image_size,
                  tiny_cfg.image_size)
        ).astype(np.float32)
        save_image_bin(imgs, d / "s.bin")
        rng.integers(0, tiny_cfg.num_classes, 8).astype("<i4").tofile(
            d / "s.labels.bin"
        )
    log = tmp_path / "log.jsonl"
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "4", "--batch", "4",
        "--dp", "1", "--data-dir", str(tmp_path / "train"),
        "--eval-data-dir", str(tmp_path / "val"), "--eval-every", "2",
        "--eval-batches", "2", "--ops", "xla", "--ema-decay", "0.9",
        "--log-jsonl", str(log), "--no-compile-cache",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "eval: 8 held-out images every 2 steps" in out
    assert out.count("eval top-1") == 2 and "(ema)" in out
    evals = [json.loads(l) for l in log.read_text().splitlines()
             if "eval_top1" in l]
    assert len(evals) == 2 and all(0 <= e["eval_top1"] <= 1 for e in evals)


def test_validation_errors(tmp_path):
    _make_shards(tmp_path, counts=(4,), labels=False)
    with pytest.raises(FileNotFoundError, match="labels"):
        BinShardDataset(tmp_path, require_labels=True)
    ds = BinShardDataset(tmp_path)
    with pytest.raises(ValueError, match="no .labels.bin"):
        ds.labels()
    with pytest.raises(IndexError):
        ds.read([4])
    with pytest.raises(ValueError, match="batch_size"):
        next(ds.batches(5))
    # mismatched shard shapes rejected
    save_image_bin(np.zeros((2, 3, 4, 4), np.float32), tmp_path / "bad.bin")
    with pytest.raises(ValueError, match="shard shape"):
        BinShardDataset(tmp_path)
    with pytest.raises(FileNotFoundError):
        BinShardDataset(tmp_path / "nonexistent")


def test_train_cli_data_dir(tiny_cfg, tmp_path, monkeypatch, capsys):
    """End-to-end: vit-tpu-train streaming from --data-dir shards."""
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rng = np.random.default_rng(1)
    for i in range(2):
        imgs = rng.normal(
            size=(6, tiny_cfg.in_channels, tiny_cfg.image_size,
                  tiny_cfg.image_size)
        ).astype(np.float32)
        save_image_bin(imgs, tmp_path / f"s{i}.bin")
        rng.integers(0, tiny_cfg.num_classes, 6).astype("<i4").tofile(
            tmp_path / f"s{i}.labels.bin"
        )
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "4", "--batch", "4",
        "--dp", "2", "--data-dir", str(tmp_path), "--ops", "xla",
        "--no-compile-cache",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "data: 12 images in 2 shard(s)" in out
    assert out.count("loss") >= 4


def test_out_of_range_labels_rejected(tmp_path, tiny_cfg):
    """Labels outside [0, num_classes) must fail at LOAD: the training
    loss gathers with take_along_axis, which clamps silently on XLA."""
    rng = np.random.default_rng(3)
    imgs = rng.normal(size=(4, 3, tiny_cfg.image_size,
                            tiny_cfg.image_size)).astype(np.float32)
    save_image_bin(imgs, tmp_path / "s.bin")
    np.array([0, 1, tiny_cfg.num_classes, 2], "<i4").tofile(
        tmp_path / "s.labels.bin"
    )
    with pytest.raises(ValueError, match="labels outside"):
        BinShardDataset(tmp_path, require_labels=True,
                        num_classes=tiny_cfg.num_classes)
    # without the bound the same shard set loads (back-compat)
    BinShardDataset(tmp_path, require_labels=True)


def test_skip_batches_fast_forward_is_arithmetic(tmp_path):
    """Resume fast-forward across whole epochs must yield exactly the
    batches an uninterrupted run would see (and not regenerate a
    permutation per skipped epoch — whole epochs are index arithmetic)."""
    rng = np.random.default_rng(5)
    imgs = rng.normal(size=(10, 3, 8, 8)).astype(np.float32)
    save_image_bin(imgs, tmp_path / "s.bin")
    rng.integers(0, 5, 10).astype("<i4").tofile(tmp_path / "s.labels.bin")
    ds = BinShardDataset(tmp_path)
    full = list(ds.batches(batch_size=4, seed=9, epochs=4))  # 2/epoch
    skipped = list(ds.batches(batch_size=4, seed=9, epochs=4,
                              skip_batches=5))  # 2.5 epochs in
    assert len(skipped) == len(full) - 5
    for (xa, ya), (xb, yb) in zip(skipped, full[5:]):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_image_folder_train_mode_rejects_resize_size(tmp_path):
    from vit_tpu.io.dataset import ImageFolderDataset

    PIL = pytest.importorskip("PIL")
    from PIL import Image

    d = tmp_path / "cls0"
    d.mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(d / "a.png")
    with pytest.raises(ValueError, match="eval-transform knob"):
        ImageFolderDataset(tmp_path, 8, resize_size=16, mode="train")
