"""Accuracy-eval utility tests."""

import numpy as np

from vit_tpu.eval.accuracy import evaluate
from vit_tpu.models import oracle
from vit_tpu.runtime import InferenceEngine


def test_accuracy_against_oracle_labels(tiny_cfg, tiny_params, tiny_images):
    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=4)
    want = oracle.probabilities(oracle.forward(tiny_params, tiny_images, tiny_cfg))
    labels = want.argmax(-1)
    report = evaluate(engine, tiny_images, labels)
    assert report.n == len(tiny_images)
    assert report.top1 == 1.0  # engine agrees with oracle's own argmax
    assert report.top5 == 1.0
    assert 0.0 < report.mean_top_prob <= 1.0


def test_accuracy_counts_misses(tiny_cfg, tiny_params, tiny_images):
    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=4)
    wrong = np.full(len(tiny_images), -1)  # impossible label
    report = evaluate(engine, tiny_images, wrong)
    assert report.top1 == 0.0 and report.top5 == 0.0


def test_accuracy_batched_equals_full(tiny_cfg, tiny_params, tiny_images):
    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=4)
    want = oracle.probabilities(oracle.forward(tiny_params, tiny_images, tiny_cfg))
    labels = want.argmax(-1)
    a = evaluate(engine, tiny_images, labels)
    b = evaluate(engine, tiny_images, labels, batch_size=2)
    assert a == b


def test_eval_cli_data_dir(tiny_cfg, tiny_params, tmp_path, monkeypatch,
                           capsys):
    """vit-tpu-eval over a labeled shard dir: oracle-argmax labels must
    score top-1 == 1.0 through the engine."""
    import json

    import vit_tpu.config as config_mod
    from vit_tpu.cli.eval import main as eval_main
    from vit_tpu.io import weights as wio
    from vit_tpu.io.images import save_image_bin, synth_images

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=1), tmp_path / "Network",
        tiny_cfg,
    )
    params = wio.load_reference_weights(tmp_path / "Network", tiny_cfg)
    imgs = synth_images(6, tiny_cfg, seed=3)
    labels = oracle.probabilities(
        oracle.forward(params, imgs, tiny_cfg)
    ).argmax(-1).astype("<i4")
    shards = tmp_path / "shards"
    shards.mkdir()
    save_image_bin(imgs[:4], shards / "a.bin")
    labels[:4].tofile(shards / "a.labels.bin")
    save_image_bin(imgs[4:], shards / "b.bin")
    labels[4:].tofile(shards / "b.labels.bin")

    rc = eval_main([
        "--config", "vit_tiny_test", "--weights", str(tmp_path / "Network"),
        "--data-dir", str(shards), "--dtype", "float32", "--batch", "4",
        "--json", "--no-compile-cache",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n"] == 6 and out["top1"] == 1.0 and out["top5"] == 1.0


def test_eval_cli_requires_labels(tmp_path):
    from vit_tpu.cli.eval import main as eval_main

    rc = eval_main(["--weights", str(tmp_path), "--input", "x.bin"])
    assert rc == 2
