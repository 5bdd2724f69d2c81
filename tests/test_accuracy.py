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
