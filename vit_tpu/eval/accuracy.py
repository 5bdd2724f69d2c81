"""Accuracy evaluation: top-k over a labeled image set.

The reference's only accuracy artifact is the 100-line golden file; this
utility generalizes it: given images + ground-truth labels, report top-1 /
top-5 accuracy and mean top-prob, batched through an InferenceEngine.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class AccuracyReport:
    n: int
    top1: float
    top5: float
    mean_top_prob: float

    def as_dict(self) -> Dict[str, float]:
        return {
            "n": self.n,
            "top1": self.top1,
            "top5": self.top5,
            "mean_top_prob": self.mean_top_prob,
        }


def evaluate(
    engine,
    images,
    labels: Sequence[int],
    batch_size: Optional[int] = None,
) -> AccuracyReport:
    """Run ``engine`` over ``images`` and score against ``labels``."""
    labels = np.asarray(labels)
    n = len(labels)
    probs_all = []
    bs = batch_size or len(images)
    for i in range(0, n, bs):
        probs_all.append(np.asarray(engine.probabilities(images[i : i + bs])))
    probs = np.concatenate(probs_all, axis=0)[:n]
    top5_idx = np.argsort(probs, axis=-1)[:, -5:]
    top1_idx = top5_idx[:, -1]
    top1 = float((top1_idx == labels).mean())
    top5 = float((top5_idx == labels[:, None]).any(axis=-1).mean())
    mean_top = float(probs[np.arange(n), top1_idx].mean())
    return AccuracyReport(n=n, top1=top1, top5=top5, mean_top_prob=mean_top)
