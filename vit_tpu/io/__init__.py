"""I/O layer: weight / image / label loaders (replaces Network.c + the
imagenet_label table in Main.c:14-16 — SURVEY.md §1 L4).

A native C++ fast path (``vit_tpu.io.native`` -> native/vitio.cpp) mirrors the
reference's native loaders; the NumPy implementations here are the portable
fallback and the semantic spec.
"""

from vit_tpu.io.weights import (
    WEIGHTS_PER_LAYER,
    load_reference_weights,
    params_from_tensors,
    reference_tensor_specs,
    save_reference_weights,
    synth_reference_tensors,
)
from vit_tpu.io.dataset import BinShardDataset, ImageFolderDataset
from vit_tpu.io.images import load_image_bin, save_image_bin, synth_images

__all__ = [
    "BinShardDataset",
    "ImageFolderDataset",
    "WEIGHTS_PER_LAYER",
    "load_reference_weights",
    "params_from_tensors",
    "reference_tensor_specs",
    "save_reference_weights",
    "synth_reference_tensors",
    "load_image_bin",
    "save_image_bin",
    "synth_images",
]
