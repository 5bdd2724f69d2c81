"""Real-image preprocessing: JPEG/PNG files -> model-ready NCHW batches.

The reference consumes only the pre-preprocessed ``input-100.bin`` blob
(Network.c:24-97) — whoever produced it ran torchvision's eval transform
offline.  A complete framework closes that gap: this module implements the
torchvision ``vit_b_16`` eval transform (ImageClassification: resize the
shorter side to 256 with bilinear, center-crop 224, scale to [0,1],
normalize with the ImageNet mean/std) so raw image files classify
correctly against the reference's torchvision-trained weights.

Decode + resize happen on host via PIL (the one image codec in this
environment, import-gated); everything downstream is NumPy.  The mean/std
are the standard public ImageNet constants.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np

from vit_tpu.config import ViTConfig

# Standard ImageNet normalization (torchvision's eval transform).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

IMAGE_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".gif", ".webp"}


class PreprocessError(RuntimeError):
    pass


def _require_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError as e:  # pragma: no cover - PIL ships in this env
        raise PreprocessError(
            "real-image preprocessing needs Pillow (PIL); install it or "
            "preprocess offline into the input-100.bin format"
        ) from e


def preprocess_image(
    source,
    image_size: int,
    resize_size: int | None = None,
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
    mode: str = "eval",
) -> np.ndarray:
    """One image file / PIL image / HWC uint8 array -> (3, S, S) float32.

    ``mode='eval'`` (default) is torchvision eval semantics: shorter side
    -> ``resize_size`` (default ``image_size * 256 // 224``, i.e. 256 for
    the 224 models) with bilinear resampling, center crop ``image_size``,
    scale to [0, 1], channel-wise normalize.

    ``mode='train'`` resizes the FULL frame to (S, S) without cropping, so
    no border content is discarded on host — the on-device
    RandomResizedCrop (runtime/augment.py) then samples crop boxes from
    the whole image, with the aspect squash folded into the crop's random
    ratio range.
    """
    Image = _require_pil()
    if mode not in ("eval", "train"):
        raise ValueError(f"mode {mode!r}: need 'eval' or 'train'")
    if mode == "train" and resize_size is not None:
        # would otherwise be silently ignored (train stages the full frame)
        raise ValueError(
            "resize_size is an eval-transform knob; mode='train' "
            "stages the full frame at image_size (the on-device "
            "RandomResizedCrop does the cropping)"
        )
    if resize_size is None:
        resize_size = image_size * 256 // 224
    if isinstance(source, (str, os.PathLike)):
        img = Image.open(source)
    elif isinstance(source, np.ndarray):
        img = Image.fromarray(source)
    else:
        img = source
    img = img.convert("RGB")

    if mode == "train":
        img = img.resize((image_size, image_size), Image.Resampling.BILINEAR)
    else:
        w, h = img.size
        # torchvision semantics exactly (F.resize int-size path): the long
        # side TRUNCATES — int(size*long/short), not round — and the crop
        # offset is int(round(diff/2.0)) with Python banker's rounding;
        # either off-by-one shifts pixels vs torchvision-preprocessed data
        if w <= h:
            new_w, new_h = resize_size, int(resize_size * h / w)
        else:
            new_w, new_h = int(resize_size * w / h), resize_size
        img = img.resize((new_w, new_h), Image.Resampling.BILINEAR)

        left = int(round((new_w - image_size) / 2.0))
        top = int(round((new_h - image_size) / 2.0))
        if left < 0 or top < 0:
            raise PreprocessError(
                f"crop {image_size} exceeds resized image {new_w}x{new_h}"
            )
        img = img.crop((left, top, left + image_size, top + image_size))

    arr = np.asarray(img, np.float32) / 255.0  # (H, W, 3) in [0, 1]
    arr = (arr - mean) / std
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


def collect_image_paths(sources: Iterable[str]) -> list[Path]:
    """Expand files and directories (sorted, non-recursive) into image
    paths; unknown extensions in explicit file args still pass through."""
    out: list[Path] = []
    for s in sources:
        p = Path(s)
        if p.is_dir():
            out.extend(
                sorted(
                    q for q in p.iterdir()
                    if q.suffix.lower() in IMAGE_EXTENSIONS
                )
            )
        elif p.exists():
            out.append(p)
        else:
            raise FileNotFoundError(f"no such image file or directory: {s}")
    if not out:
        raise PreprocessError(f"no image files found under {list(sources)}")
    return out


def load_and_preprocess(
    sources: Sequence[str], cfg: ViTConfig, resize_size: int | None = None
) -> tuple[np.ndarray, list[str]]:
    """Files/dirs -> ((N, 3, S, S) float32 batch, per-row source names)."""
    paths = collect_image_paths(sources)
    batch = np.stack(
        [preprocess_image(p, cfg.image_size, resize_size) for p in paths]
    )
    return batch, [str(p) for p in paths]


def folder_dataset(root) -> tuple[list[Path], np.ndarray, list[str]]:
    """ImageNet-style folder-per-class layout (the torchvision ImageFolder
    convention): ``root/<class>/<image>``, classes indexed by the sorted
    subdirectory names.  Returns (paths, int32 labels, class names)."""
    root = Path(root)
    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    if not classes:
        raise PreprocessError(f"no class subdirectories under {root}")
    paths: list[Path] = []
    labels: list[int] = []
    for idx, name in enumerate(classes):
        files = sorted(
            q for q in (root / name).iterdir()
            if q.suffix.lower() in IMAGE_EXTENSIONS
        )
        paths.extend(files)
        labels.extend([idx] * len(files))
    if not paths:
        raise PreprocessError(f"no image files under {root}/<class>/")
    return paths, np.asarray(labels, np.int32), classes
