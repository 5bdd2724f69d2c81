"""Image batch I/O for the reference's ``input-100.bin`` format.

Replaces `load_image_data` (Network.c:24-97): the file is a 4 x int32
little-endian header ``(n, c, h, w)`` followed by ``n*c*h*w`` fp32 values in
NCHW order — images already preprocessed (resized/normalized) offline.  The
reference splits it into per-image copies (Network.c:66-93); we keep one
contiguous (N, C, H, W) array, which is what a batched TPU forward wants.

``input-100.bin`` is stripped from this snapshot (.MISSING_LARGE_BLOBS:1),
so a seeded synthetic generator fills in for tests/benchmarks.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from vit_tpu.config import VIT_B_16, ViTConfig

# torchvision ImageNet eval normalization (what produced input-100.bin's
# preprocessed floats upstream).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_image_bin(path) -> np.ndarray:
    """Read an input-100.bin-format file -> (N, C, H, W) float32."""
    path = Path(path)
    from vit_tpu.io import native

    if native.available():
        return native.read_image_bin(path)
    with open(path, "rb") as f:
        header = np.fromfile(f, dtype="<i4", count=4)
        if header.size != 4:
            raise ValueError(f"{path}: truncated header (Network.c:36-44 format)")
        n, c, h, w = (int(v) for v in header)
        if min(n, c, h, w) < 0:  # same gate as parse_image_bytes: a garbage
            # header must fail with the format message, not a numpy
            # negative-count/reshape error (count<0 means "read everything")
            raise ValueError(f"{path}: negative header field ({n}, {c}, {h}, {w})")
        data = np.fromfile(f, dtype="<f4", count=n * c * h * w)
    if data.size != n * c * h * w:
        raise ValueError(f"{path}: expected {n*c*h*w} fp32 values, got {data.size}")
    return data.reshape(n, c, h, w)


def parse_image_bytes(data: bytes) -> np.ndarray:
    """In-memory variant of load_image_bin (e.g. an HTTP request body in the
    serving daemon): same int32[4]-header + fp32-NCHW wire format."""
    # length-check BEFORE frombuffer: it raises its own generic errors
    # ("buffer is smaller than requested size" / "multiple of element
    # size") for short or ragged bodies, masking the format message
    if len(data) < 16:
        raise ValueError("truncated header (Network.c:36-44 format)")
    header = np.frombuffer(data, dtype="<i4", count=4)
    n, c, h, w = (int(v) for v in header)
    if min(n, c, h, w) < 0:
        raise ValueError(f"negative header field ({n}, {c}, {h}, {w})")
    want = n * c * h * w
    if len(data) - 16 != 4 * want:
        raise ValueError(
            f"expected {want} fp32 values ({4 * want} bytes), got "
            f"{len(data) - 16} bytes"
        )
    body = np.frombuffer(data, dtype="<f4", offset=16, count=want)
    return body.reshape(n, c, h, w).copy()


def save_image_bin(images: np.ndarray, path) -> None:
    """Write (N, C, H, W) float32 in the reference's binary format."""
    images = np.asarray(images, dtype="<f4")
    n, c, h, w = images.shape
    with open(path, "wb") as f:
        np.array([n, c, h, w], dtype="<i4").tofile(f)
        images.tofile(f)


def synth_images(
    n: int, cfg: ViTConfig = VIT_B_16, seed: int = 0
) -> np.ndarray:
    """Seeded synthetic batch with preprocessed-ImageNet-like statistics —
    stands in for the stripped input-100.bin."""
    rng = np.random.default_rng(seed)
    x = rng.normal(0.0, 1.0, (n, cfg.in_channels, cfg.image_size, cfg.image_size))
    return x.astype(np.float32)


def preprocess(raw_uint8: np.ndarray) -> np.ndarray:
    """torchvision-eval normalization of (N, H, W, C) uint8 [0,255] ->
    (N, C, H, W) float32 — for users feeding real images (the reference does
    this offline before writing input-100.bin)."""
    x = raw_uint8.astype(np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return np.ascontiguousarray(x.transpose(0, 3, 1, 2))
