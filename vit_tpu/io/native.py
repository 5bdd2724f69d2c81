"""ctypes binding to the native C++ I/O library (native/vitio.cpp).

The reference's loaders are native C (Network.c, dirent.c); this framework's
equivalent is a small C++ library doing the bulk fp32 reads (with the
6-decimal rounding quirk, Network.c:186) off the Python heap path.  NumPy
remains the portable fallback when the shared library hasn't been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATHS = (
    Path(__file__).resolve().parents[2] / "native" / "libvitio.so",
    Path(__file__).resolve().parent / "libvitio.so",
)

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    for p in _LIB_PATHS:
        if p.exists():
            try:
                lib = ctypes.CDLL(str(p))
            except OSError:
                continue
            lib.vitio_file_size.restype = ctypes.c_longlong
            lib.vitio_file_size.argtypes = [ctypes.c_char_p]
            lib.vitio_read_fp32.restype = ctypes.c_longlong
            lib.vitio_read_fp32.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_longlong,
                ctypes.c_int,
            ]
            lib.vitio_read_image_bin_header.restype = ctypes.c_int
            lib.vitio_read_image_bin_header.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.vitio_read_image_bin_data.restype = ctypes.c_longlong
            lib.vitio_read_image_bin_data.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_longlong,
            ]
            if hasattr(lib, "vitio_gather_read"):  # older built .so may lack it
                lib.vitio_gather_read.restype = ctypes.c_longlong
                lib.vitio_gather_read.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_longlong,
                    ctypes.c_longlong,
                    ctypes.POINTER(ctypes.c_char),
                    ctypes.c_int,
                ]
            _lib = lib
            break
    return _lib


def available() -> bool:
    return _load() is not None


def gather_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "vitio_gather_read")


def gather_read(
    paths,
    sample_path: np.ndarray,
    sample_offset: np.ndarray,
    sample_bytes: int,
    threads: int = 8,
) -> np.ndarray:
    """Parallel gather of equal-size records scattered across ``paths``:
    record i comes from ``paths[sample_path[i]]`` at byte ``sample_offset[i]``.
    Returns a flat uint8 array of ``len(sample_path) * sample_bytes`` — the
    native threaded hot path of the training data loader (io/dataset.py)."""
    lib = _load()
    if lib is None or not hasattr(lib, "vitio_gather_read"):
        raise RuntimeError("native gather reader not built (make -C native)")
    sample_path = np.ascontiguousarray(sample_path, dtype=np.int32)
    sample_offset = np.ascontiguousarray(sample_offset, dtype=np.int64)
    n = len(sample_path)
    if len(sample_offset) != n:
        raise ValueError("sample_path and sample_offset length mismatch")
    # Range-check here, at the ctypes boundary: the C worker indexes
    # paths[sample_path[i]] unchecked, so a corrupted/stale dataset index
    # must fail as a Python exception, not an out-of-bounds read/segfault.
    if n and (sample_path.min() < 0 or sample_path.max() >= len(paths)):
        raise ValueError(
            f"sample_path indexes outside paths[0:{len(paths)}] "
            f"(min {sample_path.min()}, max {sample_path.max()}) — "
            "corrupted or stale dataset index?"
        )
    encoded = [str(p).encode() for p in paths]
    c_paths = (ctypes.c_char_p * len(encoded))(*encoded)
    out = np.empty(n * sample_bytes, dtype=np.uint8)
    got = lib.vitio_gather_read(
        c_paths,
        sample_path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sample_offset.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        sample_bytes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_char)),
        max(1, int(threads)),
    )
    if got != n:
        raise ValueError(f"gather read: {got}/{n} samples read")
    return out


def read_fp32(path, round_to_6dp: bool = True) -> np.ndarray:
    """Read a whole file of little-endian fp32, optionally applying the
    reference's 6-decimal rounding (Network.c:184-187) in C++."""
    lib = _load()
    if lib is None:  # not assert: must survive python -O
        raise RuntimeError("native vitio library not built (make -C native)")
    cpath = str(path).encode()
    nbytes = lib.vitio_file_size(cpath)
    if nbytes < 0:
        raise FileNotFoundError(path)
    count = nbytes // 4
    out = np.empty(count, dtype=np.float32)
    got = lib.vitio_read_fp32(
        cpath,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        count,
        1 if round_to_6dp else 0,
    )
    if got != count:
        raise ValueError(f"{path}: short read ({got}/{count} floats)")
    return out


def read_image_bin(path) -> np.ndarray:
    """Native read of the input-100.bin format -> (N, C, H, W) float32."""
    lib = _load()
    if lib is None:  # not assert: must survive python -O
        raise RuntimeError("native vitio library not built (make -C native)")
    import os

    if not os.path.exists(path):  # the C side returns the same -1 for
        raise FileNotFoundError(path)  # fopen failure and short reads
    cpath = str(path).encode()
    header = (ctypes.c_int * 4)()
    if lib.vitio_read_image_bin_header(cpath, header) != 0:
        raise ValueError(f"{path}: truncated header (Network.c:36-44 format)")
    n, c, h, w = header[0], header[1], header[2], header[3]
    if min(n, c, h, w) < 0:  # same gate as images.parse_image_bytes: fail
        # with the format message, not numpy's negative-dimension error
        raise ValueError(f"{path}: negative header field ({n}, {c}, {h}, {w})")
    out = np.empty(n * c * h * w, dtype=np.float32)
    got = lib.vitio_read_image_bin_data(
        cpath, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size
    )
    if got != out.size:
        raise ValueError(f"{path}: expected {out.size} fp32 values, got {got}")
    return out.reshape(n, c, h, w)
