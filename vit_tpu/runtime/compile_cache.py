"""Persistent XLA compilation cache wiring.

The reference JIT-compiles kernel.cl from source at every process start
(ViT_opencl.c:89-96) and pays that cost each run; the TPU analog is XLA's
persistent compilation cache, which amortizes jit compiles across processes
(critical here: each distinct program costs ~60-300 s through this
environment's remote-compile tunnel, docs/performance.md).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_DEFAULT_DIR = "~/.cache/vit_tpu/xla"


def enable_compilation_cache(path: Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at ``path``.

    Resolution order: explicit arg > $VIT_TPU_COMPILE_CACHE > ~/.cache.
    Safe to call before or after backend init (config keys only).  Returns
    the directory used.
    """
    import jax

    cache_dir = str(
        Path(path or os.environ.get("VIT_TPU_COMPILE_CACHE", _DEFAULT_DIR))
        .expanduser()
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the default min-entry-size/min-compile-time gates
    # would skip small-but-tunnel-expensive programs.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return cache_dir
