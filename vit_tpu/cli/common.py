"""Shared CLI preamble helpers (config/ops/mesh resolution).

The classify/serve/eval drivers share the same three setup steps; the
copies had already diverged once (eval's mesh math crashed on --tp 3
over 8 devices while the siblings floored), so the logic lives here once.
"""

from __future__ import annotations

import dataclasses
import sys

from vit_tpu.config import get_config


def resolve_config(name: str, num_classes: int = 0):
    """Named config, with the --num-classes head-width override applied."""
    cfg = get_config(name)
    if num_classes:
        cfg = dataclasses.replace(cfg, num_classes=num_classes)
    return cfg


def resolve_compile_cache(args) -> None:
    """Honor --no-compile-cache; otherwise point JAX's persistent
    compilation cache at the standard directory (one place for all four
    drivers — the preamble had been copy-pasted into each)."""
    if not getattr(args, "no_compile_cache", False):
        from vit_tpu.runtime.compile_cache import enable_compilation_cache

        enable_compilation_cache()


def resolve_ops_name(ops: str) -> str:
    """'auto' -> the megakernel path on TPU, jnp ops elsewhere."""
    if ops != "auto":
        return ops
    import jax

    return "fused" if jax.default_backend() == "tpu" else "xla"


def resolve_mesh(dp: int, tp: int, out=None):
    """--dp/--tp flags -> Mesh, or None for the single-device default.

    Unset --dp floors the device count to a tp multiple, so e.g. --tp 3
    on an 8-device host uses 6 devices instead of erroring."""
    if not (tp > 1 or dp):
        return None
    import jax

    from vit_tpu.parallel import make_mesh, mesh_shape_for

    shape = mesh_shape_for(
        (dp or jax.device_count() // tp) * tp, tp=tp, dp=dp or None
    )
    mesh = make_mesh(shape, jax.devices()[: shape["dp"] * shape["tp"]])
    print(
        f"mesh: {shape} over {jax.device_count()} device(s)",
        file=out if out is not None else sys.stdout,
    )
    return mesh
