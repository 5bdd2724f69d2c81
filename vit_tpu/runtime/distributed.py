"""Multi-host (pod) initialization helper.

Single-host multi-chip needs nothing (jax.devices() sees all local chips);
TPU pods span hosts, and every host must call ``jax.distributed.initialize``
before first device use.  This wraps it with the standard TPU environment
conventions so the rest of the framework (mesh construction over
``jax.devices()``, which then includes remote chips) works unchanged.

The reference has no distributed anything (SURVEY.md §2.3); this is the
entry point that makes the dp/tp mesh layer span a pod.
"""

from __future__ import annotations

from typing import Optional

import jax

_initialized = False
_initialized_explicit = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX.  On TPU pods all arguments are discovered
    from the environment; pass them explicitly elsewhere.  Idempotent.

    When nothing is passed and no cluster can be detected (plain single
    process — e.g. local development or tests), this degrades to a no-op:
    ``jax.process_count()`` stays 1 and every multi-host code path runs in
    its single-process form."""
    global _initialized, _initialized_explicit
    explicit = bool(coordinator_address or num_processes or process_id is not None)
    if _initialized:
        if explicit and not _initialized_explicit and jax.process_count() == 1:
            # an earlier ARG-LESS call degraded to single-process and
            # latched; swallowing EXPLICIT cluster args now would leave
            # this host serving alone while its peers block in
            # jax.distributed.initialize forever.  (A repeated explicit
            # single-process init is fine — idempotent by contract.)
            raise RuntimeError(
                "distributed.initialize already ran (single-process); "
                "explicit cluster args came too late — call initialize "
                "with them before any other jax use"
            )
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # ValueError: no cluster detectable; RuntimeError: XLA backend
        # already initialized (single-process use after other jax calls).
        if explicit:
            raise  # explicit cluster args that don't work ARE an error
        # undetectable cluster + no args -> single process
    _initialized = True
    _initialized_explicit = explicit
