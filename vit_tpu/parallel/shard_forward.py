"""shard_map integration: run Pallas-kernel forwards across a dp mesh.

GSPMD can partition the pure-jnp forward automatically, but ``pallas_call``
is a custom call XLA will not shard.  ``shard_map`` solves it the explicit
way: the batch is split over the 'dp' axis, params are replicated, and each
device runs the full single-chip kernel program on its shard — data-parallel
inference needs no collectives at all (the reference's only scale-out axis,
SURVEY.md §2.3).

Tensor-parallel kernel execution (splitting heads/MLP inside the kernels,
with psum epilogues) lives in vit_tpu.parallel.tp_forward; this module is
the collective-free dp-only fast path.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P


def shard_forward_dp(forward: Callable, mesh: Mesh) -> Callable:
    """Wrap ``forward(params, images) -> logits`` to run per-dp-shard.

    The mesh may have other axes (e.g. tp); params are replicated over all
    of them — only 'dp' is used, splitting the leading batch axis.
    """
    if "dp" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'dp' axis")

    replicated = P()
    batch_spec = P("dp")

    return jax.shard_map(
        forward,
        mesh=mesh,
        in_specs=(replicated, batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
