"""Parallelism layer: device mesh + sharding rules.

The reference is single-process, single-device, batch-1 (Main.c:45-46;
SURVEY.md §2.3 documents DP/TP/PP/SP/EP as absent, with the per-image loop as
the natural DP seam and the per-head loop as the TP seam).  This layer makes
those seams first-class the TPU way: a ``jax.sharding.Mesh`` with named axes,
``NamedSharding`` rules on the params pytree, and XLA-inserted collectives —
no hand-written communication (the scaling-book recipe).
"""

from vit_tpu.parallel.mesh import make_mesh, mesh_shape_for
from vit_tpu.parallel.sequence import shard_forward_sp
from vit_tpu.parallel.sharding import (
    batch_sharding,
    param_pspecs,
    param_shardings,
    replicate,
    shard_params,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "shard_forward_sp",
    "param_pspecs",
    "param_shardings",
    "batch_sharding",
    "replicate",
    "shard_params",
]
