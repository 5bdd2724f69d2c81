"""Ops layer: pure-jnp reference implementations + Pallas TPU kernels.

Replaces the reference's L1/L2 layers (SURVEY.md §1): the scalar CPU ops in
ViT_seq.c:25-324 (the correctness oracle) and the OpenCL kernels in
kernel.cl:1-549 with their host wrappers in ViT_opencl.c:126-729.

``vit_tpu.ops.reference`` is the obviously-correct jnp path; the kernels in
``vit_tpu.ops.pallas`` each carry a parity test against it.  ``dispatch``
selects between them, preserving the reference's dual-implementation
cross-check strategy (SURVEY.md §4).
"""

from vit_tpu.ops import reference
from vit_tpu.ops.dispatch import OpsImpl, get_ops

__all__ = ["reference", "OpsImpl", "get_ops"]
