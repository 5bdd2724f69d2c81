"""vit_tpu — a TPU-native (JAX/XLA/Pallas) Vision Transformer framework.

Built from scratch with the capabilities of the reference C/OpenCL engine
(rlawhdrhs/Vision-Transformer-OpenCL): torchvision-layout ViT weight ingestion,
batched ImageNet classification, golden-file parity checking, and fused TPU
kernels replacing the reference's hand-written OpenCL kernels (kernel.cl).

Layer map (mirrors SURVEY.md §1):
  - ``vit_tpu.config``     — model hyperparameters  (replaces #define blocks,
                             ViT_seq.c:10-21 / ViT_opencl.c:12-23)
  - ``vit_tpu.ops``        — jnp reference ops + Pallas TPU kernels
                             (replaces ViT_seq.c ops + kernel.cl)
  - ``vit_tpu.models``     — functional ViT forward on a params pytree
                             (replaces ViT_seq.c:326-439 / ViT_opencl.c:785-883)
  - ``vit_tpu.io``         — weight/image/label loaders (replaces Network.c)
  - ``vit_tpu.parallel``   — mesh + sharding rules (DP/TP; the reference is
                             single-device, SURVEY.md §2.3)
  - ``vit_tpu.runtime``    — jitted inference engine, trainer, profiler
                             (replaces OpenCL runtime ViT_opencl.c:25-124 + Main.c loop)
  - ``vit_tpu.eval``       — comparator + golden-file parity (replaces comparator.c)
  - ``vit_tpu.cli``        — classification driver (replaces Main.c)
"""

from vit_tpu.version import __version__

__all__ = ["__version__"]
