"""Runtime layer: jitted inference engine, trainer, profiler.

Replaces the reference's OpenCL runtime (context/queue/program lifecycle,
ViT_opencl.c:25-124) and its Main.c batch loop.  On TPU, XLA owns device
residency and stream ordering, so "runtime" here means: dtype policy, jit
cache management, batch padding, device placement/sharding, input prefetch,
and profiling — the parts a production serving stack still needs.
"""

from vit_tpu.runtime.engine import InferenceEngine
from vit_tpu.runtime.profiler import PhaseTimer, roofline
from vit_tpu.runtime.serving import (
    DeadlineExceededError,
    InferenceServer,
    ServerOverloadedError,
)

__all__ = [
    "InferenceEngine",
    "DeadlineExceededError",
    "InferenceServer",
    "ServerOverloadedError",
    "PhaseTimer",
    "roofline",
]
