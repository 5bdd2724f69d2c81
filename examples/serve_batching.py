#!/usr/bin/env python
"""Drive the dynamic-batching server in-process (what vit-tpu-serve wraps
in HTTP): submit concurrent variable-size requests, read futures, check
the latency SLOs the server tracks.

    python examples/serve_batching.py --cpu
    python examples/serve_batching.py --ops quant   # int8 path on TPU
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default="xla",
                    help="xla | fused | quant (the serving CLI defaults "
                    "to the fastest path for the backend)")
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import numpy as np

    from vit_tpu.config import VIT_B_16
    from vit_tpu.io import synth_images, weights as wio
    from vit_tpu.runtime import InferenceEngine
    from vit_tpu.runtime.serving import InferenceServer

    cfg = dataclasses.replace(
        VIT_B_16, depth=2, embed_dim=64, num_heads=4, image_size=32,
        patch_size=16, num_classes=7, name="vit_serve_example",
    )
    params = wio.params_from_tensors(wio.synth_reference_tensors(cfg, 1), cfg)
    engine = InferenceEngine(cfg, params, dtype="float32", ops=args.ops,
                             batch_pad=8)

    rng = np.random.default_rng(0)
    # `with` starts the dispatch loop and, on exit, drains FIFO — the same
    # path the HTTP daemon's SIGTERM handler uses (cli/serve.py).
    with InferenceServer(engine, max_batch=8, max_delay_ms=2.0) as server:
        futures = [
            server.submit(synth_images(int(n), cfg, seed=i))
            for i, n in enumerate(rng.integers(1, 5, args.requests))
        ]
        for i, fut in enumerate(futures):
            labels, top_probs, _ = fut.result(timeout=120)
            print(f"request {i}: {len(labels)} images -> labels {labels}")

    s = server.stats
    print(
        f"served {s.requests} requests / {s.images} images, "
        f"{s.images_per_batch:.1f} img/batch, "
        f"p50 {s.latency.quantile(0.5) * 1e3:.1f} ms / "
        f"p99 {s.latency.quantile(0.99) * 1e3:.1f} ms"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
