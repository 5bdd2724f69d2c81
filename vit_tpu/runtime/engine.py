"""Batched inference engine.

Replaces the reference's driver loop + OpenCL runtime pairing
(Main.c:45-60 calling ViT_opencl per image with hand-managed device
buffers).  TPU-native shape: params live on HBM once (one ``device_put``,
vs the reference re-creating cl buffers per op call, ViT_opencl.c:133-141),
the whole forward is one jitted XLA program, inputs stream host→HBM
asynchronously, and batches are padded to a fixed shape so the jit cache
never fragments.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.config import ViTConfig
from vit_tpu.models import vit
from vit_tpu.ops import reference
from vit_tpu.ops.dispatch import get_ops
from vit_tpu.parallel import batch_sharding, param_shardings


class InferenceEngine:
    """Owns params residency, dtype policy, and the jitted forward.

    Args:
      cfg: model config.
      params: params pytree (numpy or jax arrays, fp32 from the loader).
      dtype: compute dtype for weights/activations ('bfloat16' for the fast
        path, 'float32' for the oracle-grade path).  Logits and softmax are
        always fp32.
      ops: 'xla' (pure-jnp) or 'pallas' (fused TPU kernels).
      mesh: optional jax.sharding.Mesh; batch is sharded over 'dp', params
        over 'tp' per vit_tpu.parallel.sharding.
      batch_pad: round batch sizes up to a multiple of this (one compiled
        program per padded size; avoids per-size recompiles).
      gelu_variant: 'exact' (reference CPU, erf) or 'tanh' (reference GPU).
    """

    def __init__(
        self,
        cfg: ViTConfig,
        params: Any,
        dtype: str = "bfloat16",
        ops: str = "xla",
        mesh=None,
        batch_pad: int = 32,
        gelu_variant: str = "exact",
        tome_r: int = 0,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.batch_pad = batch_pad
        self.compute_dtype = jnp.dtype(dtype)
        self._ops = get_ops(ops)
        self._gelu_variant = gelu_variant
        self.tome_r = int(tome_r)
        if self.tome_r:
            from vit_tpu.models import tome as tome_model

            self._tome_mod = tome_model
            tome_model.check_config(cfg, self.tome_r)  # r >= 0, T ceiling
            if ops not in ("fused", "xla", "quant"):
                raise ValueError(
                    "tome_r (token merging) supports ops='fused', 'quant', "
                    "or 'xla'"
                )
            if mesh is not None and mesh.shape.get("tp", 1) != 1:
                raise ValueError(
                    "tome_r shards data-parallel only (no tp): the merge "
                    "keeps whole tokens per device"
                )
        self._dp_shard_map = False
        self._tp_shard_map = False
        if mesh is not None and self._ops.name != "xla":
            # GSPMD partitions the jnp path automatically, but pallas_call
            # is a custom call XLA cannot shard.  Kernel paths go through
            # shard_map: dp-only meshes split the batch with params
            # replicated (no collectives); meshes with tp>1 additionally
            # split heads/MLP-hidden across 'tp' with psum epilogues
            # (parallel/tp_forward.py) — supported for the 'fused' and
            # 'quant' paths.
            if mesh.shape.get("tp", 1) == 1:
                self._dp_shard_map = True
            elif self._ops.name in ("fused", "quant"):
                if cfg.num_heads % mesh.shape["tp"] or cfg.mlp_dim % mesh.shape["tp"]:
                    raise ValueError(
                        f"tp={mesh.shape['tp']} must divide num_heads="
                        f"{cfg.num_heads} and mlp_dim={cfg.mlp_dim}"
                    )
                self._tp_shard_map = True
            else:
                raise ValueError(
                    f"ops={self._ops.name!r} shards data-parallel only "
                    "(the per-op pallas tier exists for kernel debugging, "
                    "not production); tensor-parallel meshes need "
                    "ops='xla' (GSPMD), 'fused', or 'quant' (shard_map "
                    "kernel TP)"
                )

        self.params = self._prepare_params(params)

        if self.tome_r:
            _tfn = {
                "fused": self._tome_mod.forward_fused,
                "quant": self._tome_mod.forward_quant,
                "xla": self._tome_mod.forward_xla,
            }[self._ops.name]
            r = self.tome_r

            def base_fwd(p, x, _fn=_tfn, _r=r):
                return _fn(p, x, cfg, _r, gelu_variant)
        else:
            base_fwd = vit.logits_fn(cfg, self._ops, gelu_variant=gelu_variant)

        jit_kwargs = {}
        if self._dp_shard_map:
            from vit_tpu.parallel.shard_forward import shard_forward_dp

            fwd = shard_forward_dp(base_fwd, mesh)
        elif self._tp_shard_map:
            from vit_tpu.parallel.tp_forward import shard_forward_tp

            # needs the PREPARED params: the quant path's in_specs cover
            # the int8 weights + scale leaves, not the loader pytree
            fwd = shard_forward_tp(
                cfg, mesh, self._ops.name, self.params, gelu_variant=gelu_variant
            )
        else:
            fwd = base_fwd
            if mesh is not None:
                jit_kwargs["in_shardings"] = (
                    param_shardings(mesh, self.params),
                    batch_sharding(mesh, 4),
                )
        # Consumers that wrap the forward in their OWN top-level jit
        # (serving.make_serve_fn) must trace the raw fn and re-apply any
        # per-compile options themselves: JAX rejects compiler_options on
        # a nested jit outright.
        self.forward_compiler_options = None
        if self.tome_r and self._ops.name in ("fused", "quant"):
            opts = self._tome_mod.fused_compiler_options()
            if opts:
                jit_kwargs["compiler_options"] = opts
                self.forward_compiler_options = opts
        self._forward_fn = fwd  # unjitted, for wrapping jits
        self._forward = jax.jit(fwd, **jit_kwargs)
        self._input_sharding = batch_sharding(mesh, 4) if mesh is not None else None

    def _prepare_params(self, params):
        """Loader-fresh fp32 pytree -> device-resident params under this
        engine's dtype/quantization policy and mesh placement."""
        params = jax.tree.map(jnp.asarray, params)
        if self._ops.name == "quant":
            from vit_tpu.ops import quant

            # quantize the big GEMM weights from full precision, then cast
            # the remaining fp leaves (int8 weights + fp32 scales untouched)
            params = quant.quantize_params(params)
            params = quant.cast_quantized_params(params, self.compute_dtype)
        else:
            params = vit.cast_params(params, self.compute_dtype)
        if self._dp_shard_map:
            from vit_tpu.parallel import replicate

            params = jax.device_put(params, replicate(self.mesh))
        elif self.mesh is not None:
            params = jax.device_put(params, param_shardings(self.mesh, params))
        else:
            params = jax.device_put(params)
        return params

    def swap_params(self, params) -> None:
        """Hot-swap the model weights in place (zero-downtime reload).

        ``params`` is a loader-fresh pytree for the SAME config; it goes
        through the engine's usual dtype/quantization/placement policy and
        then replaces ``self.params`` atomically.  Every compiled program
        (forward, features, attention probe) keys on shapes/dtypes only,
        so no recompile happens; calls already in flight complete with the
        old weights, later calls use the new ones.  The reference has no
        analog — its weights load once per process (Network.c:99-194)."""
        new = self._prepare_params(params)
        old = self.params
        if jax.tree.structure(new) != jax.tree.structure(old):
            raise ValueError(
                "swap_params: new checkpoint's pytree structure differs "
                "from the loaded model (wrong config or source?)"
            )
        mismatch = [
            f"{a.shape}/{a.dtype} vs {b.shape}/{b.dtype}"
            for a, b in zip(jax.tree.leaves(new), jax.tree.leaves(old))
            if a.shape != b.shape or a.dtype != b.dtype
        ]
        if mismatch:
            raise ValueError(
                "swap_params: new checkpoint's leaf shapes/dtypes differ "
                f"from the loaded model: {mismatch[:3]}"
            )
        self.params = new

    # -- core API ---------------------------------------------------------

    def logits(self, images) -> jax.Array:
        """(B, C, H, W) -> (B, num_classes) fp32 logits (unpadded)."""
        x, n = self._stage(images)
        out = self._forward(self.params, x)
        return out[:n]

    def probabilities(self, images) -> jax.Array:
        return reference.softmax(self.logits(images))

    def features(self, images) -> jax.Array:
        """(B, C, H, W) -> (B, D) final-LN CLS embeddings (transfer
        learning / retrieval vectors)."""
        if self.tome_r:
            # the feature probe runs the plain full-token forward; on a
            # merged engine it would come from a DIFFERENT model than the
            # classifications — refuse rather than silently diverge
            raise ValueError(
                "features() on a tome_r engine would use full tokens while "
                "classify() merges — build a tome_r=0 engine for embeddings"
            )
        if not hasattr(self, "_features_fn"):
            jit_kwargs = {}
            if self._dp_shard_map:
                from vit_tpu.parallel.shard_forward import shard_forward_dp

                fwd = shard_forward_dp(
                    vit.logits_fn(
                        self.cfg, self._ops, gelu_variant=self._gelu_variant,
                        return_features=True,
                    ),
                    self.mesh,
                )
            elif self._tp_shard_map:
                from vit_tpu.parallel.tp_forward import shard_forward_tp

                fwd = shard_forward_tp(
                    self.cfg, self.mesh, self._ops.name, self.params,
                    gelu_variant=self._gelu_variant, return_features=True,
                )
            else:
                fwd = vit.logits_fn(
                    self.cfg, self._ops, gelu_variant=self._gelu_variant,
                    return_features=True,
                )
                if self.mesh is not None:
                    # same explicit placement as the main forward (__init__)
                    jit_kwargs["in_shardings"] = (
                        param_shardings(self.mesh, self.params),
                        batch_sharding(self.mesh, 4),
                    )
            self._features_fn = jax.jit(fwd, **jit_kwargs)
        x, n = self._stage(images)
        return self._features_fn(self.params, x)[:n]

    def attention_maps(self, images, rollout: bool = False) -> jax.Array:
        """Interpretability probe: per-layer attention probabilities
        (depth, B, H, T, T) — or, with ``rollout``, the Abnar & Zuidema
        CLS->patch relevance (B, grid, grid).  Runs the jnp reference path
        (oracle-grade tool, not a throughput path); on a meshed engine the
        probe shards like the main forward (batch over dp, Megatron param
        rules via GSPMD) instead of gathering onto one device."""
        if self.tome_r:
            raise ValueError(
                "attention_maps() on a tome_r engine would probe the "
                "full-token model while classify() merges — build a "
                "tome_r=0 engine for interpretability"
            )
        if self._ops.name == "quant":
            raise ValueError(
                "attention_maps needs fp weights; build the engine with "
                "ops='xla'/'pallas'/'fused'"
            )
        if not hasattr(self, "_attn_fn"):
            def probe(params, x):
                probs = vit.attention_maps(
                    params, x, self.cfg, self._gelu_variant
                )
                return (
                    vit.attention_rollout(probs, self.cfg.num_prefix_tokens),
                    probs,
                )

            jit_kwargs = {}
            if self.mesh is not None:
                jit_kwargs["in_shardings"] = (
                    param_shardings(self.mesh, self.params),
                    batch_sharding(self.mesh, 4),
                )
            self._attn_fn = jax.jit(probe, **jit_kwargs)
        # grain=1: the (depth, B, H, T, T) probs buffer is O(B·T²) — padding
        # one probe image to a serving batch_pad would multiply it ~32x (and
        # OOM at @512's T=1025); meshed engines still pad to a dp multiple.
        x, n = self._stage(images, grain=1)
        roll, probs = self._attn_fn(self.params, x)
        if rollout:
            g = self.cfg.grid_size
            return roll[:n].reshape(n, g, g)
        return probs[:, :n]

    def classify(self, images) -> Tuple[np.ndarray, np.ndarray]:
        """-> (labels, top_probs), the reference driver's output quantities
        (argmax over probabilities, Main.c:62-69)."""
        probs = np.asarray(self.probabilities(images))
        labels = probs.argmax(-1)
        return labels, probs[np.arange(len(labels)), labels]

    # -- internals --------------------------------------------------------

    def _stage(self, images, grain: Optional[int] = None) -> Tuple[jax.Array, int]:
        """Staging: cast to compute dtype, pad batch to the padding grain,
        place with the dp sharding.  Device-resident inputs (jax.Array —
        e.g. a decode pipeline's output or the serving loop's staged
        payloads) are padded/cast on device, skipping the host round-trip.

        ``grain`` overrides the engine's padding grain (still lcm'd with dp
        on meshed engines) — one-off probes pass 1 so a single image isn't
        padded to a full serving batch."""
        on_device = isinstance(images, jax.Array)
        if not on_device:
            images = np.asarray(images)
        n = images.shape[0]
        grain = self.batch_pad if grain is None else grain
        if self.mesh is not None:
            grain = math.lcm(grain, self.mesh.shape.get("dp", 1))
        padded = max(grain, math.ceil(n / grain) * grain)
        if on_device:
            x = images.astype(self.compute_dtype)
            if padded != n:
                pad = jnp.zeros((padded - n, *x.shape[1:]), x.dtype)
                x = jnp.concatenate([x, pad], axis=0)
        else:
            if padded != n:
                pad = np.zeros((padded - n, *images.shape[1:]), images.dtype)
                images = np.concatenate([images, pad], axis=0)
            x = jnp.asarray(images, dtype=self.compute_dtype)
        if self._input_sharding is not None:
            x = jax.device_put(x, self._input_sharding)
        return x, n

    def phase_report(self, images, iters: int = 3) -> str:
        """Per-phase timing breakdown (patch embed, each encoder phase,
        head), the reference's per-encoder printf profiling done right
        (ViT_opencl.c:745-779 / PhaseTimer).  Runs the unfused op path so
        phases are separable; use bench.py for end-to-end numbers."""
        from vit_tpu.runtime.profiler import PhaseTimer

        R = reference  # local alias for the phase expressions below

        if self._ops.name == "quant":
            raise NotImplementedError(
                "phase_report needs separable fp ops; use ops='xla'/'pallas'/'fused'"
            )
        timer = PhaseTimer()
        cfg = self.cfg
        x, _ = self._stage(images)
        p = self.params

        def sync(v):
            jax.block_until_ready(v)
            return v

        for _ in range(iters):
            with timer.phase("patch_embed+pos"):
                h = sync(
                    R.add_cls_and_pos(
                        self._ops.patch_embed(
                            x, p["patch_embed"]["kernel"], p["patch_embed"]["bias"],
                            cfg.patch_size,
                        ),
                        p["cls_token"],
                        p["pos_embed"],
                    )
                )
            for l in range(cfg.depth):
                blk = jax.tree.map(lambda a: a[l], p["blocks"])
                with timer.phase("layer_norm_1"):
                    ln1 = sync(R.layer_norm(h, blk["ln1_scale"], blk["ln1_bias"],
                                            cfg.layernorm_eps))
                with timer.phase("attention"):
                    a = sync(self._ops.attention(
                        ln1, blk["wqkv"], blk["bqkv"], blk["wo"], blk["bo"],
                        cfg.num_heads,
                    ))
                h = h + a
                with timer.phase("layer_norm_2"):
                    ln2 = sync(R.layer_norm(h, blk["ln2_scale"], blk["ln2_bias"],
                                            cfg.layernorm_eps))
                with timer.phase("mlp"):
                    m = sync(self._ops.mlp(ln2, blk["w1"], blk["b1"], blk["w2"],
                                           blk["b2"]))
                h = h + m
            with timer.phase("final_ln+head"):
                hn = R.layer_norm(h, p["ln_final"]["scale"], p["ln_final"]["bias"],
                                  cfg.layernorm_eps)
                sync(R.linear(hn[..., 0, :], p["head"]["kernel"], p["head"]["bias"]))
        return timer.report()

    def compiled_text(self, batch: int) -> str:
        """Lowered-HLO dump of the engine's actual forward (same ops table,
        gelu variant, and shardings it executes with)."""
        shape = (batch, self.cfg.in_channels, self.cfg.image_size, self.cfg.image_size)
        args = (self.params, jax.ShapeDtypeStruct(shape, self.compute_dtype))
        return self._forward.lower(*args).as_text()

