"""Pipeline parallelism over the stacked-layer axis (GPipe-style).

The model stacks its encoder layers on a leading axis and scans them
(models/vit.py) — docs/parity.md calls this the natural pipeline seam.
This module makes it real: the layer stack shards over a 'pp' mesh axis
(L/P layers per stage), the batch splits into microbatches, and activations
flow stage-to-stage with ``ppermute`` in the classic M+P-1-step schedule:
at step t, stage p runs microbatch t-p (idle steps compute masked garbage —
the usual pipeline bubble).

Embeddings, final LN, and the head are replicated (they are a rounding
error of the FLOPs); logits are psum-broadcast from the last stage.  The
reference has no analog (single-device, SURVEY.md §2.3 documents PP as
absent); this is the pod-scale extension path, validated on the virtual
CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vit_tpu.config import ViTConfig
from vit_tpu.models import vit
from vit_tpu.ops import reference
from vit_tpu.ops.dispatch import REFERENCE_OPS


def pp_param_pspecs(params, axis_names=("pp",)) -> dict:
    """PartitionSpecs: block stack sharded over 'pp' on the layer axis.
    When ``axis_names`` also contains 'tp', the per-layer weights compose
    the Megatron tensor-parallel rules (parallel/sharding.py) on their
    remaining axes — the full 3D (dp x pp x tp) placement.  Embeddings,
    final LN, and head stay replicated."""
    from vit_tpu.parallel.sharding import param_pspecs

    specs = param_pspecs(axis_names, params)
    specs["blocks"] = {
        k: P("pp", *tuple(v)[1:]) for k, v in specs["blocks"].items()
    }
    return specs


def shard_forward_pp(
    cfg: ViTConfig,
    mesh: Mesh,
    num_microbatches: int,
    gelu_variant: str = "exact",
    ops_name: str = "xla",
    use_dropout: bool = False,
):
    """Build ``forward(params, images) -> logits`` pipelined over 'pp'.

    ``use_dropout=True`` (xla / fused_train, no 'tp' axis) returns
    ``forward(params, images, dropout_rng)`` instead: dropout +
    stochastic depth run INSIDE the pipelined stages.  The per-layer
    seeds and drop-path rates are precomputed as (depth,)-arrays and
    sharded over 'pp' alongside the block stack, so every stage sees its
    layers' ABSOLUTE indices (the linear drop-path schedule and the
    counter-hash masks survive pipelining).  At pp=1, microbatches=1 the
    masks are BIT-IDENTICAL to the plain dp path's (same derivation as
    models/vit.forward); with multiple microbatches each microbatch's
    seed is decorrelated (same hash-stream trick as the in-kernel masks).

    Params must be placed with :func:`pp_param_pspecs` shardings;
    ``num_microbatches`` must divide the per-dp-shard batch.  The per-stage body is a lax.scan
    over the local layers with either the jnp ops (``ops_name='xla'``,
    differentiable — training), the fused Pallas megakernels
    (``ops_name='fused'`` — inference), or the differentiable fused block
    (``ops_name='fused_train'`` — Pallas forward + hand-written backward
    kernels; jax.grad transposes the schedule through the custom VJP).

    Composes with the other mesh axes for full 3D parallelism:

      - 'dp' in the mesh: the batch shards over it (params replicate).
      - 'tp' in the mesh (fused/fused_train/quant only): each stage's body
        is the tensor-parallel fused block (parallel/tp_forward.py) —
        local-head attention kernels with psum-completed out_proj/MLP —
        so every layer runs pp-staged AND head/MLP-hidden-sharded.
        Place params with ``pp_param_pspecs(params, mesh.axis_names)``.
    """
    if "pp" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'pp' axis")
    use_tp = "tp" in mesh.axis_names
    if use_dropout and (use_tp or ops_name not in ("xla", "fused_train")):
        raise ValueError(
            "pp dropout/drop-path needs ops 'xla' or 'fused_train' on a "
            "mesh without 'tp' (the tensor-parallel fused block has no "
            "regularized train variant)"
        )
    if ops_name not in (("fused", "fused_train", "quant") if use_tp
                        else ("xla", "fused", "fused_train")):
        raise ValueError(
            f"pp ops {ops_name!r} not supported on mesh axes {mesh.axis_names} "
            "(tp composition needs 'fused'/'fused_train'/'quant'; without a "
            "'tp' axis use 'xla'/'fused'/'fused_train')"
        )
    n_stages = mesh.shape["pp"]
    if cfg.depth % n_stages:
        raise ValueError(f"pp={n_stages} must divide depth={cfg.depth}")
    if use_tp:
        tp = mesh.shape["tp"]
        if cfg.num_heads % tp:
            raise ValueError(f"tp={tp} must divide num_heads={cfg.num_heads}")
        if cfg.mlp_dim % tp:
            raise ValueError(f"tp={tp} must divide mlp_dim={cfg.mlp_dim}")
        heads_local = cfg.num_heads // tp
    m = num_microbatches
    batch_spec = P("dp") if "dp" in mesh.axis_names else P()

    dp_size = mesh.shape.get("dp", 1)

    def local_fn(params, images, *reg):
        b = images.shape[0]
        if b % m:
            raise ValueError(
                f"num_microbatches {m} must divide the per-dp-shard "
                f"batch {b}"
            )
        compute_dtype = params["pos_embed"].dtype
        x = images.astype(compute_dtype)
        x = reference.patch_embed(
            x, params["patch_embed"]["kernel"], params["patch_embed"]["bias"],
            cfg.patch_size,
        )
        x = reference.add_cls_and_pos(
            x, vit.prefix_tokens(params), params["pos_embed"]
        )
        if use_dropout:
            layer_seed, rates_l, k_pos_data = reg
            if cfg.dropout > 0:
                # torchvision's input+pos_embedding site, before staging
                # (replicated compute like the embeddings themselves)
                k_pos = jax.random.wrap_key_data(k_pos_data)
                if dp_size > 1:  # decorrelate masks across dp shards
                    k_pos = jax.random.fold_in(
                        k_pos, jax.lax.axis_index("dp")
                    )
                x = vit._dropout(x, cfg.dropout, k_pos)
        t_len, d = x.shape[-2], x.shape[-1]
        xmb = x.reshape(m, b // m, t_len, d)

        stage = jax.lax.axis_index("pp")
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        if use_tp:
            from vit_tpu.ops.pallas import interpret_default
            from vit_tpu.parallel.tp_forward import fused_block_tp

            interp = interpret_default()
            quant = ops_name == "quant"

            def run_stage(x_mb, mb):
                mb_b = x_mb.shape[0]

                def body(c, blk):
                    return (
                        fused_block_tp(
                            c, blk, heads_local, t_len, cfg.layernorm_eps,
                            gelu_variant, "tp", quant, interp,
                        ),
                        None,
                    )

                x2, _ = jax.lax.scan(
                    body, x_mb.reshape(mb_b * t_len, d), params["blocks"]
                )
                return x2.reshape(mb_b, t_len, d)

        elif use_dropout and ops_name == "fused_train":
            from vit_tpu.ops.pallas.trainable import encoder_block_train

            def run_stage(x_mb, mb):
                mb_b = x_mb.shape[0]
                # decorrelate the hash streams across microbatches / dp
                # shards (same-position rows would otherwise share masks);
                # statically zero when there is only one, so pp=1 m=1 is
                # bit-identical to the plain dp path
                off = jnp.uint32(0)
                if m > 1:
                    off = mb.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                if dp_size > 1:
                    off = off + (
                        jax.lax.axis_index("dp").astype(jnp.uint32)
                        * jnp.uint32(0x85EBCA6B)
                    )

                def body(c, xs):
                    blk, seed, rate = xs
                    return (
                        encoder_block_train(
                            c, blk, cfg.num_heads, t_len, cfg.layernorm_eps,
                            gelu_variant, seed + off, cfg.dropout, rate,
                        ),
                        None,
                    )

                x2, _ = jax.lax.scan(
                    body, x_mb.reshape(mb_b * t_len, d),
                    (params["blocks"], layer_seed, rates_l),
                )
                return x2.reshape(mb_b, t_len, d)

        elif ops_name in ("fused", "fused_train"):
            if ops_name == "fused":
                from vit_tpu.ops.pallas.fused_block import fused_encoder_block as blk_fn
            else:
                from vit_tpu.ops.pallas.trainable import (
                    encoder_block_trainable as blk_fn,
                )

            def run_stage(x_mb, mb):
                mb_b = x_mb.shape[0]

                def body(c, blk):
                    return (
                        blk_fn(
                            c, blk, cfg.num_heads, t_len, cfg.layernorm_eps,
                            gelu_variant,
                        ),
                        None,
                    )

                x2, _ = jax.lax.scan(
                    body, x_mb.reshape(mb_b * t_len, d), params["blocks"]
                )
                return x2.reshape(mb_b, t_len, d)

        elif use_dropout:

            def run_stage(x_mb, mb):
                def body(c, xs):
                    blk, kd, rate = xs
                    key = jax.random.wrap_key_data(kd)
                    # fold-ins are skipped statically when the axis is
                    # trivial so pp=1 m=1 bit-matches the plain dp path
                    if m > 1:
                        key = jax.random.fold_in(key, mb)
                    if dp_size > 1:
                        key = jax.random.fold_in(
                            key, jax.lax.axis_index("dp")
                        )
                    return (
                        vit.encoder_block(
                            c, blk, cfg, REFERENCE_OPS, gelu_variant,
                            key, rate,
                        ),
                        None,
                    )

                out, _ = jax.lax.scan(
                    body, x_mb, (params["blocks"], layer_seed, rates_l)
                )
                return out

        else:

            def run_stage(x_mb, mb):
                def body(c, blk):
                    return (
                        vit.encoder_block(c, blk, cfg, REFERENCE_OPS, gelu_variant),
                        None,
                    )

                out, _ = jax.lax.scan(body, x_mb, params["blocks"])
                return out

        def step(carry, t):
            # lax.scan (not fori_loop) so the schedule is
            # reverse-differentiable — pipeline-parallel TRAINING falls out
            # of jax.grad through this forward (shard_map transposes the
            # ppermute and psums the replicated params' cotangents).
            buf, outputs = carry
            mb = t - stage  # microbatch this stage works on at step t
            valid = (mb >= 0) & (mb < m)
            # stage 0 reads fresh microbatches; later stages read the
            # ppermuted activation from their predecessor
            inp = jnp.where(
                stage == 0, xmb[jnp.clip(mb, 0, m - 1)], buf
            )
            out = run_stage(inp, jnp.clip(mb, 0, m - 1))
            # last stage banks its finished microbatch
            is_last = stage == n_stages - 1
            outputs = jax.lax.cond(
                valid & is_last,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, out, jnp.clip(mb, 0, m - 1), 0
                ),
                lambda o: o,
                outputs,
            )
            buf = jax.lax.ppermute(out, "pp", perm)
            return (buf, outputs), None

        buf0 = jnp.zeros((b // m, t_len, d), compute_dtype)
        outs0 = jnp.zeros((m, b // m, t_len, d), compute_dtype)
        (_, outputs), _ = jax.lax.scan(
            step, (buf0, outs0), jnp.arange(m + n_stages - 1)
        )

        # broadcast the last stage's result to every stage
        outputs = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outputs, jnp.zeros_like(outputs)),
            "pp",
        )
        x = outputs.reshape(b, t_len, d)
        x = reference.layer_norm(
            x, params["ln_final"]["scale"], params["ln_final"]["bias"],
            cfg.layernorm_eps,
        )
        return vit.apply_head(x, params)

    if use_dropout:

        def fn(params, images, dropout_rng):
            # same derivation order as models/vit.forward so pp=1 m=1
            # reproduces the plain dp path's masks bit-exactly
            if cfg.dropout > 0:
                dropout_rng, k_pos = jax.random.split(dropout_rng)
                k_pos_data = jax.random.key_data(k_pos)
            else:
                k_pos_data = jnp.zeros((2,), jnp.uint32)  # unused
            if ops_name == "fused_train":
                layer_seed = jax.random.bits(
                    dropout_rng, (cfg.depth,), jnp.uint32
                )
                seed_spec = P("pp")
            else:
                layer_seed = jax.random.key_data(
                    jax.random.split(dropout_rng, cfg.depth)
                )
                seed_spec = P("pp", None)
            rates = jnp.asarray(vit._dp_rates(cfg), jnp.float32)
            return jax.shard_map(
                local_fn,
                mesh=mesh,
                in_specs=(
                    pp_param_pspecs(params, mesh.axis_names), batch_spec,
                    seed_spec, P("pp"), P(),
                ),
                out_specs=batch_spec,
                check_vma=False,
            )(params, images, layer_seed, rates, k_pos_data)

        return fn

    def fn(params, images):
        # in_specs depend on the params structure, so the shard_map is
        # built per call (jit caches the traced result)
        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(pp_param_pspecs(params, mesh.axis_names), batch_spec),
            out_specs=batch_spec,
            check_vma=False,
        )(params, images)

    return fn


def make_pp_train_step(
    cfg: ViTConfig,
    optimizer,
    mesh: Mesh,
    num_microbatches: int,
    gelu_variant: str = "exact",
    ops_name: str = "xla",
    label_smoothing: float = 0.0,
    use_dropout: bool = False,
):
    """Pipeline-parallel training step: grads flow backward through the
    microbatched schedule (the scan's transpose runs the stages in reverse
    — the textbook 1F1B-ish backward fills the same bubbles).  Params stay
    layer-sharded over 'pp'; optimizer state shards likewise.

    ``ops_name='fused_train'`` runs each stage through the fused Pallas
    megakernels with the hand-written backward kernels (the custom VJP in
    ops/pallas/trainable.py); shard_map transposes the ppermute chain around
    them exactly as in the xla case.

    ``use_dropout=True`` adds a per-step rng argument — ``step(params,
    opt_state, images, labels, rng)`` — and runs dropout + stochastic
    depth inside the pipelined stages with absolute-layer seeds/rates
    (see :func:`shard_forward_pp`); the mask-regenerating backward
    kernels transpose through the schedule like the plain ones.
    """
    import optax

    from vit_tpu.runtime.trainer import (
        cross_entropy_loss,
        kernel_backward_compiler_options,
    )

    if ops_name in ("fused", "quant"):
        raise ValueError("pp training needs 'xla' or 'fused_train' (differentiable)")
    fwd = shard_forward_pp(
        cfg, mesh, num_microbatches, gelu_variant, ops_name,
        use_dropout=use_dropout,
    )

    if use_dropout:

        def loss_fn(params, images, labels, rng):
            return cross_entropy_loss(
                fwd(params, images, rng), labels, label_smoothing
            )

        def train_step(params, opt_state, images, labels, rng):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, images, labels, rng
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        jit_kwargs = {}
        if ops_name == "fused_train":
            opts = kernel_backward_compiler_options()
            if opts:
                jit_kwargs["compiler_options"] = opts
        return jax.jit(train_step, **jit_kwargs)

    def loss_fn(params, images, labels):
        return cross_entropy_loss(fwd(params, images), labels, label_smoothing)

    def train_step(params, opt_state, images, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # no donation: callers often place params with device_put, which can
    # alias the source arrays when shardings already match — donating would
    # delete the caller's buffers
    jit_kwargs = {}
    if ops_name == "fused_train":
        opts = kernel_backward_compiler_options()
        if opts:
            jit_kwargs["compiler_options"] = opts
    return jax.jit(train_step, **jit_kwargs)
