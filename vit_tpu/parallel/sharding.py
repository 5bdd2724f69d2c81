"""Sharding rules for the ViT params pytree and activations.

Strategy (per SURVEY.md §2.3: DP is the reference's one natural scale-out
axis — its serial per-image loop — with TP-over-heads as the designed
extension of its per-head loop, ViT_opencl.c:546):

  - **dp**: batch axis of images/activations. Params replicated over dp.
  - **tp** (Megatron-style, over heads / MLP hidden):
      * wqkv (L, D, 3D) column-parallel on the packed output axis — the
        loader orders those columns (head, {q,k,v}, head_dim) so each tp
        shard owns whole heads.
      * wo (L, D, D) row-parallel on the input axis (each shard contributes
        a partial out_proj; XLA inserts the psum).
      * w1 (L, D, F) column-parallel, w2 (L, F, D) row-parallel.
      * LN params, embeddings, head: replicated.

Everything is expressed as ``NamedSharding(mesh, PartitionSpec(...))`` on the
pytree; ``jax.jit`` + XLA GSPMD propagate the shardings through the forward
and insert ICI collectives.  No hand-written NCCL/MPI equivalent exists or is
needed (the reference's only transport is PCIe staging, ViT_opencl.c:173).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _pspec(axis_names, *spec) -> P:
    # Drop axis names the mesh doesn't have (lets the same rules serve
    # dp-only or tp-only meshes).
    return P(*(s if s in axis_names else None for s in spec))


def param_pspecs(axis_names, params: Any) -> Any:
    """PartitionSpec pytree matching vit_tpu.models.vit's params layout
    (consumed raw by shard_map in_specs, or wrapped into NamedShardings by
    :func:`param_shardings`).

    Handles both the fp pytree and the quantized one (int8 weights carry
    ``*_scale`` companions, vit_tpu.ops.quant.quantize_params): per-channel
    scales shard with the output axis of their weight — wqkv/w1 scales over
    tp (column-parallel), w2 scale replicated (row-parallel output is full).
    """
    rep1 = _pspec(axis_names)  # fully replicated

    block_rules = {
        "ln1_scale": _pspec(axis_names, None, None),
        "ln1_bias": _pspec(axis_names, None, None),
        "wqkv": _pspec(axis_names, None, None, "tp"),   # column-parallel QKV
        "bqkv": _pspec(axis_names, None, "tp"),
        "wo": _pspec(axis_names, None, "tp", None),     # row-parallel out_proj
        "bo": _pspec(axis_names, None, None),
        "ln2_scale": _pspec(axis_names, None, None),
        "ln2_bias": _pspec(axis_names, None, None),
        "w1": _pspec(axis_names, None, None, "tp"),     # column-parallel MLP in
        "b1": _pspec(axis_names, None, "tp"),
        "w2": _pspec(axis_names, None, "tp", None),     # row-parallel MLP out
        "b2": _pspec(axis_names, None, None),
        # quantization scales (present only on the quantized pytree)
        "wqkv_scale": _pspec(axis_names, None, "tp"),
        "w1_scale": _pspec(axis_names, None, "tp"),
        "w2_scale": _pspec(axis_names, None, None),
    }
    present = {
        k: v for k, v in block_rules.items() if k in params.get("blocks", {})
    }
    out = {
        "cls_token": rep1,
        "patch_embed": {"kernel": rep1, "bias": rep1},
        "pos_embed": rep1,
        "blocks": present,
        "ln_final": {"scale": rep1, "bias": rep1},
    }
    if "head" in params:  # absent on MAE pretraining trees
        out["head"] = {"kernel": rep1, "bias": rep1}
    if "dist_token" in params:  # DeiT: replicated, like CLS/head
        out["dist_token"] = rep1
        out["head_dist"] = {"kernel": rep1, "bias": rep1}
    if "decoder" in params:
        # MAE decoder (models/mae.py): small (~26M for the default
        # 512x8) and pretraining-only — replicate rather than extend the
        # TP rules to a tree that never serves.
        out["decoder"] = jax.tree.map(lambda _: rep1, params["decoder"])
    return out


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree for the params (see :func:`param_pspecs`)."""
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_pspecs(mesh.axis_names, params),
        is_leaf=lambda x: isinstance(x, P),
    )


def zero1_pspec(spec: P, shape, axis_names, dp_size: int) -> P:
    """Extend a param leaf's PartitionSpec with ``'dp'`` on the largest
    still-unsharded, dp-divisible axis — the ZeRO-1 rule (Rajbhandari et
    al. 2019 §5.1) for optimizer-moment leaves.

    Params themselves stay replicated over dp (plain data parallelism);
    only the optimizer state (adam mu/nu, fp32 masters) shards, cutting
    its per-device HBM by ~dp×.  GSPMD then materializes the classic
    ZeRO dataflow for free: the dp grad all-reduce splits into a
    reduce-scatter into the sharded moment update plus an all-gather of
    the applied updates — both riding ICI.  Leaves with no dp-divisible
    free axis (or a 1-device dp axis) are left unchanged (replicated).
    """
    if "dp" not in axis_names or dp_size <= 1:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best, best_n = -1, 0
    for i, (s, n) in enumerate(zip(entries, shape)):
        if s is None and n % dp_size == 0 and n > best_n:
            best, best_n = i, n
    if best < 0:
        return spec
    entries[best] = "dp"
    return P(*entries)


def fsdp_param_shardings(mesh: Mesh, params: Any) -> Any:
    """Fully-sharded (ZeRO-3 / FSDP) param placement: every leaf's TP spec
    extends with 'dp' on its largest free, dp-divisible axis (the same
    rule as :func:`zero1_pspec`), so params, grads, AND optimizer state
    all shard over the data axis — per-device param HBM drops ~dp×.

    This is the GSPMD formulation of FSDP (as in t5x/maxtext): the jit
    forward/backward all-gathers each layer's weights just-in-time on ICI
    and reduce-scatters its grads; XLA overlaps both with compute.  Only
    the GSPMD op paths (xla/qat) can run under it — the shard_map kernel
    paths require whole local weights per device by construction.
    Leaves with no dp-divisible free axis (LN scales of odd size etc.)
    stay at their base rule (replicated or tp-sharded).
    """
    dp_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("dp", 1)
    specs = param_pspecs(mesh.axis_names, params)
    return jax.tree.map(
        lambda leaf, spec: NamedSharding(
            mesh, zero1_pspec(spec, leaf.shape, mesh.axis_names, dp_size)
        ),
        params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over dp; rest replicated."""
    return NamedSharding(mesh, _pspec(mesh.axis_names, *(["dp"] + [None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put the params pytree with the TP/replication rules."""
    return jax.device_put(params, param_shardings(mesh, params))
