"""Position-embedding interpolation for resolution transfer.

A ViT trained at 224px has a (197, D) position table; running it at 384px
needs (577, D).  torchvision's ``interpolate_embeddings`` solves this by
bicubic-resizing the patch-grid part of the table (the CLS row passes
through); this is the same operation (jax.image.resize), enabling the
BASELINE @384 configs to reuse the reference's @224 checkpoint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vit_tpu.config import ViTConfig


def interpolate_pos_embed(
    pos_embed: jax.Array, from_grid: int, to_grid: int, method: str = "bicubic"
) -> jax.Array:
    """(1 + from_grid^2, D) -> (1 + to_grid^2, D); CLS row untouched."""
    t, d = pos_embed.shape
    if t != 1 + from_grid * from_grid:
        raise ValueError(
            f"pos_embed has {t} rows, expected {1 + from_grid * from_grid} "
            f"(CLS + {from_grid}x{from_grid} grid)"
        )
    if from_grid == to_grid:
        return pos_embed
    cls_row = pos_embed[:1]
    grid = pos_embed[1:].reshape(from_grid, from_grid, d).astype(jnp.float32)
    resized = jax.image.resize(grid, (to_grid, to_grid, d), method=method)
    out = jnp.concatenate(
        [cls_row.astype(jnp.float32), resized.reshape(to_grid * to_grid, d)], axis=0
    )
    return out.astype(pos_embed.dtype)


def adapt_params_resolution(
    params, from_cfg: ViTConfig, to_cfg: ViTConfig, method: str = "bicubic"
):
    """Re-target a params pytree to a new image resolution (same patch size
    and everything else — only the position table changes)."""
    if (from_cfg.patch_size, from_cfg.embed_dim, from_cfg.depth) != (
        to_cfg.patch_size,
        to_cfg.embed_dim,
        to_cfg.depth,
    ):
        raise ValueError("resolution transfer requires matching architecture")
    out = dict(params)
    out["pos_embed"] = interpolate_pos_embed(
        jnp.asarray(params["pos_embed"]),
        from_cfg.grid_size,
        to_cfg.grid_size,
        method,
    )
    return out
