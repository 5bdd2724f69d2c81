"""Position-embedding interpolation for resolution transfer.

A ViT trained at 224px has a (197, D) position table; running it at 384px
needs (577, D).  torchvision's ``interpolate_embeddings`` solves this by
bicubic-resizing the patch-grid part of the table (the CLS row passes
through).  This reimplements torch's bicubic EXACTLY — the Keys kernel
with a=-0.75, border replicate, align_corners=True by default (what
torchvision's ``interpolate_embeddings`` passes) — rather than calling
``jax.image.resize``, whose cubic kernel uses a=-0.5 and therefore drifts
off a torchvision-interpolated checkpoint.  Gated against
``torch.nn.functional.interpolate`` directly (tests/test_interpolate.py).
Enables the BASELINE @384 configs to reuse the reference's @224 checkpoint.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vit_tpu.config import ViTConfig


def _cubic_kernel(s: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel; a=-0.75 is torch's constant
    (jax.image.resize uses a=-0.5 — a different curve)."""
    s = np.abs(s)
    near = (a + 2.0) * s**3 - (a + 3.0) * s**2 + 1.0
    far = a * s**3 - 5.0 * a * s**2 + 8.0 * a * s - 4.0 * a
    return np.where(s <= 1.0, near, np.where(s < 2.0, far, 0.0))


def _bicubic_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) weights of torch F.interpolate(mode='bicubic') along
    one axis.  Border handling matches torch: taps clamp to the edge
    sample (accumulating weight into the clamped index == replicate)."""
    j = np.arange(n_out, dtype=np.float64)
    if align_corners:
        x = j * ((n_in - 1) / (n_out - 1)) if n_out > 1 else np.zeros_like(j)
    else:
        x = (j + 0.5) * (n_in / n_out) - 0.5
    x0 = np.floor(x)
    t = x - x0
    w = np.zeros((n_out, n_in), np.float64)
    for m in (-1, 0, 1, 2):
        idx = np.clip(x0 + m, 0, n_in - 1).astype(np.int64)
        np.add.at(w, (np.arange(n_out), idx), _cubic_kernel(t - m))
    return w


def bicubic_resize_grid(
    grid, to_hw: tuple, align_corners: bool = True
) -> jax.Array:
    """(H, W, D) -> (to_h, to_w, D), bit-matching torch bicubic."""
    h, w, _ = grid.shape
    th, tw = to_hw
    wh = jnp.asarray(_bicubic_matrix(h, th, align_corners), jnp.float32)
    ww = jnp.asarray(_bicubic_matrix(w, tw, align_corners), jnp.float32)
    g = jnp.asarray(grid, jnp.float32)
    # HIGHEST: this JAX build contracts fp32 at DEFAULT precision in bf16
    # on TPU, which would reintroduce exactly the ~2.6e-3 drift this
    # torch-exact path exists to eliminate (CLAUDE.md precision rule).
    hi = jax.lax.Precision.HIGHEST
    g = jnp.einsum("oh,hwd->owd", wh, g, precision=hi)
    return jnp.einsum("ow,hwd->hod", ww, g, precision=hi)


def interpolate_pos_embed(
    pos_embed: jax.Array,
    from_grid: int,
    to_grid: int,
    method: str = "bicubic",
    num_prefix_tokens: int = 1,
) -> jax.Array:
    """(P + from_grid^2, D) -> (P + to_grid^2, D); the P prefix rows (CLS,
    plus DeiT's distillation token when present) pass through untouched.

    ``method='bicubic'`` (default) is the torch-exact path above with
    align_corners=True — torchvision interpolate_embeddings semantics;
    other methods fall through to ``jax.image.resize``."""
    t, d = pos_embed.shape
    p = num_prefix_tokens
    if t != p + from_grid * from_grid:
        raise ValueError(
            f"pos_embed has {t} rows, expected {p + from_grid * from_grid} "
            f"({p} prefix + {from_grid}x{from_grid} grid)"
        )
    if from_grid == to_grid:
        return pos_embed
    prefix_rows = pos_embed[:p]
    grid = pos_embed[p:].reshape(from_grid, from_grid, d).astype(jnp.float32)
    if method == "bicubic":
        resized = bicubic_resize_grid(grid, (to_grid, to_grid))
    else:
        resized = jax.image.resize(grid, (to_grid, to_grid, d), method=method)
    out = jnp.concatenate(
        [prefix_rows.astype(jnp.float32),
         resized.reshape(to_grid * to_grid, d)], axis=0
    )
    return out.astype(pos_embed.dtype)


def adapt_params_resolution(
    params, from_cfg: ViTConfig, to_cfg: ViTConfig, method: str = "bicubic"
):
    """Re-target a params pytree to a new image resolution (same patch size
    and everything else — only the position table changes)."""
    if (from_cfg.patch_size, from_cfg.embed_dim, from_cfg.depth,
            from_cfg.distilled) != (
        to_cfg.patch_size,
        to_cfg.embed_dim,
        to_cfg.depth,
        to_cfg.distilled,
    ):
        raise ValueError("resolution transfer requires matching architecture")
    out = dict(params)
    out["pos_embed"] = interpolate_pos_embed(
        jnp.asarray(params["pos_embed"]),
        from_cfg.grid_size,
        to_cfg.grid_size,
        method,
        num_prefix_tokens=from_cfg.num_prefix_tokens,
    )
    return out
