"""MAE (masked-autoencoder) self-supervised pretraining (He et al. 2021).

The reference is an inference-only classifier (SURVEY.md: no training
exists); a complete framework for this model family ships the standard way
its backbones are *produced* — masked-image-modeling pretraining.  MAE is
also the most TPU-native of the ViT pretraining recipes: the encoder runs on
the ~25% visible tokens only (T drops from 197 to 50 for B/16 @224 at the
default 75% mask ratio), so the same token-count-generic encoder kernels
that power inference (ops/pallas/fused_block.py) do 4x less attention/MLP
work per image, and the masking itself is two static-shape gathers — no
dynamic shapes, nothing XLA can't tile onto the MXU.

Design:
  - The encoder reuses the classifier's params layout exactly (cls_token /
    patch_embed / pos_embed / blocks / ln_final — vit.py's pytree minus the
    head), so a pretrained MAE checkpoint drops into every existing
    downstream path (``extract_backbone`` + vit.init_head = the transfer-
    learning entry the train CLI already has).
  - Masking is per-image uniform-noise argsort (the paper's shuffle):
    ``len_keep`` is static (computed from the config at trace time), the
    keep/restore index tensors drive two ``take_along_axis`` gathers.
  - The decoder is a lightweight ViT (512 dim / 8 blocks / 16 heads by
    default) over the full token grid with mask tokens filled in; it exists
    only during pretraining and is dropped by ``extract_backbone``.
  - Loss: per-patch MSE on masked patches only, on (optionally per-patch
    normalized) channel-major pixel targets — ``patchify`` mirrors
    ops.reference.patch_embed's flatten order (ViT_seq.c:36-41) so the
    target layout matches the patch-embed GEMM's input rows.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vit_tpu.config import ViTConfig
from vit_tpu.models import vit
from vit_tpu.ops import reference
from vit_tpu.ops.dispatch import REFERENCE_OPS, OpsImpl

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    """Pretraining hyperparameters (paper defaults for ViT-B/16)."""

    mask_ratio: float = 0.75
    decoder_dim: int = 512
    decoder_depth: int = 8
    decoder_heads: int = 16
    norm_pix_loss: bool = True

    def decoder_cfg(self, cfg: ViTConfig) -> ViTConfig:
        """A ViTConfig view of the decoder (so vit.encoder_block and the
        init machinery apply unchanged)."""
        # positivity first: a zero/negative geometry would otherwise pass
        # the divisibility check (or die in it with ZeroDivisionError,
        # which the CLI's ValueError handler can't catch)
        for field in ("decoder_dim", "decoder_depth", "decoder_heads"):
            v = getattr(self, field)
            if v <= 0:
                raise ValueError(f"{field} must be positive (got {v})")
        if self.decoder_dim % self.decoder_heads:
            raise ValueError(
                f"decoder_dim {self.decoder_dim} not divisible by "
                f"decoder_heads {self.decoder_heads}"
            )
        return dataclasses.replace(
            cfg,
            embed_dim=self.decoder_dim,
            depth=self.decoder_depth,
            num_heads=self.decoder_heads,
            distilled=False,
            name=f"{cfg.name}_mae_decoder",
        )

    def len_keep(self, cfg: ViTConfig) -> int:
        """Visible patches per image (static — fixed at trace time)."""
        n = int(cfg.num_patches * (1.0 - self.mask_ratio))
        if not 0 < n < cfg.num_patches:
            # n == num_patches (mask_ratio ~ 0) would make mask.sum() == 0:
            # the loss is identically zero and the run silently trains
            # nothing — fail at config time like mask_ratio = 1 does
            raise ValueError(
                f"mask_ratio {self.mask_ratio} keeps {n} of "
                f"{cfg.num_patches} patches; need at least 1 visible and "
                "1 masked patch"
            )
        return n


def check_config(cfg: ViTConfig) -> None:
    if cfg.distilled:
        raise ValueError(
            "MAE pretraining targets the plain-ViT backbone family; "
            "distilled (DeiT) configs carry a distillation token whose "
            "pretraining recipe is distillation, not masking"
        )


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(..., C, H, W) -> (..., num_patches, C*p*p) pixel targets, in the
    same patch-major / channel-major order as reference.patch_embed's
    GEMM rows (ViT_seq.c:36-41 flatten order)."""
    *lead, c, h, w = images.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = images.reshape(*lead, c, gh, p, gw, p)
    x = jnp.moveaxis(x, (-5, -4, -3, -2, -1), (-3, -5, -2, -4, -1))
    return x.reshape(*lead, gh * gw, c * p * p)


def unpatchify(patches: jax.Array, cfg: ViTConfig) -> jax.Array:
    """Inverse of :func:`patchify`: (..., num_patches, C*p*p) ->
    (..., C, H, W) — reconstruction visualization."""
    *lead, n, _ = patches.shape
    p, c, g = cfg.patch_size, cfg.in_channels, cfg.grid_size
    x = patches.reshape(*lead, g, g, c, p, p)
    x = jnp.moveaxis(x, (-5, -4, -3, -2, -1), (-4, -2, -5, -3, -1))
    return x.reshape(*lead, c, g * p, g * p)


def random_mask(
    rng: jax.Array, batch: int, num_patches: int, len_keep: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-image random masking via uniform-noise argsort (He et al. §3.3).

    Returns (keep, restore, mask): ``keep`` (B, len_keep) int32 indices of
    visible patches, ``restore`` (B, N) int32 inverse shuffle, ``mask``
    (B, N) fp32 with 1 on MASKED patches (the loss weighting)."""
    noise = jax.random.uniform(rng, (batch, num_patches))
    shuffle = jnp.argsort(noise, axis=-1).astype(jnp.int32)
    restore = jnp.argsort(shuffle, axis=-1).astype(jnp.int32)
    keep = shuffle[:, :len_keep]
    mask = (restore >= len_keep).astype(jnp.float32)
    return keep, restore, mask


def _run_blocks(
    x: jax.Array,
    blocks: Dict[str, jax.Array],
    cfg: ViTConfig,
    ops: OpsImpl,
    gelu_variant: str,
) -> jax.Array:
    """Scan the stacked encoder blocks over x (B, T, D) — the same two
    dispatch arms as vit.forward (fused megakernel path on a flat (B*T, D)
    activation, or the jnp block scan)."""
    if ops.encoder_block is not None:
        b, t, d = x.shape
        x2 = x.reshape(b * t, d)

        def body(carry, blk):
            return ops.encoder_block(
                carry, blk, cfg.num_heads, t, cfg.layernorm_eps, gelu_variant
            ), None

        x2, _ = jax.lax.scan(body, x2, blocks)
        return x2.reshape(b, t, d)

    def body(carry, blk):
        return vit.encoder_block(carry, blk, cfg, ops, gelu_variant), None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def encode(
    params: Params,
    images: jax.Array,
    keep: jax.Array,
    cfg: ViTConfig,
    ops: OpsImpl = REFERENCE_OPS,
    gelu_variant: str = "exact",
) -> jax.Array:
    """Encoder over visible patches only: (B, C, H, W) + keep (B, K) ->
    final-LN tokens (B, 1+K, D) — CLS first, then the K visible tokens in
    shuffled order."""
    compute_dtype = params["pos_embed"].dtype
    x = images.astype(compute_dtype)
    x = ops.patch_embed(
        x, params["patch_embed"]["kernel"], params["patch_embed"]["bias"],
        cfg.patch_size,
    )
    # position embedding BEFORE the gather (each token keeps its own
    # position); row 0 is the CLS position
    x = x + params["pos_embed"][1:]
    x = jnp.take_along_axis(x, keep[..., None], axis=1)
    cls = (params["cls_token"] + params["pos_embed"][0]).astype(compute_dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(cls, (x.shape[0], 1, x.shape[-1])), x], axis=1
    )
    x = _run_blocks(x, params["blocks"], cfg, ops, gelu_variant)
    return ops.layer_norm(
        x, params["ln_final"]["scale"], params["ln_final"]["bias"],
        cfg.layernorm_eps,
    )


def decode(
    params: Params,
    latent: jax.Array,
    restore: jax.Array,
    cfg: ViTConfig,
    mae_cfg: MAEConfig,
    gelu_variant: str = "exact",
    ops: OpsImpl = REFERENCE_OPS,
) -> jax.Array:
    """Decoder: latent (B, 1+K, D) + restore (B, N) -> per-patch pixel
    predictions (B, N, C*p*p).  Mask tokens fill the hidden positions; the
    full grid (plus CLS) runs through the lightweight decoder blocks —
    through the SAME op table as the encoder (the kernels are
    token-count- and width-generic).  Measured: routing the decoder off
    the hard-coded jnp path onto the fused kernels took the B/16 b64 MAE
    step from 95.2 to 56.4 ms (-41%, docs/performance.md round 5)."""
    dec = params["decoder"]
    dcfg = mae_cfg.decoder_cfg(cfg)
    y = reference.linear(latent, dec["embed"]["kernel"], dec["embed"]["bias"])
    b, _, dd = y.shape
    n = restore.shape[-1]
    k = y.shape[1] - 1
    mask_tok = jnp.broadcast_to(
        dec["mask_token"].astype(y.dtype), (b, n - k, dd)
    )
    # visible tokens (shuffled order) ++ mask tokens, then inverse-shuffle
    # back to grid order
    grid = jnp.concatenate([y[:, 1:], mask_tok], axis=1)
    grid = jnp.take_along_axis(grid, restore[..., None], axis=1)
    y = jnp.concatenate([y[:, :1], grid], axis=1)
    y = y + dec["pos_embed"].astype(y.dtype)
    y = _run_blocks(y, dec["blocks"], dcfg, ops, gelu_variant)
    y = reference.layer_norm(
        y, dec["ln"]["scale"], dec["ln"]["bias"], cfg.layernorm_eps
    )
    pred = reference.linear(y, dec["pred"]["kernel"], dec["pred"]["bias"])
    return pred[:, 1:].astype(jnp.float32)  # drop CLS


def forward_loss(
    params: Params,
    images: jax.Array,
    rng: jax.Array,
    cfg: ViTConfig,
    mae_cfg: MAEConfig,
    ops: OpsImpl = REFERENCE_OPS,
    gelu_variant: str = "exact",
    return_pred: bool = False,
):
    """One pretraining forward: masked-patch MSE (scalar fp32).

    ``return_pred`` additionally returns (pred (B, N, C*p*p) fp32,
    mask (B, N) fp32 — 1 on masked) for tests/visualization."""
    check_config(cfg)
    b = images.shape[0]
    keep, restore, mask = random_mask(
        rng, b, cfg.num_patches, mae_cfg.len_keep(cfg)
    )
    latent = encode(params, images, keep, cfg, ops, gelu_variant)
    pred = decode(params, latent, restore, cfg, mae_cfg, gelu_variant, ops)
    target = patchify(images.astype(jnp.float32), cfg.patch_size)
    if mae_cfg.norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) * jax.lax.rsqrt(var + 1e-6)
    per_patch = jnp.square(pred - target).mean(axis=-1)
    loss = (per_patch * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    if return_pred:
        return loss, (pred, mask)
    return loss


def init_mae_params(
    key: jax.Array, cfg: ViTConfig, mae_cfg: MAEConfig, dtype=jnp.float32
) -> Params:
    """Encoder (vit.init_params minus the classifier head) + decoder."""
    check_config(cfg)
    k_enc, k_dec = jax.random.split(key)
    params = vit.init_params(k_enc, cfg, dtype)
    del params["head"]
    dcfg = mae_cfg.decoder_cfg(cfg)
    d, dd = cfg.embed_dim, mae_cfg.decoder_dim
    keys = iter(jax.random.split(k_dec, 8))

    def trunc(key, shape, fan_in):
        std = (1.0 / max(fan_in, 1)) ** 0.5
        return (
            jax.random.truncated_normal(key, -2, 2, shape, jnp.float32) * std
        ).astype(dtype)

    dec_full = vit.init_params(next(keys), dcfg, dtype)
    params["decoder"] = {
        "embed": {
            "kernel": trunc(next(keys), (d, dd), d),
            "bias": jnp.zeros((dd,), dtype),
        },
        "mask_token": (
            jax.random.normal(next(keys), (dd,), jnp.float32) * 0.02
        ).astype(dtype),
        "pos_embed": (
            jax.random.normal(next(keys), (cfg.num_patches + 1, dd), jnp.float32)
            * 0.02
        ).astype(dtype),
        "blocks": dec_full["blocks"],
        "ln": dec_full["ln_final"],
        "pred": {
            "kernel": trunc(next(keys), (dd, cfg.patch_dim), dd),
            "bias": jnp.zeros((cfg.patch_dim,), dtype),
        },
    }
    return params


def is_mae_params(tree: Any) -> bool:
    return isinstance(tree, dict) and "decoder" in tree and "head" not in tree


def extract_backbone(
    mae_params: Params, key: jax.Array, cfg: ViTConfig, dtype=None
) -> Params:
    """Pretrained MAE tree -> standard classifier pytree (fresh random
    head) — the downstream fine-tuning entry.  The decoder is dropped (it
    exists only to make the pretraining task hard enough, He et al. §4)."""
    out = {k: v for k, v in mae_params.items() if k != "decoder"}
    out["head"] = vit.init_head(
        key, cfg, dtype or mae_params["pos_embed"].dtype
    )
    return out
