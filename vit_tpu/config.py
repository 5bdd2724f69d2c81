"""Model configuration.

Replaces the reference's compile-time ``#define`` blocks, which are duplicated
across both forward-pass implementations and the OpenCL kernels
(ViT_seq.c:10-21, ViT_opencl.c:12-23, kernel.cl:1-4): image 224, patch 16,
3 channels, 1000 classes, embed 768, depth 12, heads 12, mlp_ratio 4.0,
layernorm eps 1e-6, dropout 0.

Unlike the reference (hard-wired to ViT-B/16 @224), this is a single dataclass
with the standard torchvision variants (B/16, B/32, L/16, L/32, H/14) and
arbitrary resolution (e.g. the 577-token @384 configs in BASELINE.json).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Hyperparameters for a ViT image classifier (torchvision ``vit_*`` family)."""

    image_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layernorm_eps: float = 1e-6  # ViT_seq.c:21 (CPU path; the GPU kernel omits it, kernel.cl:63)
    dropout: float = 0.0
    drop_path: float = 0.0  # stochastic depth, linearly scaled over layers
    # DeiT (Touvron et al. 2021) distillation token: a second learned prefix
    # token with its own classifier head, averaged with the CLS head at
    # inference.  The reference family is torchvision-ViT-only (always a
    # single CLS token, ViT_seq.c:72-90); this extends the framework to the
    # deit_* checkpoint family without touching the encoder kernels (they
    # are token-count-generic — T just grows by one).
    distilled: bool = False
    # False for configs whose head geometry no published checkpoint family
    # shares (e.g. vit_b_16_wide): tensor SHAPES may match a torchvision
    # checkpoint exactly, but the packed-QKV (head, {q,k,v}, head_dim)
    # column grouping differs, so loading one would silently compute wrong
    # attention — the loaders refuse instead (io/load_any.py).
    native_checkpoints: bool = True
    name: str = "vit_b_16"

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def num_prefix_tokens(self) -> int:
        """Learned tokens prepended to the patch sequence: CLS
        (ViT_seq.c:72-90), plus DeiT's distillation token when distilled."""
        return 2 if self.distilled else 1

    @property
    def seq_len(self) -> int:
        """Tokens = patches + prefix tokens (197 for B/16 @224, ViT_seq.c:125;
        198 for the distilled DeiT variants)."""
        return self.num_patches + self.num_prefix_tokens

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    @property
    def patch_dim(self) -> int:
        """Flattened patch length fed to the patch-embed GEMM (3*16*16 = 768)."""
        return self.in_channels * self.patch_size * self.patch_size

    def with_image_size(self, image_size: int) -> "ViTConfig":
        if image_size % self.patch_size != 0:
            # fail at config time: grid_size would silently floor and the
            # forward's patch reshape would die with a raw shape error
            raise ValueError(
                f"image_size {image_size} is not a multiple of "
                f"{self.name}'s patch_size {self.patch_size} "
                f"(nearest valid: {image_size // self.patch_size * self.patch_size} "
                f"or {-(-image_size // self.patch_size) * self.patch_size})"
            )
        return dataclasses.replace(
            self, image_size=image_size, name=f"{self.name}_{image_size}"
        )

    def num_params(self) -> int:
        """Total parameter count (matches the 152-tensor layout of §5 SURVEY.md)."""
        d, h, p = self.embed_dim, self.mlp_dim, self.patch_dim
        per_layer = (
            2 * d            # ln_1
            + 3 * d * d + 3 * d  # in_proj
            + d * d + d      # out_proj
            + 2 * d          # ln_2
            + h * d + h      # mlp_0
            + d * h + d      # mlp_3
        )
        n = (
            d                      # class token
            + d * p + d            # conv_proj
            + self.seq_len * d     # pos embedding
            + self.depth * per_layer
            + 2 * d                # final ln
            + self.num_classes * d + self.num_classes  # head
        )
        if self.distilled:
            # distillation token + its classifier head (DeiT)
            n += d + self.num_classes * d + self.num_classes
        return n

    def flops_per_image(self) -> int:
        """Forward-pass matmul FLOPs (2*MACs) for one image — roofline input."""
        t, d, h = self.seq_len, self.embed_dim, self.mlp_dim
        patches = self.num_patches
        conv = 2 * patches * self.patch_dim * d
        qkv = 2 * t * d * 3 * d
        attn = 2 * 2 * t * t * d  # QK^T and S@V, summed over heads
        out_proj = 2 * t * d * d
        mlp = 2 * 2 * t * d * h
        head = 2 * d * self.num_classes
        return conv + self.depth * (qkv + attn + out_proj + mlp) + head


# Standard torchvision variants (weights interchange with vit_b_16 et al.).
VIT_B_16 = ViTConfig(name="vit_b_16")
VIT_B_32 = ViTConfig(patch_size=32, name="vit_b_32")
VIT_L_16 = ViTConfig(embed_dim=1024, depth=24, num_heads=16, name="vit_l_16")
VIT_L_32 = ViTConfig(
    embed_dim=1024, depth=24, num_heads=16, patch_size=32, name="vit_l_32"
)
VIT_H_14 = ViTConfig(
    embed_dim=1280, depth=32, num_heads=16, patch_size=14, name="vit_h_14"
)

# Wide-head B/16: identical parameter count and FLOPs to B/16 (768 dim,
# 12 layers, MLP ratio 4) but 6 heads x head_dim 128 instead of 12 x 64.
# dh=64 contracts only half the MXU's 128 lanes in the attention score and
# context dots — the measured ~26.8 ms bf16 batch-100 structural floor
# (docs/performance.md "attention-core ceiling").  dh=128 fills the lanes;
# this config exists to let from-scratch / MAE-pretrained users buy that
# headroom (no torchvision checkpoint has this geometry — B/16 weights do
# NOT interchange: the packed-QKV column grouping differs).
VIT_B_16_WIDE = ViTConfig(
    num_heads=6, native_checkpoints=False, name="vit_b_16_wide"
)

# DeiT distilled family (facebook/deit-*-distilled-patch16-224): same pre-LN
# encoder geometry as ViT (dh=64 throughout), plus the distillation token and
# dual classifier heads.  Tiny/small are new geometries the torchvision
# family doesn't cover.
DEIT_T_16 = ViTConfig(
    embed_dim=192, depth=12, num_heads=3, distilled=True, name="deit_t_16"
)
DEIT_S_16 = ViTConfig(
    embed_dim=384, depth=12, num_heads=6, distilled=True, name="deit_s_16"
)
DEIT_B_16 = ViTConfig(distilled=True, name="deit_b_16")

CONFIGS = {
    c.name: c
    for c in (
        VIT_B_16,
        VIT_B_32,
        VIT_L_16,
        VIT_L_32,
        VIT_H_14,
        VIT_B_16_WIDE,
        VIT_B_16.with_image_size(384),
        VIT_L_16.with_image_size(384),
        DEIT_T_16,
        DEIT_S_16,
        DEIT_B_16,
        DEIT_B_16.with_image_size(384),
    )
}


def get_config(name: str) -> ViTConfig:
    if name not in CONFIGS:
        raise KeyError(f"unknown config {name!r}; available: {sorted(CONFIGS)}")
    return CONFIGS[name]
