"""On-device data augmentation for training (flip / random-resized crop /
mixup / cutmix), composed into the jitted train step.

The reference has no training at all (SURVEY.md §2.3 — inference only), so
there is nothing to mirror; this is the framework-completeness layer a ViT
trainer needs (the standard ImageNet ViT recipe: RandomResizedCrop +
horizontal flip + mixup/cutmix + label smoothing).

TPU-first design: every transform is a pure function of (rng, batch) with
STATIC shapes, so it fuses into the train-step jit — no host-side
preprocessing, no dynamic shapes, no recompiles:

- random-resized crop uses ``jax.image.scale_and_translate`` with traced
  per-image scale/translation (continuous crop boxes; output shape fixed),
  vmapped over the batch — the XLA-native form of torchvision's
  RandomResizedCrop.
- cutmix builds its rectangle with broadcasted-iota comparisons (a traced
  box inside a static mask), never a dynamic slice.
- mixup/cutmix emit SOFT labels; `soft_targets` turns int labels into
  (optionally smoothed) one-hot rows so the two compose.

Images are (B, C, H, W) — the reference's NCHW layout (Network.c:36-93).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def soft_targets(labels: jax.Array, num_classes: int,
                 label_smoothing: float = 0.0) -> jax.Array:
    """Int labels (B,) -> soft rows (B, num_classes); already-soft labels
    pass through UNSMOOTHED (their producer — mixup, a distillation
    teacher — owns the target distribution; smoothing twice would flatten
    it).  Smoothing eps spreads eps/K mass over every class."""
    if labels.ndim == 2:
        return labels.astype(jnp.float32)
    y = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if label_smoothing:
        eps = float(label_smoothing)
        y = y * (1.0 - eps) + eps / num_classes
    return y


def random_flip(rng: jax.Array, images: jax.Array) -> jax.Array:
    """Horizontal flip with p=1/2, decided per image."""
    flip = jax.random.bernoulli(rng, 0.5, (images.shape[0],))
    return jnp.where(flip[:, None, None, None], images[..., ::-1], images)


def random_resized_crop(
    rng: jax.Array,
    images: jax.Array,
    scale: tuple[float, float] = (0.3, 1.0),
    ratio: tuple[float, float] = (3 / 4, 4 / 3),
) -> jax.Array:
    """Per-image random crop (area in ``scale``, aspect in ``ratio``)
    resized back to the input size — continuous boxes via
    ``scale_and_translate`` (bilinear), so shapes stay static under jit."""
    b, _, h, w = images.shape
    k_area, k_ratio, k_pos = jax.random.split(rng, 3)
    area = jax.random.uniform(k_area, (b,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        k_ratio, (b,),
        minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]),
    )
    aspect = jnp.exp(log_r)  # crop_w/crop_h relative to full frame
    crop_h = jnp.clip(jnp.sqrt(area / aspect) * h, 1.0, float(h))
    crop_w = jnp.clip(jnp.sqrt(area * aspect) * w, 1.0, float(w))
    u = jax.random.uniform(k_pos, (b, 2))
    top = u[:, 0] * (h - crop_h)
    left = u[:, 1] * (w - crop_w)
    # output row y samples input row y/scale_y + top: scale_and_translate's
    # inverse map is in = (out - translation) / scale, so
    # scale = H/crop_h and translation = -top * scale.
    scale_y = h / crop_h
    scale_x = w / crop_w

    def one(img, sy, sx, ty, tx):
        return jax.image.scale_and_translate(
            img, img.shape, (1, 2),
            jnp.stack([sy, sx]), jnp.stack([ty, tx]), method="linear",
        )

    return jax.vmap(one)(
        images, scale_y, scale_x, -top * scale_y, -left * scale_x
    ).astype(images.dtype)


def mixup(rng: jax.Array, images: jax.Array, targets: jax.Array,
          alpha: float = 0.2):
    """Convex combination with a reversed batch, lam ~ Beta(alpha, alpha)
    (one lam per batch, unfolded — the mixup paper's recipe; the images
    and label rows mix symmetrically, so dominance doesn't matter).
    ``targets`` must be soft rows; returns (images, targets) mixed with
    the same lam."""
    lam = jax.random.beta(rng, alpha, alpha)
    mixed_x = lam * images + (1.0 - lam) * images[::-1]
    mixed_y = lam * targets + (1.0 - lam) * targets[::-1]
    return mixed_x.astype(images.dtype), mixed_y


def cutmix(rng: jax.Array, images: jax.Array, targets: jax.Array,
           alpha: float = 1.0):
    """Paste a rectangle from the reversed batch; label weights follow the
    ACTUAL pasted area (clipped boxes shrink it).  Static-shape mask from
    broadcasted iotas; one box per batch (the cutmix paper's recipe)."""
    _, _, h, w = images.shape
    k_lam, k_pos = jax.random.split(rng)
    lam = jax.random.beta(k_lam, alpha, alpha)
    cut = jnp.sqrt(1.0 - lam)  # box side fraction
    cy = jax.random.uniform(k_pos, ()) * h
    cx = jax.random.uniform(jax.random.fold_in(k_pos, 1), ()) * w
    y0, y1 = jnp.clip(cy - cut * h / 2, 0, h), jnp.clip(cy + cut * h / 2, 0, h)
    x0, x1 = jnp.clip(cx - cut * w / 2, 0, w), jnp.clip(cx + cut * w / 2, 0, w)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    in_box = (
        ((ys >= y0) & (ys < y1))[:, None] & ((xs >= x0) & (xs < x1))[None, :]
    )
    mixed_x = jnp.where(in_box[None, None], images[::-1], images)
    frac = in_box.mean()  # actual pasted fraction after clipping
    mixed_y = (1.0 - frac) * targets + frac * targets[::-1]
    return mixed_x.astype(images.dtype), mixed_y


def make_augment_fn(
    names: Sequence[str],
    num_classes: int,
    label_smoothing: float = 0.0,
    mixup_alpha: float = 0.2,
    cutmix_alpha: float = 1.0,
    crop_scale: tuple[float, float] = (0.3, 1.0),
) -> Callable:
    """Compose named transforms into ``(rng, images, labels) ->
    (images, soft_targets)``.  ``names`` ⊆ {flip, crop, mixup, cutmix};
    mixup+cutmix together alternate 50/50 per step (the timm recipe).
    The result is jit-friendly and runs inside the train step."""
    names = list(names)
    known = {"flip", "crop", "mixup", "cutmix"}
    bad = set(names) - known
    if bad:
        raise ValueError(f"unknown augmentation(s) {sorted(bad)}; "
                         f"choose from {sorted(known)}")
    # Beta(a, a) with a <= 0 samples NaN, which would silently poison every
    # image AND target in the jitted step — fail here, at config time.
    if "mixup" in names and not mixup_alpha > 0.0:
        raise ValueError(
            f"mixup_alpha must be > 0 (got {mixup_alpha}); to disable "
            "mixup, drop 'mixup' from the augmentation list instead"
        )
    if "cutmix" in names and not cutmix_alpha > 0.0:
        raise ValueError(
            f"cutmix_alpha must be > 0 (got {cutmix_alpha}); to disable "
            "cutmix, drop 'cutmix' from the augmentation list instead"
        )

    def fn(rng, images, labels):
        y = soft_targets(labels, num_classes, label_smoothing)
        keys = jax.random.split(rng, 4)
        if "crop" in names:
            images = random_resized_crop(keys[0], images, scale=crop_scale)
        if "flip" in names:
            images = random_flip(keys[1], images)
        has_mix, has_cut = "mixup" in names, "cutmix" in names
        if has_mix and has_cut:
            do_mix = jax.random.bernoulli(keys[2], 0.5)
            # lax.cond: only the chosen branch executes under jit (a
            # jnp.where select would compute BOTH full-batch transforms
            # every step)
            images, y = jax.lax.cond(
                do_mix,
                lambda k, x, t: mixup(k, x, t, mixup_alpha),
                lambda k, x, t: cutmix(k, x, t, cutmix_alpha),
                keys[3], images, y,
            )
        elif has_mix:
            images, y = mixup(keys[3], images, y, mixup_alpha)
        elif has_cut:
            images, y = cutmix(keys[3], images, y, cutmix_alpha)
        return images, y

    return fn
