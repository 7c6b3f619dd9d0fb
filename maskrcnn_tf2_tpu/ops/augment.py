"""Device-side (in-graph) augmentation — SURVEY §2.10's TPU plan.

The reference augments on the CPU with albumentations inside the worker
processes (preprocess.py:221-230, augmentation.py:4-79). On TPU the host has
one core and the batch is already resident in HBM, so the cheap geometric +
photometric augmentations run fused INSIDE the jitted train step:

* random horizontal flip — image mirrored; normalized gt boxes mapped
  ``x1' = 1 - x2, x2' = 1 - x1``; masks mirrored along their width axis
  (mini-masks live in box-relative coordinates, so mirroring the crop is
  exactly the flip of the instance);
* random zoom-out scale jitter — the image is shrunk by ``s in
  [1 - scale_jitter, 1]`` toward the top-left (implemented as a resampling
  of a virtually larger canvas) and gt boxes scaled by ``s``; zoom-OUT only,
  so every box stays inside the frame and box-relative mini-masks remain
  valid (zoom-in would clip boxes and desynchronize their mini-masks);
* photometric jitter — per-image brightness/contrast on the raw 0..255
  image (albumentations MultiplicativeNoise/RandomBrightnessContrast
  equivalents, elementwise, fused for free).

Heavier augmentations (rotation, blur, channel shuffle, weather) remain
available on the host via ``data.augment`` — the device path covers the
every-step hot set so a single host core can still feed the chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flip_batch(images, gt_boxes, gt_masks, gt_valid, do_flip):
    f = do_flip[:, None, None, None]
    images = jnp.where(f, images[:, :, ::-1, :], images)
    x1 = jnp.where(do_flip[:, None] & gt_valid, 1.0 - gt_boxes[..., 3], gt_boxes[..., 1])
    x2 = jnp.where(do_flip[:, None] & gt_valid, 1.0 - gt_boxes[..., 1], gt_boxes[..., 3])
    gt_boxes = jnp.stack([gt_boxes[..., 0], x1, gt_boxes[..., 2], x2], axis=-1)
    gt_masks = jnp.where(do_flip[:, None, None, None], gt_masks[..., ::-1], gt_masks)
    return images, gt_boxes, gt_masks


def _zoom_out_batch(images, gt_boxes, gt_valid, scale):
    """Shrink each image by ``scale`` (<= 1) toward the origin with bilinear
    resampling on a fixed-size grid; boxes scale linearly. Fixed shapes: the
    sample grid is always H x W, only the sampling positions depend on
    ``scale`` (an interpolation-matrix contraction, MXU-friendly)."""
    b, h, w, c = images.shape
    # sample position p_out -> p_in = p_out / scale, valid while p_in < dim
    ys = jnp.arange(h, dtype=jnp.float32)[None, :] / scale[:, None]  # [B, H]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] / scale[:, None]
    ymat = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, :, None] - jnp.arange(h, dtype=jnp.float32)))
    xmat = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, :, None] - jnp.arange(w, dtype=jnp.float32)))
    out = jnp.einsum("byh,bhwc->bywc", ymat, images)
    out = jnp.einsum("bywc,bxw->byxc", out, xmat)
    gt_boxes = jnp.where(gt_valid[..., None], gt_boxes * scale[:, None, None], gt_boxes)
    return out, gt_boxes


def device_augment(batch, rng, flip: bool = True, scale_jitter: float = 0.0,
                   photometric: float = 0.0):
    """Augment a training batch in-graph. Returns a new batch dict.

    batch: images [B,H,W,3] (raw 0..255 float32), gt_class_ids [B,G],
    gt_boxes [B,G,4] normalized, gt_masks [B,G,mh,mw].
    """
    images = batch["images"]
    gt_boxes = batch["gt_boxes"]
    gt_masks = batch["gt_masks"]
    gt_valid = batch["gt_class_ids"] != 0
    b = images.shape[0]
    r_flip, r_scale, r_bright, r_contrast = jax.random.split(rng, 4)

    if flip:
        do_flip = jax.random.bernoulli(r_flip, 0.5, (b,))
        images, gt_boxes, gt_masks = _flip_batch(
            images, gt_boxes, gt_masks, gt_valid, do_flip
        )
    if scale_jitter > 0.0:
        scale = jax.random.uniform(
            r_scale, (b,), minval=1.0 - scale_jitter, maxval=1.0
        )
        images, gt_boxes = _zoom_out_batch(images, gt_boxes, gt_valid, scale)
    if photometric > 0.0:
        bright = jax.random.uniform(
            r_bright, (b, 1, 1, 1), minval=-photometric, maxval=photometric
        )
        contrast = jax.random.uniform(
            r_contrast, (b, 1, 1, 1),
            minval=1.0 - photometric, maxval=1.0 + photometric,
        )
        mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
        images = jnp.clip((images - mean) * contrast + mean + 255.0 * bright, 0.0, 255.0)

    out = dict(batch)
    out["images"] = images
    out["gt_boxes"] = gt_boxes
    out["gt_masks"] = gt_masks
    return out
