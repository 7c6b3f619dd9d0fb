"""Image meta contract, normalization, and crop_and_resize.

Implements the reference's image-meta vector contract
(``compose_image_meta``/``parse_image_meta_graph``, utils.py:494-516 and
utils.py:801-822) and a vectorized jnp equivalent of
``tf.image.crop_and_resize`` (bilinear), which the reference leans on for
mask targets (mrcnn_layers.py:927-954) and ROIAlign. Host-side (numpy)
resize/pad lives in ``maskrcnn_tf2_tpu.data.transforms``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Image meta: [image_id(1), original_shape(3), resized_shape(3), window(4),
#             scale(1), active_class_ids(num_classes)]
# ---------------------------------------------------------------------------

def compose_image_meta(
    image_id, original_shape, image_shape, window, scale, active_class_ids
) -> np.ndarray:
    """Host-side meta vector builder (reference utils.py:494-516)."""
    return np.concatenate(
        [
            np.asarray([image_id], np.float32),
            np.asarray(original_shape[:3], np.float32),
            np.asarray(image_shape[:3], np.float32),
            np.asarray(window, np.float32),
            np.asarray([scale], np.float32),
            np.asarray(active_class_ids, np.float32),
        ]
    )


def parse_image_meta(meta: jnp.ndarray) -> dict:
    """Split a batched ``[B, M]`` meta tensor into named parts
    (reference parse_image_meta_graph, utils.py:801-822)."""
    return {
        "image_id": meta[..., 0:1],
        "original_image_shape": meta[..., 1:4],
        "image_shape": meta[..., 4:7],
        "window": meta[..., 7:11],
        "scale": meta[..., 11:12],
        "active_class_ids": meta[..., 12:],
    }


def norm_window(window: jnp.ndarray, image_shape) -> jnp.ndarray:
    """Pixel window -> normalized, with the norm_boxes convention."""
    h, w = image_shape[0], image_shape[1]
    scale = jnp.array([h - 1, w - 1, h - 1, w - 1], dtype=window.dtype)
    shift = jnp.array([0.0, 0.0, 1.0, 1.0], dtype=window.dtype)
    return (window - shift) / scale


def normalize_image(image: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Fused on-device normalization: uint8/float [0,255] -> standardized.

    Replaces the reference's host-side albumentations Normalize
    (preprocess.py:495-517): out = (x/255 - mean) / std.
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (image.astype(jnp.float32) / 255.0 - mean) / std


def maxmin_normalize_image(image: jnp.ndarray) -> jnp.ndarray:
    """Per-image max-min scaling: (x - min) / (max - min).

    The reference's ``normalize=None`` input path
    (maxmin_normalize_input, preprocess.py:520-530). Reductions are over
    the trailing (H, W, C) axes so the op is batch-shape agnostic.
    """
    x = image.astype(jnp.float32)
    axes = tuple(range(x.ndim - 3, x.ndim))
    lo = jnp.min(x, axis=axes, keepdims=True)
    x = x - lo
    hi = jnp.max(x, axis=axes, keepdims=True)
    return x / jnp.maximum(hi, 1e-12)


# ---------------------------------------------------------------------------
# crop_and_resize — bilinear, tf.image.crop_and_resize semantics
# ---------------------------------------------------------------------------

def crop_and_resize(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    box_indices: jnp.ndarray,
    crop_size: Sequence[int],
) -> jnp.ndarray:
    """jnp twin of ``tf.image.crop_and_resize`` (bilinear, extrapolation 0).

    Args:
      images: ``[K, H, W, C]``.
      boxes: ``[R, 4]`` normalized (y1, x1, y2, x2); sample grid endpoints map
        to ``y1*(H-1) .. y2*(H-1)`` (and x alike); for crop size 1 the center.
      box_indices: ``[R]`` int32 image index per box.
      crop_size: (ph, pw).

    Returns:
      ``[R, ph, pw, C]`` float32.
    """
    k, h, w, c = images.shape
    r = boxes.shape[0]
    ph, pw = int(crop_size[0]), int(crop_size[1])
    boxes = boxes.astype(jnp.float32)
    y1, x1, y2, x2 = (boxes[:, i] for i in range(4))

    def grid(lo, hi, n, dim):
        if n > 1:
            frac = jnp.arange(n, dtype=jnp.float32) / (n - 1)
            return (lo[:, None] + (hi - lo)[:, None] * frac) * (dim - 1)
        return (0.5 * (lo + hi))[:, None] * (dim - 1)

    ys = grid(y1, y2, ph, h)  # [R, ph]
    xs = grid(x1, x2, pw, w)  # [R, pw]

    # tf semantics: a sample point whose y (or x) coordinate falls outside
    # [0, dim-1] contributes extrapolation_value (0) for the whole point.
    valid_y = (ys >= 0) & (ys <= h - 1)  # [R, ph]
    valid_x = (xs >= 0) & (xs <= w - 1)  # [R, pw]

    def corners(coord, size):
        c0 = jnp.floor(coord).astype(jnp.int32)
        t = coord - c0.astype(jnp.float32)
        return jnp.clip(c0, 0, size - 1), jnp.clip(c0 + 1, 0, size - 1), t

    y0, y1i, ty = corners(ys, h)
    x0, x1i, tx = corners(xs, w)

    flat = images.reshape(k * h * w, c).astype(jnp.float32)
    base = box_indices.astype(jnp.int32)[:, None, None] * (h * w)

    def gather(yc, xc):
        idx = base + yc[:, :, None] * w + xc[:, None, :]  # [R, ph, pw]
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(r, ph, pw, c)

    wy1 = ty[:, :, None, None]
    wx1 = tx[:, None, :, None]
    out = (
        gather(y0, x0) * (1 - wy1) * (1 - wx1)
        + gather(y0, x1i) * (1 - wy1) * wx1
        + gather(y1i, x0) * wy1 * (1 - wx1)
        + gather(y1i, x1i) * wy1 * wx1
    )
    point_valid = (valid_y[:, :, None] & valid_x[:, None, :])[..., None]
    return jnp.where(point_valid, out, 0.0)


def _sample_coords(lo, hi, n, dim):
    if n > 1:
        frac = jnp.arange(n, dtype=jnp.float32) / (n - 1)
        return (lo[:, None] + (hi - lo)[:, None] * frac) * (dim - 1)
    return (0.5 * (lo + hi))[:, None] * (dim - 1)


def crop_and_resize_separable(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    box_indices: jnp.ndarray,
    crop_size: Sequence[int],
) -> jnp.ndarray:
    """``crop_and_resize`` for single-channel masks via two batched matmuls.

    Bilinear sampling is separable: ``out_r = Y_r @ M_{g_r} @ X_r`` where
    ``Y_r[i, h] = hat(y_i - h)`` is the per-ROI row-interpolation matrix
    (hat(t) = max(0, 1-|t|)) and X alike. This replaces the 4-corner scalar
    gathers — pathologically slow on TPU (the profiled mask-target hot spot,
    ~24 ms per corner at 512^2) — with MXU matmuls and one contiguous
    row-gather of the assigned masks. Exact same output as ``crop_and_resize``
    for in-range points; out-of-range sample points produce 0 (tf semantics).

    Args:
      masks: ``[K, H, W]``.
      boxes: ``[R, 4]`` normalized.
      box_indices: ``[R]`` int32.
      crop_size: (ph, pw).

    Returns: ``[R, ph, pw]`` float32.
    """
    k, h, w = masks.shape
    r = boxes.shape[0]
    ph, pw = int(crop_size[0]), int(crop_size[1])
    boxes = boxes.astype(jnp.float32)
    y1, x1, y2, x2 = (boxes[:, i] for i in range(4))

    ys = _sample_coords(y1, y2, ph, h)  # [R, ph]
    xs = _sample_coords(x1, x2, pw, w)  # [R, pw]
    valid_y = (ys >= 0) & (ys <= h - 1)
    valid_x = (xs >= 0) & (xs <= w - 1)

    grid_h = jnp.arange(h, dtype=jnp.float32)
    grid_w = jnp.arange(w, dtype=jnp.float32)
    ymat = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, :, None] - grid_h))  # [R, ph, H]
    ymat = ymat * valid_y[:, :, None]
    xmat = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, :, None] - grid_w))  # [R, pw, W]
    xmat = xmat * valid_x[:, :, None]

    # Select each ROI's assigned mask by one-hot matmul, not jnp.take: the
    # [R, H, W] row gather was the profiled train-step hot spot (~19 ms/step
    # on v5e at R=1600); a [R, K] x [K, H*W] MXU matmul is exact for the
    # 0/1-valued one-hot and ~free at this size.
    onehot = jax.nn.one_hot(box_indices, k, dtype=jnp.float32)  # [R, K]
    sel = jnp.matmul(
        onehot, masks.astype(jnp.float32).reshape(k, h * w), precision="highest"
    ).reshape(r, h, w)
    # geometry must stay f32: the default matmul precision downcasts to bf16
    rows = jnp.einsum("rph,rhw->rpw", ymat, sel, precision="highest")
    return jnp.einsum("rpw,rqw->rpq", rows, xmat, precision="highest")
