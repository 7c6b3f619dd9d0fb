"""Pure-functional box geometry ops (jnp).

Re-implements the box-math semantics of the reference's
``src/common/utils.py`` (norm/denorm boxes at utils.py:691-722, delta
apply at utils.py:830-851, clip at utils.py:854-869, refinement/encode at
utils.py:775-798, IoU overlaps at mrcnn_layers.py:982-1007) as fixed-shape
jax-traceable functions. All functions are batched-friendly: they operate on
the trailing ``[..., 4]`` axis with ``(y1, x1, y2, x2)`` ordering and
broadcast over leading axes, so ``jax.vmap``/``pjit`` replace the reference's
python-loop ``batch_slice`` (utils.py:738-772).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def norm_boxes(boxes: jnp.ndarray, shape) -> jnp.ndarray:
    """Pixel boxes -> normalized [0, 1] coordinates.

    Matches reference ``norm_boxes`` (utils.py:691-705): divides by
    ``(h - 1, w - 1)`` after shifting ``(y2, x2)`` down by one pixel, so that a
    full-image box [0, 0, h, w] maps to [0, 0, 1, 1].
    """
    h, w = shape[0], shape[1]
    scale = jnp.array([h - 1, w - 1, h - 1, w - 1], dtype=boxes.dtype)
    shift = jnp.array([0.0, 0.0, 1.0, 1.0], dtype=boxes.dtype)
    return (boxes - shift) / scale


def denorm_boxes(boxes: jnp.ndarray, shape) -> jnp.ndarray:
    """Normalized boxes -> pixel coordinates (reference utils.py:708-722)."""
    h, w = shape[0], shape[1]
    scale = jnp.array([h - 1, w - 1, h - 1, w - 1], dtype=boxes.dtype)
    shift = jnp.array([0.0, 0.0, 1.0, 1.0], dtype=boxes.dtype)
    return boxes * scale + shift


def apply_box_deltas(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Apply (dy, dx, log dh, log dw) refinements to (y1, x1, y2, x2) boxes.

    Matches reference ``apply_box_deltas_graph`` (utils.py:830-851).
    """
    height = boxes[..., 2] - boxes[..., 0]
    width = boxes[..., 3] - boxes[..., 1]
    center_y = boxes[..., 0] + 0.5 * height
    center_x = boxes[..., 1] + 0.5 * width

    center_y = center_y + deltas[..., 0] * height
    center_x = center_x + deltas[..., 1] * width
    height = height * jnp.exp(deltas[..., 2])
    width = width * jnp.exp(deltas[..., 3])

    y1 = center_y - 0.5 * height
    x1 = center_x - 0.5 * width
    return jnp.stack([y1, x1, y1 + height, x1 + width], axis=-1)


def clip_boxes(boxes: jnp.ndarray, window) -> jnp.ndarray:
    """Clip boxes to a (wy1, wx1, wy2, wx2) window (reference utils.py:854-869).

    ``window`` may be a constant 4-sequence or an array broadcastable against
    ``boxes[..., 4]`` (e.g. per-image windows ``[B, 1, 4]``).
    """
    window = jnp.asarray(window, dtype=boxes.dtype)
    wy1, wx1, wy2, wx2 = (window[..., i] for i in range(4))
    y1 = jnp.clip(boxes[..., 0], wy1, wy2)
    x1 = jnp.clip(boxes[..., 1], wx1, wx2)
    y2 = jnp.clip(boxes[..., 2], wy1, wy2)
    x2 = jnp.clip(boxes[..., 3], wx1, wx2)
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def encode_boxes(boxes: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """Compute (dy, dx, log dh, log dw) targets mapping ``boxes`` -> ``gt_boxes``.

    Matches reference ``box_refinement_graph`` (utils.py:775-798). Inputs must
    be strictly valid boxes (height/width > 0); callers mask out padding.
    """
    height = boxes[..., 2] - boxes[..., 0]
    width = boxes[..., 3] - boxes[..., 1]
    center_y = boxes[..., 0] + 0.5 * height
    center_x = boxes[..., 1] + 0.5 * width

    gt_height = gt_boxes[..., 2] - gt_boxes[..., 0]
    gt_width = gt_boxes[..., 3] - gt_boxes[..., 1]
    gt_center_y = gt_boxes[..., 0] + 0.5 * gt_height
    gt_center_x = gt_boxes[..., 1] + 0.5 * gt_width

    # Guard padded zero-size boxes against division by zero / log(0); callers
    # are expected to mask these rows out downstream.
    eps = jnp.asarray(1e-8, boxes.dtype)
    height = jnp.maximum(height, eps)
    width = jnp.maximum(width, eps)
    gt_height = jnp.maximum(gt_height, eps)
    gt_width = jnp.maximum(gt_width, eps)

    dy = (gt_center_y - center_y) / height
    dx = (gt_center_x - center_x) / width
    dh = jnp.log(gt_height / height)
    dw = jnp.log(gt_width / width)
    return jnp.stack([dy, dx, dh, dw], axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0.0
    )


def overlaps(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix ``[N, M]`` (reference overlaps_graph,
    mrcnn_layers.py:982-1007) — computed by broadcasting, no tiling/looping.

    Supports leading batch axes: ``[..., N, 4] x [..., M, 4] -> [..., N, M]``.
    """
    b1 = boxes1[..., :, None, :]  # [..., N, 1, 4]
    b2 = boxes2[..., None, :, :]  # [..., 1, M, 4]
    y1 = jnp.maximum(b1[..., 0], b2[..., 0])
    x1 = jnp.maximum(b1[..., 1], b2[..., 1])
    y2 = jnp.minimum(b1[..., 2], b2[..., 2])
    x2 = jnp.minimum(b1[..., 3], b2[..., 3])
    intersection = jnp.maximum(y2 - y1, 0.0) * jnp.maximum(x2 - x1, 0.0)
    area1 = box_area(boxes1)[..., :, None]
    area2 = box_area(boxes2)[..., None, :]
    union = area1 + area2 - intersection
    return intersection / jnp.maximum(union, 1e-10)


def extract_bboxes_from_masks(masks: jnp.ndarray) -> jnp.ndarray:
    """Tight pixel bounding boxes from instance masks ``[N, H, W] -> [N, 4]``.

    Matches reference ``extract_bboxes`` (utils.py:25-51): boxes are
    ``(y1, x1, y2 + 1, x2 + 1)`` in pixel coords; empty masks give zeros.
    """
    n, h, w = masks.shape
    any_row = jnp.any(masks > 0, axis=2)  # [N, H]
    any_col = jnp.any(masks > 0, axis=1)  # [N, W]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, h), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
    big = jnp.iinfo(jnp.int32).max
    y1 = jnp.min(jnp.where(any_row, rows, big), axis=1)
    y2 = jnp.max(jnp.where(any_row, rows, -1), axis=1) + 1
    x1 = jnp.min(jnp.where(any_col, cols, big), axis=1)
    x2 = jnp.max(jnp.where(any_col, cols, -1), axis=1) + 1
    valid = jnp.any(any_row, axis=1)
    box = jnp.stack([y1, x1, y2, x2], axis=-1).astype(jnp.float32)
    return jnp.where(valid[:, None], box, 0.0)
