"""Pyramid anchor generation.

Re-implements the semantics of the reference's ``generate_anchors`` /
``generate_pyramid_anchors`` (utils.py:54-111) and ``compute_backbone_shapes``
(utils.py:725-735). Anchors are a compile-time constant for a fixed image
shape, so they are generated **once on host in numpy** and closed over by the
jitted forward function as a constant — the TPU-native replacement for the
reference's non-trainable ``tf.Variable`` cache (``AnchorsLayer``,
mrcnn_layers.py:105-143).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig


def compute_backbone_shapes(
    image_shape: Sequence[int], strides: Sequence[int]
) -> Tuple[Tuple[int, int], ...]:
    """Spatial [H, W] of each pyramid level (reference utils.py:725-735)."""
    h, w = int(image_shape[0]), int(image_shape[1])
    return tuple((int(np.ceil(h / s)), int(np.ceil(w / s))) for s in strides)


def generate_level_anchors(
    scale: float,
    ratios: Sequence[float],
    feature_shape: Sequence[int],
    feature_stride: int,
    anchor_stride: int = 1,
) -> np.ndarray:
    """All anchors for one pyramid level, pixel coords ``[N, (y1,x1,y2,x2)]``.

    Semantics of reference ``generate_anchors`` (utils.py:54-90): one scale per
    level, ``len(ratios)`` shapes per cell, anchor centered on
    ``cell_index * feature_stride``. Ordering is (row, col, ratio) —
    row-major over the feature map with ratios fastest — which must match the
    RPN head's reshape ordering exactly.
    """
    ratios = np.asarray(ratios, dtype=np.float64)
    heights = scale / np.sqrt(ratios)
    widths = scale * np.sqrt(ratios)

    shifts_y = np.arange(0, feature_shape[0], anchor_stride) * feature_stride
    shifts_x = np.arange(0, feature_shape[1], anchor_stride) * feature_stride
    shifts_x_grid, shifts_y_grid = np.meshgrid(shifts_x, shifts_y)

    box_widths, box_centers_x = np.meshgrid(widths, shifts_x_grid)
    box_heights, box_centers_y = np.meshgrid(heights, shifts_y_grid)

    box_centers = np.stack([box_centers_y, box_centers_x], axis=2).reshape(-1, 2)
    box_sizes = np.stack([box_heights, box_widths], axis=2).reshape(-1, 2)

    return np.concatenate(
        [box_centers - 0.5 * box_sizes, box_centers + 0.5 * box_sizes], axis=1
    ).astype(np.float32)


def generate_pyramid_anchors(
    scales: Sequence[float],
    ratios: Sequence[float],
    feature_shapes: Sequence[Sequence[int]],
    feature_strides: Sequence[int],
    anchor_stride: int = 1,
) -> np.ndarray:
    """Concat anchors over levels (reference utils.py:93-111): ``[A, 4]`` pixel
    coords, levels ordered P2..P6 (finest first)."""
    return np.concatenate(
        [
            generate_level_anchors(
                scales[i], ratios, feature_shapes[i], feature_strides[i], anchor_stride
            )
            for i in range(len(scales))
        ],
        axis=0,
    )


def norm_boxes_np(boxes: np.ndarray, shape: Sequence[int]) -> np.ndarray:
    """Numpy twin of ops.boxes.norm_boxes (reference utils.py:691-705)."""
    h, w = shape[0], shape[1]
    scale = np.array([h - 1, w - 1, h - 1, w - 1], dtype=np.float32)
    shift = np.array([0.0, 0.0, 1.0, 1.0], dtype=np.float32)
    return ((boxes - shift) / scale).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _cached_anchors(
    image_hw: Tuple[int, int],
    scales: Tuple[float, ...],
    ratios: Tuple[float, ...],
    strides: Tuple[int, ...],
    anchor_stride: int,
) -> np.ndarray:
    feature_shapes = compute_backbone_shapes(image_hw, strides)
    pix = generate_pyramid_anchors(scales, ratios, feature_shapes, strides, anchor_stride)
    return norm_boxes_np(pix, image_hw)


def get_anchors(config: MaskRCNNConfig, image_shape=None) -> np.ndarray:
    """Normalized pyramid anchors ``[A, 4]`` for a config (cached per shape)."""
    hw = tuple((image_shape or config.image_shape)[:2])
    return _cached_anchors(
        hw,
        tuple(float(s) for s in config.rpn_anchor_scales),
        tuple(float(r) for r in config.rpn_anchor_ratios),
        tuple(config.backbone_strides),
        config.rpn_anchor_stride,
    )
