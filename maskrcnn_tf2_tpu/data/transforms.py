"""Host-side numpy image/mask geometry for the data pipeline.

Same semantics as the reference's ``resize_image``/``resize_mask``/
``minimize_mask``/``expand_mask`` (utils.py:361-465, 170-190, 958-1005) with
cv2 instead of skimage/scipy (neither is guaranteed in this environment).
Only the cheap per-image decode/resize happens on host; normalization,
augmentation and RPN-target building run on device
(``maskrcnn_tf2_tpu.data.device_pipeline``).
"""

from __future__ import annotations

import random
from typing import Optional

import cv2
import numpy as np


def resize_image(
    image: np.ndarray,
    min_dim: Optional[int] = None,
    max_dim: Optional[int] = None,
    min_scale: Optional[float] = None,
    mode: str = "square",
):
    """Aspect-preserving resize + pad. Returns (image, window, scale, padding,
    crop) with the reference's contract (utils.py:361-465): ``window`` is the
    (y1, x1, y2, x2) pixel region holding the actual image inside the padding.
    """
    image_dtype = image.dtype
    h, w = image.shape[:2]
    window = (0, 0, h, w)
    scale = 1.0
    padding = [(0, 0), (0, 0), (0, 0)]
    crop = None

    if mode == "none":
        return image, window, scale, padding, crop

    if min_dim:
        scale = max(1.0, min_dim / min(h, w))
    if min_scale and scale < min_scale:
        scale = min_scale
    if max_dim and mode == "square":
        image_max = max(h, w)
        if round(image_max * scale) > max_dim:
            scale = max_dim / image_max

    if scale != 1.0:
        image = cv2.resize(
            image,
            (round(w * scale), round(h * scale)),  # cv2 takes (W, H)
            interpolation=cv2.INTER_LINEAR,
        )

    if mode == "square":
        h, w = image.shape[:2]
        top_pad = (max_dim - h) // 2
        bottom_pad = max_dim - h - top_pad
        left_pad = (max_dim - w) // 2
        right_pad = max_dim - w - left_pad
        padding = [(top_pad, bottom_pad), (left_pad, right_pad), (0, 0)]
        image = np.pad(image, padding[: image.ndim], mode="constant")
        window = (top_pad, left_pad, h + top_pad, w + left_pad)
    elif mode == "pad64":
        h, w = image.shape[:2]
        if min_dim:
            assert min_dim % 64 == 0, "min_dim must be a multiple of 64"
        top_pad = bottom_pad = left_pad = right_pad = 0
        if h % 64 > 0:
            max_h = h - (h % 64) + 64
            top_pad = (max_h - h) // 2
            bottom_pad = max_h - h - top_pad
        if w % 64 > 0:
            max_w = w - (w % 64) + 64
            left_pad = (max_w - w) // 2
            right_pad = max_w - w - left_pad
        padding = [(top_pad, bottom_pad), (left_pad, right_pad), (0, 0)]
        image = np.pad(image, padding[: image.ndim], mode="constant")
        window = (top_pad, left_pad, h + top_pad, w + left_pad)
    elif mode == "crop":
        h, w = image.shape[:2]
        y = random.randint(0, h - min_dim)
        x = random.randint(0, w - min_dim)
        crop = (y, x, min_dim, min_dim)
        image = image[y : y + min_dim, x : x + min_dim]
        window = (0, 0, min_dim, min_dim)
    else:
        raise ValueError(f"resize mode '{mode}' not supported")
    return image.astype(image_dtype), window, scale, padding, crop


def resize_mask(mask: np.ndarray, scale: float, padding, crop=None) -> np.ndarray:
    """Resize instance masks [H, W, N] with the image's scale/padding
    (reference utils resize_mask semantics; nearest-neighbor)."""
    h, w = mask.shape[:2]
    if scale != 1.0:
        mask = cv2.resize(
            mask.astype(np.uint8),
            (round(w * scale), round(h * scale)),
            interpolation=cv2.INTER_NEAREST,
        )
        if mask.ndim == 2:
            mask = mask[:, :, None]
    if crop is not None:
        y, x, ch, cw = crop
        mask = mask[y : y + ch, x : x + cw]
    else:
        mask = np.pad(mask, padding[: mask.ndim], mode="constant")
    return mask.astype(bool)


def extract_bboxes(mask: np.ndarray) -> np.ndarray:
    """Tight pixel boxes from masks [H, W, N] -> [N, 4] (utils.py:25-51)."""
    boxes = np.zeros([mask.shape[-1], 4], dtype=np.int32)
    for i in range(mask.shape[-1]):
        m = mask[:, :, i]
        rows = np.any(m, axis=1)
        cols = np.any(m, axis=0)
        if rows.any():
            y1, y2 = np.where(rows)[0][[0, -1]]
            x1, x2 = np.where(cols)[0][[0, -1]]
            boxes[i] = [y1, x1, y2 + 1, x2 + 1]
    return boxes


def minimize_mask(bbox: np.ndarray, mask: np.ndarray, mini_shape) -> np.ndarray:
    """Crop masks to their boxes and resize to mini_shape (utils.py:958-979)."""
    mini = np.zeros(mini_shape + (mask.shape[-1],), dtype=bool)
    for i in range(mask.shape[-1]):
        m = mask[:, :, i].astype(np.uint8)
        y1, x1, y2, x2 = bbox[i][:4].astype(int)
        if y2 <= y1 or x2 <= x1:
            continue
        crop = m[y1:y2, x1:x2]
        resized = cv2.resize(
            crop, (mini_shape[1], mini_shape[0]), interpolation=cv2.INTER_NEAREST
        )
        mini[:, :, i] = resized.astype(bool)
    return mini


def expand_mask(bbox: np.ndarray, mini_mask: np.ndarray, image_shape) -> np.ndarray:
    """Inverse of minimize_mask (utils.py:982-1005)."""
    mask = np.zeros(tuple(image_shape[:2]) + (mini_mask.shape[-1],), dtype=bool)
    for i in range(mask.shape[-1]):
        y1, x1, y2, x2 = bbox[i][:4].astype(int)
        if y2 <= y1 or x2 <= x1:
            continue
        m = mini_mask[:, :, i].astype(np.uint8)
        resized = cv2.resize(m, (x2 - x1, y2 - y1), interpolation=cv2.INTER_NEAREST)
        mask[y1:y2, x1:x2, i] = resized.astype(bool)
    return mask


def unmold_mask(mask: np.ndarray, bbox, image_shape) -> np.ndarray:
    """Paste a low-res float mask into full resolution with 0.5 threshold
    (reference utils.py:938-955)."""
    y1, x1, y2, x2 = (int(v) for v in bbox)
    full = np.zeros(tuple(image_shape[:2]), dtype=bool)
    if y2 <= y1 or x2 <= x1:
        return full
    m = cv2.resize(
        mask.astype(np.float32), (x2 - x1, y2 - y1), interpolation=cv2.INTER_LINEAR
    )
    full[y1:y2, x1:x2] = m >= 0.5
    return full
