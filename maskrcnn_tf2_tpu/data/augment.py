"""Host-side training augmentation (numpy/cv2).

Capability-parity with the reference's albumentations pipeline
(``get_training_augmentation``, src/preprocess/augmentation.py:4-79):
flips, rotation, gaussian blur, multiplicative noise, channel shuffle —
applied jointly to the image and its per-instance masks (masks always
nearest/binary, reference's mask round-clip behavior). albumentations is not
available in this environment; these are direct implementations.
"""

from __future__ import annotations

import random
from typing import Callable, Tuple

import cv2
import numpy as np


def _rotate(image: np.ndarray, masks: np.ndarray, angle: float):
    h, w = image.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    image = cv2.warpAffine(image, m, (w, h), flags=cv2.INTER_LINEAR)
    if masks.shape[-1]:
        rot = cv2.warpAffine(
            masks.astype(np.uint8), m, (w, h), flags=cv2.INTER_NEAREST
        )
        masks = (rot if rot.ndim == 3 else rot[:, :, None]).astype(bool)
    return image, masks


def get_training_augmentation(
    extended: bool = False,
    hflip_prob: float = 0.5,
    vflip_prob: float = 0.0,
    rotate_prob: float = 0.2,
    blur_prob: float = 0.2,
    noise_prob: float = 0.2,
    channel_shuffle_prob: float = 0.1,
) -> Callable[[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]]:
    """Returns ``augment_fn(image [H,W,3] uint8, masks [H,W,N] bool)``."""

    def augment(image: np.ndarray, masks: np.ndarray):
        if random.random() < hflip_prob:
            image = image[:, ::-1]
            masks = masks[:, ::-1]
        if random.random() < vflip_prob:
            image = image[::-1]
            masks = masks[::-1]
        if random.random() < rotate_prob:
            # reference Rotate(limit=(10, 270)) — augmentation.py
            image, masks = _rotate(image, masks, random.uniform(10, 270))
        if random.random() < blur_prob:
            k = random.choice([3, 5])
            image = cv2.GaussianBlur(image, (k, k), 0)
        if random.random() < noise_prob:
            # MultiplicativeNoise(multiplier=(0.9, 1.1))
            mult = np.random.uniform(0.9, 1.1, size=image.shape).astype(np.float32)
            image = np.clip(image.astype(np.float32) * mult, 0, 255).astype(
                image.dtype
            )
        if extended and random.random() < channel_shuffle_prob:
            image = image[:, :, np.random.permutation(3)]
        return np.ascontiguousarray(image), np.ascontiguousarray(masks)

    return augment
