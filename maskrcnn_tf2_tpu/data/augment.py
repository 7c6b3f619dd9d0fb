"""Host-side training augmentation (numpy/cv2).

Capability-parity with the reference's albumentations pipeline
(``get_training_augmentation``, src/preprocess/augmentation.py:4-79):
flips, rotation, gaussian blur, multiplicative noise, channel shuffle, the
optional ``weather`` set (snow / rain / fog / sun flare,
augmentation.py:30-38) and the optional ``extend_aug`` set
(shift-scale, additive gaussian noise, perspective, CLAHE, brightness,
gamma, sharpen, blur, motion blur, contrast, HSV shift,
augmentation.py:41-55) — geometric transforms applied jointly to the image
and its per-instance masks (masks always nearest/binary, reference's mask
round-clip behavior). albumentations is not available in this environment;
these are direct implementations.
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
    masks = _warp_masks(masks, m, (w, h))
    return image, masks


def _warp_masks(masks: np.ndarray, m: np.ndarray, wh):
    if not masks.shape[-1]:
        return masks
    warped = cv2.warpAffine(masks.astype(np.uint8), m, wh, flags=cv2.INTER_NEAREST)
    return (warped if warped.ndim == 3 else warped[:, :, None]).astype(bool)


def _to_u8(image: np.ndarray) -> np.ndarray:
    return np.clip(image, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# weather set (reference augmentation.py:30-38: RandomSnow / RandomRain /
# RandomFog / RandomSunFlare)
# ---------------------------------------------------------------------------

def _snow(image: np.ndarray) -> np.ndarray:
    """Brighten a random low-value band toward white (RandomSnow-style)."""
    img = image.astype(np.float32)
    hls = cv2.cvtColor(_to_u8(img), cv2.COLOR_RGB2HLS).astype(np.float32)
    thresh = random.uniform(100, 150)
    boost = random.uniform(1.5, 2.5)
    light = hls[..., 1]
    hls[..., 1] = np.where(light < thresh, np.minimum(light * boost, 255), light)
    return cv2.cvtColor(hls.astype(np.uint8), cv2.COLOR_HLS2RGB)


def _rain(image: np.ndarray) -> np.ndarray:
    """Slanted bright streaks + slight darkening (RandomRain-style)."""
    h, w = image.shape[:2]
    img = (image.astype(np.float32) * random.uniform(0.7, 0.9))
    n_drops = int(h * w / 600)
    slant = random.randint(-10, 10)
    length = random.randint(5, 12)
    xs = np.random.randint(0, w, n_drops)
    ys = np.random.randint(0, h, n_drops)
    overlay = img.copy()
    for x, y in zip(xs, ys):
        cv2.line(overlay, (x, y), (x + slant, y + length), (200, 200, 200), 1)
    return _to_u8(cv2.blur(overlay, (3, 3)))


def _fog(image: np.ndarray) -> np.ndarray:
    """Blend toward gray with a smooth random intensity field (RandomFog)."""
    h, w = image.shape[:2]
    coef = random.uniform(0.2, 0.45)
    field = cv2.GaussianBlur(
        np.random.rand(max(h // 8, 1), max(w // 8, 1)).astype(np.float32), (0, 0), 3
    )
    field = cv2.resize(field, (w, h))[..., None] * coef + coef * 0.5
    img = image.astype(np.float32)
    return _to_u8(img * (1 - field) + 255.0 * field)


def _sun_flare(image: np.ndarray) -> np.ndarray:
    """Radial bright flare at a random point (RandomSunFlare-style)."""
    h, w = image.shape[:2]
    cx, cy = random.randint(0, w - 1), random.randint(0, h // 2)
    radius = random.randint(min(h, w) // 6, min(h, w) // 3)
    yy, xx = np.mgrid[0:h, 0:w]
    d2 = (xx - cx) ** 2 + (yy - cy) ** 2
    glow = np.exp(-d2 / (2.0 * (radius / 2.0) ** 2))[..., None]
    img = image.astype(np.float32)
    return _to_u8(img + glow * random.uniform(120, 220))


# ---------------------------------------------------------------------------
# extended set (reference augmentation.py:41-55)
# ---------------------------------------------------------------------------

def _shift_scale(image: np.ndarray, masks: np.ndarray):
    """ShiftScaleRotate(scale_limit=0.5, rotate_limit=0, shift_limit=0.1,
    border_mode=0) — scale + shift only, zero border."""
    h, w = image.shape[:2]
    scale = 1.0 + random.uniform(-0.5, 0.5)
    tx = random.uniform(-0.1, 0.1) * w
    ty = random.uniform(-0.1, 0.1) * h
    m = np.array(
        [[scale, 0, tx + (1 - scale) * w / 2], [0, scale, ty + (1 - scale) * h / 2]],
        np.float32,
    )
    image = cv2.warpAffine(image, m, (w, h), flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_CONSTANT)
    return image, _warp_masks(masks, m, (w, h))


def _perspective(image: np.ndarray, masks: np.ndarray):
    """IAAPerspective-style random 4-point perspective jitter."""
    h, w = image.shape[:2]
    d = 0.05
    src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
    dst = (src + np.random.uniform(-d, d, (4, 2)) * [w, h]).astype(np.float32)
    m = cv2.getPerspectiveTransform(src, dst)
    image = cv2.warpPerspective(image, m, (w, h), flags=cv2.INTER_LINEAR)
    if masks.shape[-1]:
        warped = cv2.warpPerspective(
            masks.astype(np.uint8), m, (w, h), flags=cv2.INTER_NEAREST
        )
        masks = (warped if warped.ndim == 3 else warped[:, :, None]).astype(bool)
    return image, masks


def _clahe(image: np.ndarray) -> np.ndarray:
    lab = cv2.cvtColor(image, cv2.COLOR_RGB2LAB)
    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    lab[..., 0] = clahe.apply(lab[..., 0])
    return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)


def _gamma(image: np.ndarray) -> np.ndarray:
    g = random.uniform(0.7, 1.4)
    lut = (np.linspace(0, 1, 256) ** g * 255).astype(np.uint8)
    return lut[image]


def _sharpen(image: np.ndarray) -> np.ndarray:
    blur = cv2.GaussianBlur(image.astype(np.float32), (0, 0), 1.0)
    alpha = random.uniform(0.3, 0.7)
    return _to_u8(image.astype(np.float32) * (1 + alpha) - blur * alpha)


def _motion_blur(image: np.ndarray) -> np.ndarray:
    k = 3
    kernel = np.zeros((k, k), np.float32)
    if random.random() < 0.5:
        kernel[k // 2, :] = 1.0 / k
    else:
        kernel[:, k // 2] = 1.0 / k
    return cv2.filter2D(image, -1, kernel)


def _brightness_contrast(image: np.ndarray) -> np.ndarray:
    alpha = 1.0 + random.uniform(-0.2, 0.2)  # RandomContrast
    beta = random.uniform(-0.2, 0.2) * 255  # RandomBrightness
    return _to_u8(image.astype(np.float32) * alpha + beta)


def _hsv_shift(image: np.ndarray) -> np.ndarray:
    hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV).astype(np.int16)
    hsv[..., 0] = (hsv[..., 0] + random.randint(-10, 10)) % 180
    hsv[..., 1] = np.clip(hsv[..., 1] + random.randint(-20, 20), 0, 255)
    hsv[..., 2] = np.clip(hsv[..., 2] + random.randint(-20, 20), 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def get_training_augmentation(
    extended: bool = False,
    weather: bool = False,
    hflip_prob: float = 0.5,
    vflip_prob: float = 0.0,
    rotate_prob: float = 0.2,
    blur_prob: float = 0.2,
    noise_prob: float = 0.2,
    channel_shuffle_prob: float = 0.1,
    weather_prob: float = 0.3,
    extended_prob: float = 0.5,
) -> Callable[[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]]:
    """Returns ``augment_fn(image [H,W,3] uint8, masks [H,W,N] bool)``.

    ``weather`` / ``extended`` mirror the reference's optional
    ``weather`` / ``extend_aug`` flags (augmentation.py:4-10): each draws
    ONE transform from its set per application (albumentations OneOf).
    """

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
        if weather and random.random() < weather_prob:
            image = np.ascontiguousarray(image)
            image = random.choice((_snow, _rain, _fog, _sun_flare))(image)
        if extended and random.random() < extended_prob:
            image = np.ascontiguousarray(image)
            op = random.choice(
                (
                    "shift_scale",
                    "perspective",
                    _clahe,
                    _gamma,
                    _sharpen,
                    _motion_blur,
                    _brightness_contrast,
                    _hsv_shift,
                )
            )
            if op == "shift_scale":
                image, masks = _shift_scale(image, np.ascontiguousarray(masks))
            elif op == "perspective":
                image, masks = _perspective(image, np.ascontiguousarray(masks))
            else:
                image = op(image)
        return np.ascontiguousarray(image), np.ascontiguousarray(masks)

    return augment
