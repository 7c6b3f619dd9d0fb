import numpy as np
import jax.numpy as jnp

from maskrcnn_tf2_tpu.ops.image import crop_and_resize
from maskrcnn_tf2_tpu.ops.roi_align import pyramid_roi_align, roi_level_assignment


def crop_and_resize_oracle(images, boxes, box_idx, crop):
    """Direct numpy port of tf.image.crop_and_resize bilinear semantics."""
    k, h, w, c = images.shape
    ph, pw = crop
    out = np.zeros((len(boxes), ph, pw, c), np.float32)
    for r, (box, bi) in enumerate(zip(boxes, box_idx)):
        y1, x1, y2, x2 = box
        for i in range(ph):
            in_y = (
                y1 * (h - 1) + i * (y2 - y1) * (h - 1) / (ph - 1)
                if ph > 1
                else 0.5 * (y1 + y2) * (h - 1)
            )
            if in_y < 0 or in_y > h - 1:
                continue
            for j in range(pw):
                in_x = (
                    x1 * (w - 1) + j * (x2 - x1) * (w - 1) / (pw - 1)
                    if pw > 1
                    else 0.5 * (x1 + x2) * (w - 1)
                )
                if in_x < 0 or in_x > w - 1:
                    continue
                ty, tx = int(np.floor(in_y)), int(np.floor(in_x))
                by, bx = min(ty + 1, h - 1), min(tx + 1, w - 1)
                ly, lx = in_y - ty, in_x - tx
                top = images[bi, ty, tx] * (1 - lx) + images[bi, ty, bx] * lx
                bot = images[bi, by, tx] * (1 - lx) + images[bi, by, bx] * lx
                out[r, i, j] = top * (1 - ly) + bot * ly
    return out


def test_crop_and_resize_vs_oracle(rng):
    images = rng.randn(3, 24, 20, 5).astype(np.float32)
    boxes = np.array(
        [
            [0.1, 0.2, 0.6, 0.9],
            [0.0, 0.0, 1.0, 1.0],
            [-0.1, 0.3, 0.5, 1.2],  # partially out of range -> zeros there
            [0.45, 0.45, 0.55, 0.55],
        ],
        np.float32,
    )
    box_idx = np.array([0, 1, 2, 0], np.int32)
    for crop in [(7, 7), (14, 14), (1, 1), (3, 5)]:
        got = np.asarray(
            crop_and_resize(jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(box_idx), crop)
        )
        want = crop_and_resize_oracle(images, boxes, box_idx, crop)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_level_assignment():
    # At 1024x1024 with denominator 224: a 224x224 box -> level 4 (index 2).
    img_area = 1024.0 * 1024.0
    boxes = jnp.asarray(
        [
            [0.0, 0.0, 224 / 1024, 224 / 1024],
            [0.0, 0.0, 1.0, 1.0],  # full image -> top level
            [0.0, 0.0, 0.01, 0.01],  # tiny -> bottom level
            [0.0, 0.0, 0.0, 0.0],  # padding
        ]
    )
    lv = np.asarray(roi_level_assignment(boxes, img_area, 4, denominator=224.0))
    assert list(lv) == [2, 3, 0, 0]


def test_pyramid_roi_align_matches_per_level_crops(rng):
    b, c, p = 2, 6, 7
    shapes = [(64, 64), (32, 32), (16, 16), (8, 8)]
    feats = [rng.randn(b, h, w, c).astype(np.float32) for h, w in shapes]
    n = 12
    y1 = rng.uniform(0, 0.6, (b, n))
    x1 = rng.uniform(0, 0.6, (b, n))
    hh = rng.uniform(0.02, 0.4, (b, n))
    ww = rng.uniform(0.02, 0.4, (b, n))
    boxes = np.stack([y1, x1, y1 + hh, x1 + ww], axis=-1).astype(np.float32)
    image_shape = (256, 256, 3)

    got = np.asarray(
        pyramid_roi_align([jnp.asarray(f) for f in feats], jnp.asarray(boxes), p, image_shape)
    )

    levels = np.asarray(
        roi_level_assignment(jnp.asarray(boxes), 256.0 * 256.0, 4)
    )
    for bi in range(b):
        for ni in range(n):
            lv = levels[bi, ni]
            want = crop_and_resize_oracle(
                feats[lv][bi : bi + 1], boxes[bi, ni : ni + 1], [0], (p, p)
            )[0]
            np.testing.assert_allclose(got[bi, ni], want, rtol=1e-3, atol=1e-3)


def test_pyramid_roi_align_zero_padding_rois(rng):
    feats = [jnp.asarray(rng.randn(1, s, s, 4).astype(np.float32)) for s in (32, 16, 8, 4)]
    boxes = np.zeros((1, 5, 4), np.float32)
    boxes[0, 0] = [0.1, 0.1, 0.5, 0.5]
    out = np.asarray(pyramid_roi_align(feats, jnp.asarray(boxes), 7, (128, 128, 3)))
    assert out.shape == (1, 5, 7, 7, 4)
    assert np.isfinite(out).all()


def test_crop_and_resize_separable_matches_gather(rng):
    from maskrcnn_tf2_tpu.ops.image import crop_and_resize_separable

    masks = (rng.rand(5, 33, 29) > 0.5).astype(np.float32)
    boxes = np.array(
        [
            [0.1, 0.2, 0.6, 0.9],
            [0.0, 0.0, 1.0, 1.0],
            [-0.1, 0.3, 0.5, 1.2],
            [0.45, 0.45, 0.55, 0.55],
        ],
        np.float32,
    )
    box_idx = np.array([0, 3, 2, 4], np.int32)
    for crop in [(28, 28), (7, 5), (1, 1)]:
        want = crop_and_resize(
            jnp.asarray(masks[..., None]), jnp.asarray(boxes), jnp.asarray(box_idx), crop
        )[..., 0]
        got = crop_and_resize_separable(
            jnp.asarray(masks), jnp.asarray(boxes), jnp.asarray(box_idx), crop
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_pyramid_roi_align_matmul_matches_gather(rng):
    from maskrcnn_tf2_tpu.ops.roi_align import (
        pyramid_roi_align_gather,
        pyramid_roi_align_matmul,
    )

    b, c = 2, 8
    shapes = [(32, 32), (16, 16), (8, 8), (4, 4)]
    feats = [jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)) for h, w in shapes]
    n = 10
    y1 = rng.uniform(0, 0.6, (b, n))
    x1 = rng.uniform(0, 0.6, (b, n))
    hh = rng.uniform(0.05, 0.4, (b, n))
    ww = rng.uniform(0.05, 0.4, (b, n))
    boxes = np.stack([y1, x1, y1 + hh, x1 + ww], axis=-1).astype(np.float32)
    boxes[0, -1] = 0  # padding roi
    for p in (7, 14):
        a = np.asarray(pyramid_roi_align_gather(feats, jnp.asarray(boxes), p, (128, 128, 3)))
        m = np.asarray(pyramid_roi_align_matmul(feats, jnp.asarray(boxes), p, (128, 128, 3)))
        # matmul path intentionally runs its contractions at MXU/bf16-input
        # precision — compare at bf16 tolerance
        np.testing.assert_allclose(m, a, rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(m[0, -1], 0.0)  # padding roi pools zeros


def test_pallas_roi_align_on_tpu_if_available():
    import os

    import jax as _jax

    if _jax.devices()[0].platform not in ("tpu", "axon"):
        import pytest

        pytest.skip("needs TPU")
    from maskrcnn_tf2_tpu.kernels.roi_align_pallas import pyramid_roi_align_pallas
    from maskrcnn_tf2_tpu.ops.roi_align import pyramid_roi_align_gather

    rng_ = np.random.RandomState(0)
    feats = [jnp.asarray(rng_.randn(1, s, s, 128).astype(np.float32)) for s in (64, 32, 16, 8)]
    # mixed aspects INCLUDING extreme slivers: the two-mode kernel is exact
    # for all of them (patch mode for compact boxes, strip mode otherwise)
    y1 = rng_.uniform(0, 0.5, (1, 8)); x1 = rng_.uniform(0, 0.5, (1, 8))
    hw = rng_.uniform(0.08, 0.3, (1, 8))
    boxes = np.stack([y1, x1, y1 + hw, x1 + hw * rng_.uniform(0.7, 1.4)], -1).astype(np.float32)
    boxes[0, 5] = [0.0, 0.4, 1.0, 0.43]  # 33:1 tall sliver
    boxes[0, 6] = [0.4, 0.0, 0.43, 1.0]  # 1:33 wide sliver
    boxes[0, 7] = [0.0, 0.0, 1.0, 1.0]  # full frame
    got = np.asarray(pyramid_roi_align_pallas(feats, jnp.asarray(boxes), 7, (256, 256, 3)))
    want = np.asarray(pyramid_roi_align_gather(feats, jnp.asarray(boxes), 7, (256, 256, 3)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
