import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.data.augment import get_training_augmentation
from maskrcnn_tf2_tpu.data.coco import mask_to_rle, rle_to_mask
from maskrcnn_tf2_tpu.data.dataset import load_image_gt
from maskrcnn_tf2_tpu.data.loader import DataLoader, prefetch
from maskrcnn_tf2_tpu.data.synthetic import SyntheticShapesDataset
from maskrcnn_tf2_tpu.data.transforms import (
    extract_bboxes,
    minimize_mask,
    expand_mask,
    resize_image,
    resize_mask,
    unmold_mask,
)

CFG = MaskRCNNConfig(
    image_shape=(128, 128, 3),
    image_min_dim=64,
    image_max_dim=128,
    rpn_anchor_scales=(8, 16, 32, 64, 128),
    num_classes=4,
    max_gt_instances=6,
    batch_size=2,
)


def make_dataset(n=8):
    ds = SyntheticShapesDataset()
    ds.load_shapes(n, 96, 120)
    ds.prepare()
    return ds


def test_resize_image_square():
    img = np.random.randint(0, 255, (60, 100, 3), np.uint8)
    out, window, scale, padding, crop = resize_image(img, 64, 128, mode="square")
    assert out.shape == (128, 128, 3)
    # scale raises min dim to 64 (64/60); max-dim cap not triggered (107<=128)
    assert abs(scale - 64 / 60) < 1e-6
    y1, x1, y2, x2 = window
    assert (y2 - y1, x2 - x1) == (64, round(100 * scale))
    # content preserved inside window, zero padding outside
    assert out[:y1].sum() == 0 and out[y2:].sum() == 0


def test_resize_image_pad64():
    img = np.random.randint(0, 255, (60, 100, 3), np.uint8)
    out, window, scale, _, _ = resize_image(img, None, None, mode="pad64")
    assert out.shape[0] % 64 == 0 and out.shape[1] % 64 == 0


def test_mask_roundtrip_mini():
    masks = np.zeros((64, 64, 2), bool)
    masks[10:30, 12:40, 0] = True
    masks[40:60, 5:20, 1] = True
    boxes = extract_bboxes(masks)
    np.testing.assert_array_equal(boxes[0], [10, 12, 30, 40])
    mini = minimize_mask(boxes, masks, (28, 28))
    back = expand_mask(boxes, mini, (64, 64))
    # IoU of roundtrip should be high
    inter = (back & masks).sum()
    union = (back | masks).sum()
    assert inter / union > 0.9


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = rng.rand(37, 23) > 0.6
    rle = mask_to_rle(mask)
    back = rle_to_mask(rle, 37, 23)
    np.testing.assert_array_equal(back, mask)


def test_load_image_gt_contract():
    ds = make_dataset()
    s = load_image_gt(ds, CFG, 0)
    assert s["image"].shape == (128, 128, 3)
    assert s["gt_class_ids"].shape == (6,)
    assert s["gt_boxes"].shape == (6, 4)
    n = (s["gt_class_ids"] > 0).sum()
    assert n >= 1
    # normalized boxes within [0, 1]
    assert s["gt_boxes"].min() >= 0 and s["gt_boxes"].max() <= 1
    # meta vector length
    assert s["image_meta"].shape == (CFG.meta_size,)
    # masks align with boxes: mask nonzero
    assert s["gt_masks"][:n].sum() > 0


def test_loader_batches_and_prefetch():
    ds = make_dataset(9)
    dl = DataLoader(ds, CFG, shuffle=True)
    batches = list(prefetch(dl.epoch(), size=2))
    assert len(batches) >= 3  # 9 images, batch 2, maybe some skipped
    b = batches[0]
    assert b["images"].shape == (2, 128, 128, 3)
    assert b["images"].dtype == np.float32
    assert b["gt_masks"].shape[:2] == (2, 6)


def test_augmentation_preserves_mask_alignment():
    ds = make_dataset()
    aug = get_training_augmentation(hflip_prob=1.0, rotate_prob=0.0, blur_prob=0.0, noise_prob=0.0)
    img = ds.load_image(0)
    masks, _ = ds.load_mask(0)
    aimg, amasks = aug(img, masks)
    # double flip restores
    np.testing.assert_array_equal(aimg[:, ::-1], img)
    np.testing.assert_array_equal(amasks[:, ::-1], masks)


def test_unmold_mask():
    m = np.ones((28, 28), np.float32)
    full = unmold_mask(m, (10, 20, 30, 50), (64, 64, 3))
    assert full[10:30, 20:50].all()
    assert full.sum() == 20 * 30


def test_augmentation_weather_extended_sets():
    """Weather + extended sets (reference augmentation.py:30-55): every
    transform keeps image shape/dtype and mask alignment/dtype."""
    rs = np.random.RandomState(5)
    image = rs.randint(0, 255, (96, 80, 3), np.uint8)
    masks = np.zeros((96, 80, 2), bool)
    masks[20:50, 10:40, 0] = True
    masks[60:90, 50:70, 1] = True
    fn = get_training_augmentation(
        extended=True,
        weather=True,
        hflip_prob=0.5,
        rotate_prob=0.5,
        blur_prob=0.5,
        noise_prob=0.5,
        channel_shuffle_prob=0.5,
        weather_prob=1.0,
        extended_prob=1.0,
    )
    import random as _random

    for seed in range(20):  # covers every OneOf branch across seeds
        _random.seed(seed)
        np.random.seed(seed)
        img2, m2 = fn(image, masks)
        assert img2.shape == image.shape and img2.dtype == np.uint8
        assert m2.shape == masks.shape and m2.dtype == bool


def test_maxmin_normalization():
    """config.normalization='maxmin' — reference preprocess.py:520-530:
    x -= min; x /= max."""
    import jax.numpy as jnp

    from maskrcnn_tf2_tpu.ops.image import maxmin_normalize_image

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(maxmin_normalize_image(jnp.asarray(img)))
    for b in range(2):
        ref = img[b] - img[b].min()
        ref = ref / ref.max()
        np.testing.assert_allclose(got[b], ref, atol=1e-6)
    # knob is validated
    import pytest

    with pytest.raises(AssertionError):
        MaskRCNNConfig(normalization="bogus")


def test_sample_cache_roundtrip_and_invalidation(tmp_path):
    """The npz sample cache must (a) actually write+hit (the tmp-file write
    crashed when np.savez appended .npz to the rename source), (b) return
    identical samples, and (c) miss when a consumed config knob changes."""
    ds = make_dataset(4)
    base = dict(
        image_shape=(128, 128, 3), image_min_dim=128, image_max_dim=128,
        batch_size=2, num_classes=4, max_gt_instances=6,
        sample_cache_dir=str(tmp_path),
    )
    cfg = MaskRCNNConfig(**base)
    cold = list(DataLoader(ds, cfg, shuffle=False).epoch())
    tags = [p for p in tmp_path.iterdir() if p.is_dir()]
    assert len(tags) == 1 and len(list(tags[0].glob("*.npz"))) == 4
    assert not list(tags[0].glob("*.tmp*"))  # atomic rename cleaned up
    warm = list(DataLoader(ds, cfg, shuffle=False).epoch())
    for cb, wb in zip(cold, warm):
        for k in cb:
            np.testing.assert_array_equal(cb[k], wb[k])
    # changing a knob the cached sample depends on -> new fingerprint dir
    cfg2 = MaskRCNNConfig(**{**base, "image_shape": (96, 96, 3),
                             "image_min_dim": 96, "image_max_dim": 96})
    list(DataLoader(ds, cfg2, shuffle=False).epoch())
    assert len([p for p in tmp_path.iterdir() if p.is_dir()]) == 2
    # a DIFFERENT dataset of the same length/config must also miss
    ds2 = SyntheticShapesDataset()
    ds2.load_shapes(4, 96, 120, seed=99)
    ds2.prepare()
    list(DataLoader(ds2, cfg, shuffle=False).epoch())
    assert len([p for p in tmp_path.iterdir() if p.is_dir()]) == 3


def test_empty_host_shard_with_fixed_steps_raises():
    """An empty per-host shard must fail loudly, not busy-loop forever
    (index_stream cycles 'while True' when fixed_steps is set)."""
    import pytest

    ds = make_dataset(2)
    cfg = MaskRCNNConfig(
        image_shape=(128, 128, 3), image_min_dim=128, image_max_dim=128,
        batch_size=4, num_classes=4, max_gt_instances=6,
    )
    loader = DataLoader(ds, cfg, shuffle=False, process_index=3, process_count=4)
    with pytest.raises(RuntimeError, match="empty"):
        next(loader.epoch(fixed_steps=2))
