import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.ops.anchors import (
    compute_backbone_shapes,
    generate_level_anchors,
    generate_pyramid_anchors,
    get_anchors,
)


def test_backbone_shapes():
    assert compute_backbone_shapes((512, 512), (4, 8, 16, 32, 64)) == (
        (128, 128),
        (64, 64),
        (32, 32),
        (16, 16),
        (8, 8),
    )
    # non-divisible uses ceil
    assert compute_backbone_shapes((500, 300), (64,)) == ((8, 5),)


def test_level_anchor_geometry():
    a = generate_level_anchors(32, [0.5, 1, 2], (4, 4), 16)
    assert a.shape == (4 * 4 * 3, 4)
    # first cell center is (0, 0); ratio=1 anchor is 32x32 centered there
    sq = a[1]
    np.testing.assert_allclose(sq, [-16, -16, 16, 16], atol=1e-4)
    # ratio 0.5 (w/h): h = 32/sqrt(.5), w = 32*sqrt(.5)
    r05 = a[0]
    h = r05[2] - r05[0]
    w = r05[3] - r05[1]
    np.testing.assert_allclose(h, 32 / np.sqrt(0.5), rtol=1e-5)
    np.testing.assert_allclose(w, 32 * np.sqrt(0.5), rtol=1e-5)
    # centers advance by the feature stride
    second_cell = a[3:6]
    np.testing.assert_allclose(
        (second_cell[:, 1] + second_cell[:, 3]) / 2, [16, 16, 16], atol=1e-4
    )


def test_pyramid_anchor_count_matches_config():
    cfg = MaskRCNNConfig(image_shape=(512, 512, 3))
    anchors = get_anchors(cfg)
    assert anchors.shape == (cfg.num_anchors(), 4)
    # 512^2: 3*(128^2 + 64^2 + 32^2 + 16^2 + 8^2)
    assert cfg.num_anchors() == 3 * (128**2 + 64**2 + 32**2 + 16**2 + 8**2)
    # normalized anchors should be centered within ~[-0.6, 1.6]
    assert anchors.min() > -1.0 and anchors.max() < 2.0
    # caching returns the same array object
    assert get_anchors(cfg) is anchors


def test_pyramid_level_ordering():
    shapes = ((8, 8), (4, 4))
    a = generate_pyramid_anchors([32, 64], [1.0], shapes, [16, 32])
    assert a.shape == (8 * 8 + 4 * 4, 4)
    # first block is the fine level (32px anchors)
    np.testing.assert_allclose(a[0, 2] - a[0, 0], 32, atol=1e-4)
    np.testing.assert_allclose(a[64, 2] - a[64, 0], 64, atol=1e-4)
