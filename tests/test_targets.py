import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.ops.anchors import get_anchors
from maskrcnn_tf2_tpu.ops.boxes import apply_box_deltas, overlaps
from maskrcnn_tf2_tpu.ops.targets import detection_targets, rpn_targets

STD = (0.1, 0.1, 0.2, 0.2)


def make_gt(n_valid, g=10, seed=0):
    rs = np.random.RandomState(seed)
    boxes = np.zeros((g, 4), np.float32)
    ids = np.zeros((g,), np.int32)
    y1 = rs.uniform(0.05, 0.6, n_valid)
    x1 = rs.uniform(0.05, 0.6, n_valid)
    h = rs.uniform(0.1, 0.35, n_valid)
    w = rs.uniform(0.1, 0.35, n_valid)
    boxes[:n_valid] = np.stack([y1, x1, y1 + h, x1 + w], axis=1)
    ids[:n_valid] = rs.randint(1, 5, n_valid)
    return ids, boxes


def test_rpn_targets_counts_and_rules():
    cfg = MaskRCNNConfig(image_shape=(256, 256, 3), rpn_anchor_scales=(16, 32, 64, 128, 256))
    anchors = jnp.asarray(get_anchors(cfg))
    ids, boxes = make_gt(4)
    out = rpn_targets(
        jax.random.PRNGKey(0), anchors, jnp.asarray(ids), jnp.asarray(boxes), 256, STD
    )
    match = np.asarray(out.match)
    n_pos = (match == 1).sum()
    n_neg = (match == -1).sum()
    assert 0 < n_pos <= 128
    assert n_pos + n_neg <= 256
    assert n_neg == 256 - n_pos or n_neg < 256 - n_pos  # may run out of negatives

    # every valid gt box has at least one positive anchor
    iou = np.asarray(overlaps(anchors, jnp.asarray(boxes)))
    for g in range(4):
        best = iou[:, g].max()
        assert match[iou[:, g] >= best - 1e-7].max() == 1

    # positive deltas decode the anchor onto its matched gt
    pos_idx = np.where(match == 1)[0]
    deltas = np.asarray(out.deltas)[pos_idx] * np.asarray(STD)
    decoded = np.asarray(
        apply_box_deltas(anchors[pos_idx], jnp.asarray(deltas))
    )
    matched_gt = boxes[iou[pos_idx].argmax(axis=1)]
    np.testing.assert_allclose(decoded, matched_gt, atol=1e-4)


def test_rpn_targets_high_iou_positive_low_negative():
    # Single gt exactly equal to one anchor -> that anchor positive.
    cfg = MaskRCNNConfig(image_shape=(256, 256, 3), rpn_anchor_scales=(16, 32, 64, 128, 256))
    anchors_np = get_anchors(cfg)
    gt = np.zeros((5, 4), np.float32)
    gt[0] = anchors_np[1234]
    ids = np.zeros((5,), np.int32)
    ids[0] = 1
    out = rpn_targets(
        jax.random.PRNGKey(1), jnp.asarray(anchors_np), jnp.asarray(ids), jnp.asarray(gt), 256, STD
    )
    assert int(np.asarray(out.match)[1234]) == 1


def test_rpn_targets_crowd_vetoes_negatives():
    cfg = MaskRCNNConfig(image_shape=(256, 256, 3), rpn_anchor_scales=(16, 32, 64, 128, 256))
    anchors = get_anchors(cfg)
    gt = np.zeros((5, 4), np.float32)
    gt[0] = [0.1, 0.1, 0.4, 0.4]  # real
    gt[1] = [0.5, 0.5, 0.95, 0.95]  # crowd region
    ids = np.array([1, -1, 0, 0, 0], np.int32)
    out = rpn_targets(
        jax.random.PRNGKey(2), jnp.asarray(anchors), jnp.asarray(ids), jnp.asarray(gt), 10_000, STD
    )
    match = np.asarray(out.match)
    iou = np.asarray(overlaps(jnp.asarray(anchors), jnp.asarray(gt)))
    crowd_overlapping = iou[:, 1] >= 0.001
    # anchors overlapping the crowd and not positive must be neutral, not negative
    assert (match[crowd_overlapping] != -1).all()


def test_rpn_targets_no_gt_all_negative():
    cfg = MaskRCNNConfig(image_shape=(256, 256, 3), rpn_anchor_scales=(16, 32, 64, 128, 256))
    anchors = get_anchors(cfg)
    gt = np.zeros((5, 4), np.float32)
    ids = np.zeros((5,), np.int32)
    out = rpn_targets(
        jax.random.PRNGKey(3), jnp.asarray(anchors), jnp.asarray(ids), jnp.asarray(gt), 256, STD
    )
    match = np.asarray(out.match)
    assert (match != 1).all()
    assert (match == -1).sum() == 256


def _dt_inputs(seed=0, p=64, g=8):
    rs = np.random.RandomState(seed)
    ids, gt_boxes = make_gt(4, g=g, seed=seed)
    masks = np.zeros((g, 64, 64), np.float32)
    for i in range(4):
        y1, x1, y2, x2 = (gt_boxes[i] * 64).astype(int)
        masks[i, y1:y2, x1:x2] = 1.0
    # proposals: jittered gt boxes (positives) + far boxes (negatives) + padding
    props = np.zeros((p, 4), np.float32)
    k = 0
    for i in range(4):
        for _ in range(6):
            jit = rs.uniform(-0.02, 0.02, 4)
            props[k] = gt_boxes[i] + jit
            k += 1
    while k < p - 8:  # leave padding slots at the end
        y1, x1 = rs.uniform(0.7, 0.9, 2)
        props[k] = [y1, x1, y1 + 0.08, x1 + 0.08]
        k += 1
    return props, ids, gt_boxes, masks


def test_detection_targets_sampling_and_decode():
    props, ids, gt_boxes, masks = _dt_inputs()
    out = detection_targets(
        jax.random.PRNGKey(0),
        jnp.asarray(props),
        jnp.asarray(ids),
        jnp.asarray(gt_boxes),
        jnp.asarray(masks),
        train_rois_per_image=32,
        roi_positive_ratio=0.25,
        bbox_std=STD,
        mask_shape=(28, 28),
    )
    pos = np.asarray(out.positive_mask)
    valid = np.asarray(out.valid_mask)
    n_pos = pos.sum()
    assert 0 < n_pos <= 8  # 32 * 0.25
    n_neg = (valid & ~pos).sum()
    assert n_neg <= 3 * n_pos  # 1:3 at ratio 0.25
    # packing: positives first, then negatives, then padding
    first_neg = np.argmax(~pos)
    assert pos[:first_neg].all()
    assert not valid[valid.argmin() :].any() or valid.all()

    # positive rois decode onto their gt
    rois = np.asarray(out.rois)
    deltas = np.asarray(out.deltas) * np.asarray(STD)
    decoded = np.asarray(apply_box_deltas(jnp.asarray(rois), jnp.asarray(deltas)))
    iou = np.asarray(overlaps(jnp.asarray(rois), jnp.asarray(gt_boxes)))
    for i in np.where(pos)[0]:
        g = iou[i, :4].argmax()
        np.testing.assert_allclose(decoded[i], gt_boxes[g], atol=1e-4)
        assert int(np.asarray(out.class_ids)[i]) == ids[g]

    # negatives have class 0, zero deltas, zero masks
    neg_slots = valid & ~pos
    assert (np.asarray(out.class_ids)[neg_slots] == 0).all()
    np.testing.assert_allclose(np.asarray(out.deltas)[neg_slots], 0.0)
    np.testing.assert_allclose(np.asarray(out.masks)[neg_slots], 0.0)

    # positive mask targets are binary and mostly 1 (roi ~ gt box ~ filled mask)
    m = np.asarray(out.masks)[pos]
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert m.mean() > 0.5


def test_detection_targets_crowd_not_negative():
    props, ids, gt_boxes, masks = _dt_inputs()
    # add a crowd box over the "far" negative area
    ids = ids.copy()
    gt_boxes = gt_boxes.copy()
    ids[5] = -1
    gt_boxes[5] = [0.65, 0.65, 1.0, 1.0]
    out = detection_targets(
        jax.random.PRNGKey(1),
        jnp.asarray(props),
        jnp.asarray(ids),
        jnp.asarray(gt_boxes),
        jnp.asarray(masks),
        train_rois_per_image=32,
        roi_positive_ratio=0.25,
        bbox_std=STD,
        mask_shape=(28, 28),
    )
    rois = np.asarray(out.rois)
    valid = np.asarray(out.valid_mask)
    pos = np.asarray(out.positive_mask)
    # no sampled negative roi may overlap the crowd box
    neg_rois = rois[valid & ~pos]
    if len(neg_rois):
        iou = np.asarray(overlaps(jnp.asarray(neg_rois), jnp.asarray(gt_boxes[5:6])))
        assert (iou < 0.001).all()
