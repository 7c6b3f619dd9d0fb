import os
import sys

import numpy as np

from maskrcnn_tf2_tpu.eval.coco_eval import CocoEvalLite
from maskrcnn_tf2_tpu.eval.metrics import (
    compute_ap,
    compute_ap_range,
    compute_matches,
    compute_overlaps_masks,
)


def boxes_of(masks):
    from maskrcnn_tf2_tpu.data.transforms import extract_bboxes

    return extract_bboxes(masks).astype(np.float64)


def make_scene(seed=0, n=3, h=64, w=64):
    rs = np.random.RandomState(seed)
    masks = np.zeros((h, w, n), bool)
    ids = rs.randint(1, 3, n)
    for i in range(n):
        y, x = rs.randint(0, h - 20, 2)
        masks[y : y + 16, x : x + 16, i] = True
    return masks, ids


def test_mask_overlaps():
    m = np.zeros((10, 10, 2), bool)
    m[:5, :, 0] = True
    m[:, :5, 1] = True
    iou = compute_overlaps_masks(m, m)
    np.testing.assert_allclose(np.diag(iou), 1.0)
    np.testing.assert_allclose(iou[0, 1], 25 / 75)


def test_perfect_predictions_ap1():
    masks, ids = make_scene()
    boxes = boxes_of(masks)
    scores = np.array([0.9, 0.8, 0.7])
    ap, _, _, _ = compute_ap(boxes, ids, masks, boxes, ids, scores, masks)
    assert ap == 1.0
    assert compute_ap_range(boxes, ids, masks, boxes, ids, scores, masks) == 1.0


def test_missed_and_spurious_predictions():
    masks, ids = make_scene(n=4)
    boxes = boxes_of(masks)
    # predict only the first two, plus one spurious high-score box
    pred_masks = np.concatenate(
        [masks[:, :, :2], np.zeros_like(masks[:, :, :1])], axis=-1
    )
    pred_masks[0:4, 60:64, 2] = True
    pred_boxes = boxes_of(pred_masks)
    pred_ids = np.array([ids[0], ids[1], 1])
    scores = np.array([0.9, 0.8, 0.95])
    ap, _, _, _ = compute_ap(boxes, ids, masks, pred_boxes, pred_ids, scores, pred_masks)
    assert 0.0 < ap < 1.0


def test_cocoeval_perfect():
    ev = CocoEvalLite(use_masks=False)
    for seed in range(3):
        masks, ids = make_scene(seed)
        boxes = boxes_of(masks)
        ev.add_image(boxes, ids, boxes, ids, np.linspace(0.9, 0.5, len(ids)))
    stats = ev.summarize(verbose=False)
    assert stats["AP"] == 1.0
    assert stats["AP50"] == 1.0
    assert stats["AP75"] == 1.0


def test_cocoeval_crowd_is_ignored():
    ev = CocoEvalLite(use_masks=False)
    gt_boxes = np.array([[0, 0, 16, 16], [30, 30, 60, 60]], np.float64)
    gt_ids = np.array([1, -1])  # second is crowd
    # one dt matching the real gt, one matching only the crowd region
    dt_boxes = np.array([[0, 0, 16, 16], [32, 32, 58, 58]], np.float64)
    dt_ids = np.array([1, 1])
    ev.add_image(gt_boxes, gt_ids, dt_boxes, dt_ids, np.array([0.9, 0.8]))
    stats = ev.summarize(verbose=False)
    # crowd det is ignored (neither TP nor FP) -> AP stays 1.0
    # (pycocotools' +np.spacing(1) eps makes precision 1-1e-16, not 1.0)
    assert abs(stats["AP"] - 1.0) < 1e-12


def test_cocoeval_fp_hurts():
    ev = CocoEvalLite(use_masks=False)
    gt_boxes = np.array([[0, 0, 16, 16]], np.float64)
    gt_ids = np.array([1])
    dt_boxes = np.array([[0, 0, 16, 16], [40, 40, 56, 56]], np.float64)
    dt_ids = np.array([1, 1])
    # false positive scored HIGHER than the true positive
    ev.add_image(gt_boxes, gt_ids, dt_boxes, dt_ids, np.array([0.5, 0.9]))
    stats = ev.summarize(verbose=False)
    assert stats["AP"] < 1.0
    assert stats["AP50"] < 1.0


def test_cocoeval_localization_quality_spread():
    ev = CocoEvalLite(use_masks=False)
    gt_boxes = np.array([[0, 0, 20, 20]], np.float64)
    gt_ids = np.array([1])
    # IoU with gt ~= 0.58: TP at 0.5, FP at 0.75
    dt_boxes = np.array([[0, 0, 20, 14.0]], np.float64)
    ev.add_image(gt_boxes, gt_ids, dt_boxes, gt_ids, np.array([0.9]))
    stats = ev.summarize(verbose=False)
    assert abs(stats["AP50"] - 1.0) < 1e-12
    assert stats["AP75"] == 0.0
    assert 0 < stats["AP"] < 1.0


def test_cocoeval_class_with_no_detections():
    ev = CocoEvalLite(use_masks=False)
    gt_boxes = np.array([[0, 0, 16, 16]], np.float64)
    ev.add_image(gt_boxes, np.array([2]), np.zeros((0, 4)), np.zeros((0,), np.int64), np.zeros((0,)))
    stats = ev.summarize(verbose=False)
    assert stats["AP"] == 0.0


def test_cocoeval_scale_sanity():
    """Matching must stay vectorized: 200 val2017-like images (80 classes,
    ~29 dts each) summarize in well under a second per 100 images on this
    box; the pre-vectorization evaluator took ~10x longer. Budget is set
    loose (10s) so only a wholesale regression to per-(threshold, area)
    python matching trips it. Full-scale numbers: scripts/bench_cocoeval.py
    (5000 images: ~15s summarize)."""
    import time

    sys_path = os.path.join(os.path.dirname(__file__), "..", "scripts")
    sys.path.insert(0, sys_path)
    try:
        from bench_cocoeval import synth_image
    finally:
        sys.path.remove(sys_path)

    rs = np.random.RandomState(3)
    ev = CocoEvalLite(use_masks=False)
    for _ in range(200):
        gt_b, gt_i, dt_b, dt_i, dt_s = synth_image(rs)
        ev.add_image(gt_b, gt_i, dt_b, dt_i, dt_s)
    t0 = time.time()
    stats = ev.summarize(verbose=False)
    elapsed = time.time() - t0
    assert np.isfinite(stats["AP"]) and 0.0 < stats["AP"] < 1.0
    assert elapsed < 10.0, f"CocoEvalLite.summarize took {elapsed:.1f}s for 200 images"
