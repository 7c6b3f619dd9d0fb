"""Golden-value tests for CocoEvalLite against hand-computed pycocotools
COCOeval outputs (cocoeval.py semantics; pycocotools itself is not
installed here, so each expected value is derived by hand from the
published algorithm and documented inline).

Covers every semantic rule the evaluator must honor:
  * 101-point interpolated AP, per-threshold matching;
  * crowd gt absorbing multiple detections without recall penalty;
  * gt area-range ignore driven by the ANNOTATION (segmentation) area,
    not the bbox area (COCOeval reads gt['area'] for both bbox and segm);
  * dt area = bbox area (bbox eval) / mask area (segm eval); an unmatched
    out-of-range dt is ignored, a matched one never is;
  * a dt matching an ignored gt CONSUMES that gt (gtm set unconditionally);
  * matched-to-ignored dts excluded from both tp and fp.
"""

import numpy as np
import pytest

from maskrcnn_tf2_tpu.eval.coco_eval import CocoEvalLite


def box(y1, x1, y2, x2):
    return np.array([[y1, x1, y2, x2]], np.float64)


def test_perfect_single_detection():
    ev = CocoEvalLite()
    ev.add_image(
        gt_boxes=box(0, 0, 10, 10),
        gt_class_ids=np.array([1]),
        dt_boxes=box(0, 0, 10, 10),
        dt_class_ids=np.array([1]),
        dt_scores=np.array([0.9]),
    )
    s = ev.summarize(verbose=False)
    assert s["AP"] == pytest.approx(1.0)
    assert s["AP50"] == pytest.approx(1.0)
    assert s["AP75"] == pytest.approx(1.0)
    assert s["AR100"] == pytest.approx(1.0)
    # gt bbox area 100 -> small; medium/large have no in-range gt -> NaN
    assert s["AP_small"] == pytest.approx(1.0)
    assert np.isnan(s["AP_medium"]) and np.isnan(s["AP_large"])


def test_iou_ladder_ap_is_threshold_fraction():
    # single gt [0,0,10,10]; dt [0,0,10,7]: inter 70, union 100 -> IoU 0.7,
    # matched at thresholds {.5,.55,.6,.65,.7} -> AP = 5/10, AP50=1, AP75=0.
    ev = CocoEvalLite()
    ev.add_image(
        gt_boxes=box(0, 0, 10, 10),
        gt_class_ids=np.array([1]),
        dt_boxes=box(0, 0, 10, 7),
        dt_class_ids=np.array([1]),
        dt_scores=np.array([0.9]),
    )
    s = ev.summarize(verbose=False)
    assert s["AP"] == pytest.approx(0.5)
    assert s["AP50"] == pytest.approx(1.0)
    assert s["AP75"] == pytest.approx(0.0)
    assert s["AR100"] == pytest.approx(0.5)


def test_score_iou_crossing_matches_cocoeval():
    # gt [0,0,10,10]; dt1 (score .9) IoU .6; dt2 (score .8) IoU .9.
    # thr in {.5,.55,.6}: dt1 TP, dt2 FP after full recall -> AP 1.0
    # thr in {.65..,.9}: dt1 FP, dt2 TP -> rc=[0,1], pr=[0,.5] -> AP 0.5
    # thr .95: no match -> AP 0.
    # AP = (3*1 + 6*.5 + 0)/10 = 0.6; AP50 = 1.0; AP75 = 0.5; AR = 9/10.
    ev = CocoEvalLite()
    ev.add_image(
        gt_boxes=box(0, 0, 10, 10),
        gt_class_ids=np.array([1]),
        dt_boxes=np.array([[0, 0, 10, 6], [0, 0, 10, 9]], np.float64),
        dt_class_ids=np.array([1, 1]),
        dt_scores=np.array([0.9, 0.8]),
    )
    s = ev.summarize(verbose=False)
    assert s["AP"] == pytest.approx(0.6)
    assert s["AP50"] == pytest.approx(1.0)
    assert s["AP75"] == pytest.approx(0.5)
    assert s["AR100"] == pytest.approx(0.9)


def test_crowd_absorbs_multiple_detections():
    # regular gt [0,0,10,10] + crowd gt [20,20,40,40] (negative class id).
    # Two dts inside the crowd (crowd IoU = inter/dt_area = 1.0) are both
    # ignored (crowd may be matched repeatedly); dt3 matches the regular gt.
    ev = CocoEvalLite()
    ev.add_image(
        gt_boxes=np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float64),
        gt_class_ids=np.array([1, -1]),
        dt_boxes=np.array(
            [[20, 20, 30, 40], [20, 20, 40, 30], [0, 0, 10, 10]], np.float64
        ),
        dt_class_ids=np.array([1, 1, 1]),
        dt_scores=np.array([0.9, 0.8, 0.7]),
    )
    s = ev.summarize(verbose=False)
    assert s["AP"] == pytest.approx(1.0)
    assert s["AR100"] == pytest.approx(1.0)


def test_gt_area_ignore_uses_annotation_area_not_bbox_area():
    # gt bbox 40x40 (bbox area 1600 = medium) but ANNOTATION area 500
    # (small). COCOeval ignores by gt['area'] (segmentation area), so the
    # gt is in-range for 'small' and ignored for 'medium'. The matching dt
    # (bbox area 1600, outside small) is matched, and matched dts are never
    # area-ignored -> AP_small = 1.0, AP_medium = NaN.
    ev = CocoEvalLite()
    ev.add_image(
        gt_boxes=box(0, 0, 40, 40),
        gt_class_ids=np.array([1]),
        dt_boxes=box(0, 0, 40, 40),
        dt_class_ids=np.array([1]),
        dt_scores=np.array([0.9]),
        gt_areas=np.array([500.0]),
    )
    s = ev.summarize(verbose=False)
    assert s["AP"] == pytest.approx(1.0)
    assert s["AP_small"] == pytest.approx(1.0)
    assert np.isnan(s["AP_medium"])
    assert np.isnan(s["AP_large"])


def test_unmatched_out_of_range_dt_is_ignored_not_fp():
    # large gt (area 10000) + a high-scoring spurious small dt far away.
    # AP_all: the small dt is a leading FP -> rc=[0,1], pr=[0,.5] -> 0.5.
    # AP_large: the small dt is unmatched AND out of [96^2, inf) -> ignored
    # -> AP_large = 1.0 (this is COCOeval's dtIg = ~dtm & out-of-range).
    ev = CocoEvalLite()
    ev.add_image(
        gt_boxes=box(0, 0, 100, 100),
        gt_class_ids=np.array([1]),
        dt_boxes=np.array([[200, 200, 210, 210], [0, 0, 100, 100]], np.float64),
        dt_class_ids=np.array([1, 1]),
        dt_scores=np.array([0.95, 0.9]),
    )
    s = ev.summarize(verbose=False)
    assert s["AP"] == pytest.approx(0.5)
    assert s["AP_large"] == pytest.approx(1.0)
    assert np.isnan(s["AP_small"]) and np.isnan(s["AP_medium"])


def test_ignored_gt_is_consumed_by_its_match():
    # 'small' area range. gt1: annotation area 1600 (ignored in small);
    # gt2: area 100 (in range). dt1 (score .9) and dt2 (score .8) both
    # overlap gt1 with IoU 0.625 and have bbox area 1000 (in small range);
    # dt3 (score .7) matches gt2 perfectly.
    # COCOeval: dt1 matches the IGNORED gt1 and CONSUMES it (gtm set
    # unconditionally) -> dt1 ignored; dt2 finds gt1 used -> unmatched,
    # in-range -> FP. Per threshold (n_gt=1, keep order by score):
    #   thr <= .6  (3 thr): keep=[dt2 FP, dt3 TP] -> rc=[0,1], pr=[0,.5] -> .5
    #   thr >= .65 (7 thr): dt1 no longer reaches gt1 -> also FP:
    #                keep=[dt1,dt2,dt3] -> tp=[0,0,1] fp=[1,2,2] -> pr_last=1/3
    #                envelope -> AP = 1/3
    # AP_small = (3*0.5 + 7/3)/10 = 0.3833333...
    # (An evaluator that does NOT consume ignored gts would let dt2 also be
    # ignored and report AP_small ~ 1.0 at low thresholds.)
    ev = CocoEvalLite()
    ev.add_image(
        gt_boxes=np.array([[0, 0, 40, 40], [100, 100, 110, 110]], np.float64),
        gt_class_ids=np.array([1, 1]),
        dt_boxes=np.array(
            [[0, 0, 40, 25], [0, 15, 40, 40], [100, 100, 110, 110]], np.float64
        ),
        dt_class_ids=np.array([1, 1, 1]),
        dt_scores=np.array([0.9, 0.8, 0.7]),
        gt_areas=np.array([1600.0, 100.0]),
    )
    s = ev.summarize(verbose=False)
    assert s["AP_small"] == pytest.approx((3 * 0.5 + 7 / 3) / 10)


def test_segm_dt_area_is_mask_area():
    # Segm eval: gt/dt masks of area 500 inside a 40x40 extent. Default
    # gt_areas comes from the mask (500 -> small); dt area for segm eval is
    # the MASK area (500, in small range), not the bbox area (1600).
    h = w = 64
    gm = np.zeros((h, w, 1), np.uint8)
    gm[0:40, 0:40, 0] = 0
    # sparse pattern: 500 pixels inside the 40x40 block
    ys, xs = np.unravel_index(np.arange(0, 1600, 1600 // 500)[:500], (40, 40))
    gm[ys, xs, 0] = 1
    dm = gm.copy()
    ev = CocoEvalLite(use_masks=True)
    ev.add_image(
        gt_boxes=box(0, 0, 40, 40),
        gt_class_ids=np.array([1]),
        dt_boxes=box(0, 0, 40, 40),
        dt_class_ids=np.array([1]),
        dt_scores=np.array([0.9]),
        gt_masks=gm,
        dt_masks=dm,
    )
    s = ev.summarize(verbose=False)
    assert s["AP"] == pytest.approx(1.0)
    assert s["AP_small"] == pytest.approx(1.0)
    assert np.isnan(s["AP_medium"])


def test_two_classes_mean_and_missing_class():
    # class 1: perfect; class 2: gt present, no detections -> AP 0.
    # mean AP = 0.5. A third class id never seen contributes nothing.
    ev = CocoEvalLite()
    ev.add_image(
        gt_boxes=np.array([[0, 0, 10, 10], [30, 30, 50, 50]], np.float64),
        gt_class_ids=np.array([1, 2]),
        dt_boxes=box(0, 0, 10, 10),
        dt_class_ids=np.array([1]),
        dt_scores=np.array([0.9]),
    )
    s = ev.summarize(verbose=False)
    assert s["AP"] == pytest.approx(0.5)
    assert s["AR100"] == pytest.approx(0.5)


def test_multi_image_accumulation_is_global():
    # Two images, same class. img1: TP score .9. img2: FP score .95 + missed
    # gt. Global ranking: [FP(.95), TP(.9)], n_gt=2 -> rc=[0,.5],
    # pr=[0,.5] -> envelope [.5,.5]; recall points <= .5 -> precision .5,
    # beyond -> 0 -> AP = 51/101 * 0.5 at every threshold.
    ev = CocoEvalLite()
    ev.add_image(
        gt_boxes=box(0, 0, 10, 10),
        gt_class_ids=np.array([1]),
        dt_boxes=box(0, 0, 10, 10),
        dt_class_ids=np.array([1]),
        dt_scores=np.array([0.9]),
    )
    ev.add_image(
        gt_boxes=box(0, 0, 10, 10),
        gt_class_ids=np.array([1]),
        dt_boxes=box(50, 50, 60, 60),
        dt_class_ids=np.array([1]),
        dt_scores=np.array([0.95]),
    )
    s = ev.summarize(verbose=False)
    assert s["AP"] == pytest.approx(51 / 101 * 0.5)
    assert s["AR100"] == pytest.approx(0.5)
