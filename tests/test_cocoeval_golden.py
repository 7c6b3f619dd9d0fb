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


# ---------------------------------------------------------------------------
# Differential fuzz vs the independent numpy mAP implementation (VERDICT r4
# next #7). Where the COCOeval and reference-evaluating.py definitions
# coincide — no crowd, no ignores, area=all, maxDets >= dets — CocoEvalLite's
# matching + accumulation machinery must agree with an evaluation rebuilt
# from eval.metrics.compute_matches (the reference evaluating.py:36-91
# matcher, an independent implementation) to float tolerance. The 101-point
# interpolation is recomputed here from the pycocotools definition, so the
# only shared library code between the two sides is the raw IoU matrix.
# ---------------------------------------------------------------------------

from maskrcnn_tf2_tpu.eval.coco_eval import IOU_THRESHOLDS, RECALL_POINTS
from maskrcnn_tf2_tpu.eval.metrics import compute_matches


def _independent_coco_ap(images, use_masks):
    """COCOeval AP[threshold, class] reconstructed on compute_matches."""
    classes = sorted(
        {int(c) for im in images for c in im["gt_class_ids"]}
        | {int(c) for im in images for c in im["dt_class_ids"]}
    )
    t = len(IOU_THRESHOLDS)
    ap = np.full((t, len(classes)), np.nan)
    for ci, cls in enumerate(classes):
        n_gt = sum(int((im["gt_class_ids"] == cls).sum()) for im in images)
        if n_gt == 0:
            continue
        for ti, thr in enumerate(IOU_THRESHOLDS):
            scores, matched = [], []
            for im in images:
                gsel = im["gt_class_ids"] == cls
                dsel = im["dt_class_ids"] == cls
                if not dsel.any():
                    continue
                _, pred_match, _ = compute_matches(
                    im["gt_boxes"][gsel],
                    im["gt_class_ids"][gsel],
                    im["gt_masks"][..., gsel] if use_masks else None,
                    im["dt_boxes"][dsel],
                    im["dt_class_ids"][dsel],
                    im["dt_scores"][dsel],
                    im["dt_masks"][..., dsel] if use_masks else None,
                    iou_threshold=float(thr),
                    use_masks=use_masks,
                )
                order = np.argsort(-im["dt_scores"][dsel], kind="stable")
                scores.append(im["dt_scores"][dsel][order])
                matched.append(pred_match > -1)
            sc = np.concatenate(scores) if scores else np.zeros(0)
            m = (
                np.concatenate(matched)
                if matched
                else np.zeros(0, bool)
            )
            m = m[np.argsort(-sc, kind="stable")]
            if len(m) == 0:
                ap[ti, ci] = 0.0
                continue
            tp = np.cumsum(m, dtype=np.float64)
            fp = np.cumsum(~m, dtype=np.float64)
            rc = tp / n_gt
            pr = tp / np.maximum(tp + fp, 1.0)
            pr = np.maximum.accumulate(pr[::-1])[::-1]
            idx = np.searchsorted(rc, RECALL_POINTS, side="left")
            ap[ti, ci] = np.where(
                idx < len(pr), pr[np.minimum(idx, len(pr) - 1)], 0.0
            ).mean()
    return classes, ap


def _random_scene(rs, n_images, n_classes, use_masks, hw=48):
    """Random images with gt boxes and detections that are a mix of jittered
    gt copies (real matches across the IoU sweep) and pure noise (fps)."""
    images = []
    for _ in range(n_images):
        n_gt = rs.randint(0, 7)
        y1, x1 = rs.uniform(0, hw * 0.6, (2, n_gt))
        h, w = rs.uniform(4, hw * 0.4, (2, n_gt))
        gt_boxes = np.stack([y1, x1, y1 + h, x1 + w], -1)
        gt_ids = rs.randint(1, n_classes + 1, n_gt)
        dts, dt_ids, dt_scores = [], [], []
        for j in range(n_gt):
            for _ in range(rs.randint(0, 3)):  # jittered copies
                jit = rs.normal(0, rs.choice([0.5, 2.0, 6.0]), 4)
                dts.append(gt_boxes[j] + jit)
                # mostly right class, sometimes wrong
                dt_ids.append(
                    gt_ids[j] if rs.rand() < 0.85 else rs.randint(1, n_classes + 1)
                )
                dt_scores.append(rs.rand())
        for _ in range(rs.randint(0, 4)):  # pure noise
            y1n, x1n = rs.uniform(0, hw * 0.6, 2)
            hn, wn = rs.uniform(3, hw * 0.4, 2)
            dts.append(np.array([y1n, x1n, y1n + hn, x1n + wn]))
            dt_ids.append(rs.randint(1, n_classes + 1))
            dt_scores.append(rs.rand())
        dt_boxes = (
            np.clip(np.asarray(dts, np.float64), 0, hw)
            if dts
            else np.zeros((0, 4))
        )
        # jitter+clip can invert a box; a NEGATIVE-area dt is genuinely
        # outside even the 'all' area range in pycocotools (area < aRng[0]=0
        # -> unmatched => ignored) while the plain matcher calls it an fp —
        # the one spot the two definitions diverge. Keep boxes valid:
        # zero-area (y1 == y2) stays a legal fp on both sides.
        if len(dt_boxes):
            dt_boxes[:, [0, 2]] = np.sort(dt_boxes[:, [0, 2]], axis=1)
            dt_boxes[:, [1, 3]] = np.sort(dt_boxes[:, [1, 3]], axis=1)
        im = dict(
            gt_boxes=gt_boxes.astype(np.float64),
            gt_class_ids=gt_ids.astype(np.int64),
            dt_boxes=dt_boxes,
            dt_class_ids=np.asarray(dt_ids, np.int64),
            dt_scores=np.asarray(dt_scores, np.float64),
            gt_masks=None,
            dt_masks=None,
        )
        if use_masks:

            def rects(boxes):
                mk = np.zeros((hw, hw, len(boxes)), np.uint8)
                for k, (by1, bx1, by2, bx2) in enumerate(boxes):
                    mk[
                        int(max(by1, 0)) : int(max(by2, 0)),
                        int(max(bx1, 0)) : int(max(bx2, 0)),
                        k,
                    ] = 1
                return mk

            im["gt_masks"] = rects(gt_boxes)
            im["dt_masks"] = rects(dt_boxes)
        images.append(im)
    return images


@pytest.mark.parametrize("use_masks", [False, True])
def test_differential_fuzz_vs_numpy_map(use_masks):
    n_cases = 24 if use_masks else 100
    agreed = 0
    for case in range(n_cases):
        rs = np.random.RandomState(1000 + case + (50000 if use_masks else 0))
        images = _random_scene(
            rs, n_images=rs.randint(1, 5), n_classes=rs.randint(1, 5),
            use_masks=use_masks,
        )
        ev = CocoEvalLite(use_masks=use_masks)
        for im in images:
            ev.add_image(
                im["gt_boxes"],
                im["gt_class_ids"],
                im["dt_boxes"],
                im["dt_class_ids"],
                im["dt_scores"],
                gt_masks=im["gt_masks"],
                dt_masks=im["dt_masks"],
            )
        if not ev._classes:
            continue  # empty scene — nothing to compare
        ap_lite, _ = ev._accumulate("all")
        classes, ap_ind = _independent_coco_ap(images, use_masks)
        assert classes == sorted(ev._classes)
        np.testing.assert_allclose(
            ap_lite, ap_ind, atol=1e-9, equal_nan=True,
            err_msg=f"case={case} use_masks={use_masks}",
        )
        s = ev.summarize(verbose=False)
        assert s["AP50"] == pytest.approx(np.nanmean(ap_ind[0]), abs=1e-9) or (
            np.isnan(s["AP50"]) and np.isnan(np.nanmean(ap_ind[0]))
        )
        agreed += 1
    assert agreed >= n_cases - 2  # nearly all cases non-degenerate


# --- goldens the fuzz cannot reach: maxDets truncation, multi-crowd ------


def test_max_dets_truncation():
    """maxDets truncates per (image, class) by score BEFORE matching
    (COCOeval evaluateImg: dt = dt[0:maxDet]). With max_dets=2 the only
    matching detection (rank 3) is dropped -> AP 0; untruncated it yields
    precision 1/3 at recall 1 -> 101-pt AP = 1/3."""
    gt = box(0, 0, 10, 10)
    dts = np.array(
        [[50, 50, 60, 60], [70, 70, 80, 80], [0, 0, 10, 10]], np.float64
    )
    scores = np.array([0.9, 0.8, 0.7])
    ids = np.array([1, 1, 1])

    ev_full = CocoEvalLite(max_dets=100)
    ev_full.add_image(gt, np.array([1]), dts, ids, scores)
    s_full = ev_full.summarize(verbose=False)
    assert s_full["AP"] == pytest.approx(1.0 / 3.0)
    assert s_full["AR100"] == pytest.approx(1.0)

    ev_trunc = CocoEvalLite(max_dets=2)
    ev_trunc.add_image(gt, np.array([1]), dts, ids, scores)
    s_trunc = ev_trunc.summarize(verbose=False)
    assert s_trunc["AP"] == pytest.approx(0.0)
    assert s_trunc["AR100"] == pytest.approx(0.0)


def test_multi_crowd_image():
    """Two crowd regions, each absorbing detections (one absorbs TWO —
    crowd gt is never consumed), one regular tp, one pure fp. All four
    crowd/fp dts score below the tp, so: tp=[1], fp=[1] after the three
    ignores -> precision envelope 1.0 at recall 1.0 -> AP 1.0 everywhere
    (all overlaps are exact, crowd IoU = inter/dt_area = 1.0)."""
    gt_boxes = np.array(
        [[0, 0, 10, 10], [20, 20, 40, 40], [60, 60, 80, 80]], np.float64
    )
    gt_ids = np.array([1, -1, -1])  # negative = crowd (reference convention)
    dt_boxes = np.array(
        [
            [0, 0, 10, 10],  # tp on the regular gt
            [20, 20, 30, 30],  # inside crowd A
            [25, 25, 38, 38],  # inside crowd A again (absorbed, not consumed)
            [60, 60, 70, 70],  # inside crowd B
            [45, 45, 50, 50],  # pure fp
        ],
        np.float64,
    )
    dt_ids = np.ones(5, np.int64)
    dt_scores = np.array([0.95, 0.9, 0.85, 0.8, 0.7])
    ev = CocoEvalLite()
    ev.add_image(gt_boxes, gt_ids, dt_boxes, dt_ids, dt_scores)
    s = ev.summarize(verbose=False)
    assert s["AP"] == pytest.approx(1.0)
    assert s["AR100"] == pytest.approx(1.0)
