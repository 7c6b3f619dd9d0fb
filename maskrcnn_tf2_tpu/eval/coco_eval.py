"""COCO-style evaluation (AP@[.5:.95], AP50, AP75, area breakdown) — no
pycocotools dependency.

Fulfils the role of the reference's ``evaluate_coco`` + pycocotools
``COCOeval`` (samples/coco/coco.py:445-521): run the model over a dataset,
collect per-image results (``build_coco_results`` equivalent) and compute the
standard COCO metrics with 101-point precision interpolation, greedy
per-class matching honoring crowd (ignore) ground truth, maxDets=100.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

from maskrcnn_tf2_tpu.eval.metrics import compute_overlaps_boxes, compute_overlaps_masks

IOU_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def _crowd_adjusted_iou(dt_boxes, gt_boxes, iscrowd, dt_masks=None, gt_masks=None):
    """IoU matrix; for crowd GT the denominator is the detection area only
    (COCO convention: IoU(dt, crowd) = inter / area(dt))."""
    if dt_masks is not None and gt_masks is not None:
        iou = compute_overlaps_masks(dt_masks, gt_masks)
        if iscrowd.any():
            m1 = dt_masks.reshape(-1, dt_masks.shape[-1]).astype(bool)
            m2 = gt_masks.reshape(-1, gt_masks.shape[-1]).astype(bool)
            inter = m1.T.astype(np.float32) @ m2.astype(np.float32)
            dt_area = np.maximum(m1.sum(0).astype(np.float32), 1e-10)
            crowd_iou = inter / dt_area[:, None]
            iou = np.where(iscrowd[None, :], crowd_iou, iou)
        return iou
    iou = compute_overlaps_boxes(dt_boxes, gt_boxes)
    if iscrowd.any():
        y1 = np.maximum(dt_boxes[:, None, 0], gt_boxes[None, :, 0])
        x1 = np.maximum(dt_boxes[:, None, 1], gt_boxes[None, :, 1])
        y2 = np.minimum(dt_boxes[:, None, 2], gt_boxes[None, :, 2])
        x2 = np.minimum(dt_boxes[:, None, 3], gt_boxes[None, :, 3])
        inter = np.maximum(y2 - y1, 0) * np.maximum(x2 - x1, 0)
        dt_area = np.maximum(
            (dt_boxes[:, 2] - dt_boxes[:, 0]) * (dt_boxes[:, 3] - dt_boxes[:, 1]),
            1e-10,
        )
        iou = np.where(iscrowd[None, :], inter / dt_area[:, None], iou)
    return iou


class CocoEvalLite:
    """Accumulates per-image detections + GT, computes COCO metrics.

    Usage:
      ev = CocoEvalLite(use_masks=True)
      ev.add_image(gt_boxes, gt_class_ids, dt_boxes, dt_class_ids, dt_scores,
                   gt_masks=..., dt_masks=...)   # crowd gt = negative ids
      stats = ev.summarize()
    """

    def __init__(self, use_masks: bool = False, max_dets: int = 100):
        self.use_masks = use_masks
        self.max_dets = max_dets
        # per (class, image): list of match records
        self._images: List[Dict] = []
        self._classes: set = set()

    def add_image(
        self,
        gt_boxes: np.ndarray,
        gt_class_ids: np.ndarray,
        dt_boxes: np.ndarray,
        dt_class_ids: np.ndarray,
        dt_scores: np.ndarray,
        gt_masks: Optional[np.ndarray] = None,  # [H, W, G]
        dt_masks: Optional[np.ndarray] = None,  # [H, W, D]
    ):
        self._images.append(
            dict(
                gt_boxes=np.asarray(gt_boxes, np.float64),
                gt_class_ids=np.asarray(gt_class_ids, np.int64),
                dt_boxes=np.asarray(dt_boxes, np.float64),
                dt_class_ids=np.asarray(dt_class_ids, np.int64),
                dt_scores=np.asarray(dt_scores, np.float64),
                gt_masks=gt_masks,
                dt_masks=dt_masks,
            )
        )
        self._classes.update(np.abs(gt_class_ids).tolist())
        self._classes.update(dt_class_ids.tolist())
        self._classes.discard(0)

    # ------------------------------------------------------------------
    def _evaluate_image_class(self, im: Dict, cls: int, area_rng):
        """Match dts to gts for one image+class. Returns (dt_scores,
        dt_matched[T], dt_ignored[T], n_gt) where T = #IoU thresholds."""
        gt_sel = np.abs(im["gt_class_ids"]) == cls
        dt_sel = im["dt_class_ids"] == cls
        gt_boxes = im["gt_boxes"][gt_sel]
        iscrowd = im["gt_class_ids"][gt_sel] < 0
        dt_boxes = im["dt_boxes"][dt_sel]
        dt_scores = im["dt_scores"][dt_sel]

        order = np.argsort(-dt_scores, kind="stable")[: self.max_dets]
        dt_boxes = dt_boxes[order]
        dt_scores = dt_scores[order]

        gt_area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
        gt_ignore = iscrowd | (gt_area < area_rng[0]) | (gt_area > area_rng[1])
        dt_area = (dt_boxes[:, 2] - dt_boxes[:, 0]) * (dt_boxes[:, 3] - dt_boxes[:, 1])
        dt_out_of_range = (dt_area < area_rng[0]) | (dt_area > area_rng[1])

        n_gt = int((~gt_ignore).sum())
        t = len(IOU_THRESHOLDS)
        d = len(dt_boxes)
        dt_matched = np.zeros((t, d), bool)
        dt_ignored = np.zeros((t, d), bool)
        if d == 0:
            return dt_scores, dt_matched, dt_ignored, n_gt
        if len(gt_boxes) == 0:
            dt_ignored[:] = dt_out_of_range[None, :]
            return dt_scores, dt_matched, dt_ignored, n_gt

        gm = dm = None
        if self.use_masks:
            gm = im["gt_masks"][..., gt_sel]
            dm = im["dt_masks"][..., dt_sel][..., order]
        iou = _crowd_adjusted_iou(dt_boxes, gt_boxes, iscrowd, dm, gm)

        # match ignored gt last: sort gt by (ignore, original order)
        gt_order = np.argsort(gt_ignore, kind="stable")
        for ti, thr in enumerate(IOU_THRESHOLDS):
            gt_used = np.zeros(len(gt_boxes), bool)
            for di in range(d):
                best, best_iou = -1, thr
                for gi in gt_order:
                    # crowds may absorb multiple detections (pycocotools: the
                    # "used" check is bypassed only for iscrowd gt)
                    if gt_used[gi] and not iscrowd[gi]:
                        continue
                    if best > -1 and not gt_ignore[best] and gt_ignore[gi]:
                        break  # can't improve: only ignored gts remain
                    if iou[di, gi] < best_iou:
                        continue
                    best, best_iou = gi, iou[di, gi]
                if best > -1:
                    if gt_ignore[best]:
                        dt_ignored[ti, di] = True
                    else:
                        dt_matched[ti, di] = True
                        gt_used[best] = True
                else:
                    dt_ignored[ti, di] = dt_out_of_range[di]
        return dt_scores, dt_matched, dt_ignored, n_gt

    def _accumulate(self, area: str = "all"):
        """Per-class precision-recall over all images -> AP[t, class]."""
        area_rng = AREA_RANGES[area]
        classes = sorted(self._classes)
        t = len(IOU_THRESHOLDS)
        ap = np.full((t, len(classes)), np.nan)
        recall = np.full((t, len(classes)), np.nan)
        for ci, cls in enumerate(classes):
            scores_all, matched_all, ignored_all = [], [], []
            n_gt_total = 0
            for im in self._images:
                s, m, ig, n_gt = self._evaluate_image_class(im, cls, area_rng)
                scores_all.append(s)
                matched_all.append(m)
                ignored_all.append(ig)
                n_gt_total += n_gt
            if n_gt_total == 0:
                continue
            scores = np.concatenate(scores_all)
            matched = np.concatenate(matched_all, axis=1)
            ignored = np.concatenate(ignored_all, axis=1)
            order = np.argsort(-scores, kind="stable")
            matched = matched[:, order]
            ignored = ignored[:, order]
            for ti in range(t):
                keep = ~ignored[ti]
                tp = np.cumsum(matched[ti][keep])
                fp = np.cumsum(~matched[ti][keep])
                rc = tp / n_gt_total
                pr = tp / np.maximum(tp + fp, 1e-10)
                # monotone non-increasing precision envelope
                for i in range(len(pr) - 2, -1, -1):
                    pr[i] = max(pr[i], pr[i + 1])
                if len(pr) == 0:
                    ap[ti, ci] = 0.0
                    recall[ti, ci] = 0.0
                    continue
                # 101-point interpolation
                idx = np.searchsorted(rc, RECALL_POINTS, side="left")
                prec_at = np.where(idx < len(pr), pr[np.minimum(idx, len(pr) - 1)], 0.0)
                ap[ti, ci] = prec_at.mean()
                recall[ti, ci] = rc[-1]
        return ap, recall

    def summarize(self, verbose: bool = True) -> Dict[str, float]:
        ap_all, recall_all = self._accumulate("all")
        stats = {
            "AP": float(np.nanmean(ap_all)),
            "AP50": float(np.nanmean(ap_all[0])),
            "AP75": float(np.nanmean(ap_all[5])),
            "AR100": float(np.nanmean(recall_all)),
        }
        for area in ("small", "medium", "large"):
            ap_a, _ = self._accumulate(area)
            stats[f"AP_{area}"] = float(np.nanmean(ap_a)) if not np.all(np.isnan(ap_a)) else float("nan")
        if verbose:
            kind = "segm" if self.use_masks else "bbox"
            for k, v in stats.items():
                print(f"  {kind} {k}: {v:.4f}")
        return stats


def evaluate_dataset(
    predictor,
    dataset,
    config,
    limit: Optional[int] = None,
    use_masks: bool = True,
    verbose: bool = True,
) -> Dict[str, Dict[str, float]]:
    """Run the predictor over a dataset and compute bbox+segm COCO metrics
    (the reference's evaluate_coco flow, coco.py:472-521)."""
    from maskrcnn_tf2_tpu.data.transforms import extract_bboxes

    ev_box = CocoEvalLite(use_masks=False)
    ev_segm = CocoEvalLite(use_masks=True) if use_masks else None
    n = min(limit or len(dataset), len(dataset))
    t0 = time.time()
    bs = config.batch_size
    for start in range(0, n, bs):
        idxs = list(range(start, min(start + bs, n)))
        images = [dataset.load_image(i) for i in idxs]
        results = predictor.detect(images)
        for i, r in zip(idxs, results):
            gt_masks, gt_ids = dataset.load_mask(i)
            gt_boxes = extract_bboxes(gt_masks).astype(np.float64)
            ev_box.add_image(
                gt_boxes, gt_ids, r["rois"].astype(np.float64), r["class_ids"], r["scores"]
            )
            if ev_segm is not None:
                dt_masks = r["masks"].astype(np.uint8)
                ev_segm.add_image(
                    gt_boxes,
                    gt_ids,
                    r["rois"].astype(np.float64),
                    r["class_ids"],
                    r["scores"],
                    gt_masks=gt_masks.astype(np.uint8),
                    dt_masks=dt_masks,
                )
    if verbose:
        print(f"evaluated {n} images in {time.time() - t0:.1f}s")
    out = {"bbox": ev_box.summarize(verbose)}
    if ev_segm is not None:
        out["segm"] = ev_segm.summarize(verbose)
    return out
