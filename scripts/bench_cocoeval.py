"""Benchmark CocoEvalLite at COCO-val2017 scale (synthetic result set).

Synthesizes a plausible detection workload — n_images images, 80 classes,
~100 detections and ~8 ground-truth boxes per image with realistic
class/score/IoU structure — and times ``CocoEvalLite.summarize()`` (bbox).
Reference comparison point: pycocotools' C matching at this scale takes
seconds (samples/coco/coco.py:472-521 path).

    python scripts/bench_cocoeval.py [n_images]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from maskrcnn_tf2_tpu.eval.coco_eval import CocoEvalLite


def synth_image(rs, n_classes=80, n_gt=8, n_dt_extra=4):
    """GT boxes + detections: most detections are jittered copies of a gt
    (so matching has real TP structure), plus background false positives."""
    gt_boxes = []
    for _ in range(n_gt):
        y1, x1 = rs.uniform(0, 500, 2)
        h, w = np.exp(rs.uniform(np.log(16), np.log(300), 2))
        gt_boxes.append([y1, x1, y1 + h, x1 + w])
    gt_boxes = np.array(gt_boxes)
    gt_ids = rs.randint(1, n_classes + 1, n_gt)
    # ~5% crowd
    crowd = rs.rand(n_gt) < 0.05
    gt_ids = np.where(crowd, -gt_ids, gt_ids)

    dt_boxes, dt_ids, dt_scores = [], [], []
    for i in range(n_gt):
        for _ in range(rs.randint(1, 4)):  # 1-3 dts per gt
            jit = rs.normal(0, 8, 4)
            dt_boxes.append(gt_boxes[i] + jit)
            dt_ids.append(abs(gt_ids[i]) if rs.rand() < 0.9 else rs.randint(1, n_classes + 1))
            dt_scores.append(rs.uniform(0.3, 1.0))
    for _ in range(n_dt_extra):
        y1, x1 = rs.uniform(0, 500, 2)
        h, w = np.exp(rs.uniform(np.log(16), np.log(200), 2))
        dt_boxes.append([y1, x1, y1 + h, x1 + w])
        dt_ids.append(rs.randint(1, n_classes + 1))
        dt_scores.append(rs.uniform(0.05, 0.6))
    return (
        gt_boxes,
        gt_ids,
        np.array(dt_boxes),
        np.array(dt_ids),
        np.array(dt_scores),
    )


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    rs = np.random.RandomState(0)
    ev = CocoEvalLite(use_masks=False)
    t0 = time.time()
    for _ in range(n_images):
        gt_b, gt_i, dt_b, dt_i, dt_s = synth_image(rs)
        ev.add_image(gt_b, gt_i, dt_b, dt_i, dt_s)
    t_add = time.time() - t0
    t0 = time.time()
    stats = ev.summarize(verbose=False)
    t_sum = time.time() - t0
    print(
        f"images={n_images} add={t_add:.1f}s summarize={t_sum:.1f}s "
        f"AP={stats['AP']:.4f} AP50={stats['AP50']:.4f}"
    )


if __name__ == "__main__":
    main()
