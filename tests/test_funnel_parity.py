"""Detection-funnel parity tests: float64 numpy oracles that re-state the
reference semantics literally (per-image loops, per-class NMS loop) are run
against the fixed-shape vmapped TPU ops.

Oracles mirror:
  * ProposalLayer (reference mrcnn_layers.py:203-280): fg score -> top-k ->
    std-scaled delta decode -> clip to [0,1] -> greedy NMS(0.7) -> zero-pad;
  * DetectionLayer.refine_detections (mrcnn_layers.py:369-501): argmax class,
    class-specific delta decode, clip to window, background/confidence
    filter, PER-CLASS greedy NMS loop (``_nms_keep_func``,
    mrcnn_layers.py:440-468) each capped at ``detection_max_instances``,
    global top-``detection_max_instances`` by score, zero-pad.

The per-class-NMS corner where one class keeps more than
``detection_max_instances`` survivors is covered explicitly: the per-class
cap can only drop a class's (max_instances+1)-th-best survivor, which is
outscored by max_instances same-class boxes and therefore can never enter
the global top-k — so the reference pipeline and the class-offset single-NMS
used on TPU are exactly equivalent (test_per_class_cap_corner proves it).
"""

import numpy as np
import pytest

from maskrcnn_tf2_tpu.ops.detection import refine_detections
from maskrcnn_tf2_tpu.ops.proposal import _DELTA_CLIP, generate_proposals

# ----------------------------------------------------------------------
# float64 numpy oracle, written to the reference's structure
# ----------------------------------------------------------------------


def np_apply_deltas(boxes, deltas):
    h = boxes[:, 2] - boxes[:, 0]
    w = boxes[:, 3] - boxes[:, 1]
    cy = boxes[:, 0] + 0.5 * h
    cx = boxes[:, 1] + 0.5 * w
    cy = cy + deltas[:, 0] * h
    cx = cx + deltas[:, 1] * w
    h = h * np.exp(deltas[:, 2])
    w = w * np.exp(deltas[:, 3])
    return np.stack([cy - 0.5 * h, cx - 0.5 * w, cy + 0.5 * h, cx + 0.5 * w], -1)


def np_clip(boxes, window):
    y1 = np.clip(boxes[:, 0], window[0], window[2])
    x1 = np.clip(boxes[:, 1], window[1], window[3])
    y2 = np.clip(boxes[:, 2], window[0], window[2])
    x2 = np.clip(boxes[:, 3], window[1], window[3])
    return np.stack([y1, x1, y2, x2], -1)


def np_iou(b1, b2):
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    y1 = np.maximum(b1[:, None, 0], b2[None, :, 0])
    x1 = np.maximum(b1[:, None, 1], b2[None, :, 1])
    y2 = np.minimum(b1[:, None, 2], b2[None, :, 2])
    x2 = np.minimum(b1[:, None, 3], b2[None, :, 3])
    inter = np.maximum(y2 - y1, 0) * np.maximum(x2 - x1, 0)
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-10)


def np_greedy_nms(boxes, scores, max_output, thr):
    """tf.image.non_max_suppression semantics: score order, suppress on
    IoU strictly greater than thr, stop after max_output selections."""
    order = np.argsort(-scores, kind="stable")
    iou = np_iou(boxes, boxes)
    selected = []
    for i in order:
        if any(iou[j, i] > thr for j in selected):
            continue
        selected.append(i)
        if len(selected) == max_output:
            break
    return np.array(selected, np.int64)


def np_proposals(scores, deltas, anchors, bbox_std, pre_nms, count, thr):
    """Reference ProposalLayer, one image, float64."""
    d = deltas * np.asarray(bbox_std)
    top = np.argsort(-scores, kind="stable")[:pre_nms]
    d = np.clip(d[top], -_DELTA_CLIP, _DELTA_CLIP)  # framework's safety clamp
    boxes = np_clip(np_apply_deltas(anchors[top], d), (0.0, 0.0, 1.0, 1.0))
    keep = np_greedy_nms(boxes, scores[top], count, thr)
    out = np.zeros((count, 4))
    out[: len(keep)] = boxes[keep]
    return out


def np_refine_detections(rois, probs, deltas, window, bbox_std, min_conf, nms_thr, max_inst):
    """Reference refine_detections, one image, float64, per-class NMS loop."""
    n = rois.shape[0]
    class_ids = np.argmax(probs, axis=1)
    scores = probs[np.arange(n), class_ids]
    d = deltas[np.arange(n), class_ids] * np.asarray(bbox_std)
    d = np.clip(d, -_DELTA_CLIP, _DELTA_CLIP)  # framework's safety clamp
    refined = np_clip(np_apply_deltas(rois, d), window)

    keep = np.flatnonzero((class_ids > 0) & (scores >= min_conf))
    nms_keep = []
    for cls in np.unique(class_ids[keep]):
        ixs = keep[class_ids[keep] == cls]
        sel = np_greedy_nms(refined[ixs], scores[ixs], max_inst, nms_thr)
        nms_keep.extend(ixs[sel].tolist())
    keep = np.array(sorted(set(keep.tolist()) & set(nms_keep)), np.int64)
    if len(keep):
        top = keep[np.argsort(-scores[keep], kind="stable")[:max_inst]]
    else:
        top = keep
    out = np.zeros((max_inst, 6))
    out[: len(top), :4] = refined[top]
    out[: len(top), 4] = class_ids[top]
    out[: len(top), 5] = scores[top]
    return out


# ----------------------------------------------------------------------
def rand_boxes(rs, n):
    y1 = rs.uniform(0, 0.7, n)
    x1 = rs.uniform(0, 0.7, n)
    h = rs.uniform(0.05, 0.3, n)
    w = rs.uniform(0.05, 0.3, n)
    return np.stack([y1, x1, np.minimum(y1 + h, 1.0), np.minimum(x1 + w, 1.0)], -1)


def sort_rows(det):
    """Canonical order for comparison: by descending score then class."""
    order = np.lexsort((det[:, 4], -det[:, 5]))
    return det[order]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_proposal_layer_matches_reference_oracle(seed):
    rs = np.random.RandomState(seed)
    a, pre, count = 96, 48, 16
    anchors = rand_boxes(rs, a)
    scores = rs.uniform(0.01, 0.99, a)
    deltas = rs.normal(0, 0.2, (a, 4))
    bbox_std = (0.1, 0.1, 0.2, 0.2)

    probs = np.stack([1 - scores, scores], -1)
    got_boxes, got_valid = generate_proposals(
        probs[None].astype(np.float32),
        deltas[None].astype(np.float32),
        anchors.astype(np.float32),
        bbox_std,
        pre_nms_limit=pre,
        proposal_count=count,
        nms_threshold=0.7,
    )
    want = np_proposals(scores, deltas, anchors, bbox_std, pre, count, 0.7)
    got = np.asarray(got_boxes[0])
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert int(np.asarray(got_valid[0]).sum()) == int((want.sum(1) != 0).sum())


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_detection_layer_matches_reference_oracle(seed):
    rs = np.random.RandomState(100 + seed)
    n, c, max_inst = 48, 5, 8
    rois = rand_boxes(rs, n)
    logits = rs.normal(0, 2.0, (n, c))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    deltas = rs.normal(0, 0.2, (n, c, 4))
    window = np.array([0.05, 0.05, 0.95, 0.95])
    bbox_std = (0.1, 0.1, 0.2, 0.2)

    got = np.asarray(
        refine_detections(
            rois[None].astype(np.float32),
            probs[None].astype(np.float32),
            deltas[None].astype(np.float32),
            window[None].astype(np.float32),
            bbox_std=bbox_std,
            min_confidence=0.3,
            nms_threshold=0.4,
            max_instances=max_inst,
        )[0]
    )
    want = np_refine_detections(
        rois, probs, deltas, window, bbox_std, 0.3, 0.4, max_inst
    )
    np.testing.assert_allclose(sort_rows(got), sort_rows(want), atol=3e-5)


def test_all_background_image_yields_zero_detections():
    n, c = 16, 4
    rs = np.random.RandomState(7)
    rois = rand_boxes(rs, n)
    probs = np.zeros((n, c))
    probs[:, 0] = 0.97  # background wins everywhere
    probs[:, 1:] = 0.01
    deltas = np.zeros((n, c, 4))
    got = np.asarray(
        refine_detections(
            rois[None].astype(np.float32),
            probs[None].astype(np.float32),
            deltas[None].astype(np.float32),
            np.array([[0.0, 0.0, 1.0, 1.0]], np.float32),
            min_confidence=0.5,
            nms_threshold=0.3,
            max_instances=8,
        )[0]
    )
    np.testing.assert_array_equal(got, np.zeros((8, 6), np.float32))


def test_all_low_confidence_yields_zero_detections():
    n, c = 16, 4
    rs = np.random.RandomState(8)
    rois = rand_boxes(rs, n)
    probs = np.full((n, c), 1.0 / c)  # top class prob 0.25 < 0.7
    probs[:, 0] = 0.1
    probs[:, 1] = 0.4
    probs[:, 2:] = 0.25
    deltas = np.zeros((n, c, 4))
    got = np.asarray(
        refine_detections(
            rois[None].astype(np.float32),
            probs[None].astype(np.float32),
            deltas[None].astype(np.float32),
            np.array([[0.0, 0.0, 1.0, 1.0]], np.float32),
            min_confidence=0.7,
            nms_threshold=0.3,
            max_instances=8,
        )[0]
    )
    np.testing.assert_array_equal(got, np.zeros((8, 6), np.float32))


def test_per_class_cap_corner():
    """One class keeps MORE than detection_max_instances NMS survivors.

    The reference caps per-class NMS output at max_instances and then takes
    the global top max_instances; the TPU path runs ONE class-offset NMS
    with a global cap. These are exactly equivalent: the per-class cap only
    ever drops a class's (max_instances+1)-th best survivor, which is
    already outscored by max_instances boxes and cannot reach the global
    top-k. This test pins that equivalence on a worst-case layout.
    """
    max_inst = 4
    c = 3
    # class 1: 6 disjoint boxes (all NMS survivors), scores .95...70
    # class 2: 2 disjoint boxes, scores .74, .73 (interleaved with class 1)
    boxes1 = np.array(
        [[0.0 + 0.15 * i, 0.0, 0.1 + 0.15 * i, 0.1] for i in range(6)]
    )
    boxes2 = np.array([[0.0, 0.5, 0.1, 0.6], [0.2, 0.5, 0.3, 0.6]])
    rois = np.concatenate([boxes1, boxes2])
    scores = np.array([0.95, 0.90, 0.85, 0.80, 0.75, 0.70, 0.74, 0.73])
    cls = np.array([1] * 6 + [2] * 2)
    n = len(rois)
    probs = np.full((n, c), 0.001)
    probs[np.arange(n), cls] = scores
    probs[:, 0] = 1.0 - probs[:, 1:].sum(1)  # ensure rows sum to 1, argmax=cls
    deltas = np.zeros((n, c, 4))
    window = np.array([0.0, 0.0, 1.0, 1.0])

    got = np.asarray(
        refine_detections(
            rois[None].astype(np.float32),
            probs[None].astype(np.float32),
            deltas[None].astype(np.float32),
            window[None].astype(np.float32),
            min_confidence=0.5,
            nms_threshold=0.3,
            max_instances=max_inst,
        )[0]
    )
    want = np_refine_detections(
        rois, probs, deltas, window, (0.1, 0.1, 0.2, 0.2), 0.5, 0.3, max_inst
    )
    # reference keeps the 4 best class-1 boxes; so must we
    np.testing.assert_allclose(sort_rows(got), sort_rows(want), atol=3e-5)
    assert list(got[:, 4]) == [1, 1, 1, 1]
    np.testing.assert_allclose(got[:, 5], [0.95, 0.90, 0.85, 0.80], atol=1e-6)
