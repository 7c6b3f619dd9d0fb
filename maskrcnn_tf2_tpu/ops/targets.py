"""Device-side training-target builders (fixed-shape, vmap-able).

Replaces two reference components with key-driven, static-shape JAX:

* ``build_rpn_targets`` (utils.py:154-262) — the CPU numpy anchor-matching
  hot loop run per image inside the Keras ``DataLoader`` — becomes
  ``rpn_targets``: a pure on-device function over padded GT arrays.
  Random subsampling ("np.random.choice without replacement") is recast as
  top-k over uniform random keys, which is distributionally identical.

* ``detection_targets_graph`` (mrcnn_layers.py:844-967) — the in-graph
  training-time ROI sampler using ``tf.random.shuffle`` + ``boolean_mask``
  (dynamic shapes) — becomes ``detection_targets``: selection by sorting
  masked random keys into fixed slots, preserving the reference's sampling
  statistics (positives capped at ``train_rois_per_image*roi_positive_ratio``,
  negatives at ``(1/ratio)*pos_count - pos_count``, zero-padded to
  ``train_rois_per_image``).

Both per-image functions take an explicit PRNG key; batch via ``jax.vmap``
(the python-loop ``batch_slice`` of the reference disappears).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.ops.boxes import encode_boxes, overlaps
from maskrcnn_tf2_tpu.ops.image import crop_and_resize, crop_and_resize_separable

# Python scalar, NOT jnp.float32(...): module-level jnp constants force
# backend initialization at import time (see ops/nms.py).
_BIG = 1e9


def _random_keep_topk(rng, candidate: jnp.ndarray, k, k_bound: int | None = None) -> jnp.ndarray:
    """Uniformly keep at most ``k`` True entries of ``candidate`` (bool [N]).

    ``k`` may be a traced scalar. Equivalent in distribution to
    ``np.random.choice(ids, size=k, replace=False)``.

    ``k_bound``: static upper bound on ``k``. When given (and < N) the
    selection runs as a ``lax.top_k`` threshold — find the ``k``-th smallest
    random key among candidates and keep keys below it — instead of a full
    [N] argsort + scatter ranking. At the RPN scale (N = 65k anchors, k <=
    256, twice per image) the full sort was the profiled hot spot of the
    whole train step (~19 ms/step each on v5e); top_k is ~O(N) and fuses.
    """
    n = candidate.shape[0]
    keys = jax.random.uniform(rng, (n,))
    keys = jnp.where(candidate, keys, _BIG)
    if k_bound is not None and k_bound < n:
        kb = int(k_bound)
        # k-th smallest key among candidates (ascending); keys are distinct
        # w.p. ~1, and any fp-tie at the threshold only admits one extra.
        smallest = -jax.lax.top_k(-keys, kb)[0]  # [kb] ascending
        thresh = smallest[jnp.clip(k - 1, 0, kb - 1)]
        return candidate & (keys <= thresh) & (k > 0)
    order = jnp.argsort(keys)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return candidate & (rank < k)


# ---------------------------------------------------------------------------
# RPN targets
# ---------------------------------------------------------------------------

class RPNTargets(NamedTuple):
    match: jnp.ndarray  # [A] int32: 1 positive, -1 negative, 0 neutral
    deltas: jnp.ndarray  # [A, 4] per-anchor encoded deltas (std-normalized)


def rpn_targets(
    rng,
    anchors: jnp.ndarray,
    gt_class_ids: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    train_anchors_per_image: int = 256,
    rpn_bbox_std: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2),
) -> RPNTargets:
    """Anchor matching + subsampling for one image (reference utils.py:154-262).

    Args:
      anchors: [A, 4] normalized.
      gt_class_ids: [G] int32, zero-padded; negative ids mark COCO crowd boxes
        which are excluded from GT and veto negatives near them.
      gt_boxes: [G, 4] normalized, zero-padded.

    Returns per-anchor ``match`` and **dense** ``deltas [A, 4]`` (the
    reference packs positives' deltas into a compact [256, 4]; the dense
    layout is loss-equivalent and static-shape friendly).
    """
    a = anchors.shape[0]
    is_crowd = gt_class_ids < 0
    is_valid_gt = gt_class_ids > 0

    iou = overlaps(anchors, gt_boxes)  # [A, G]
    iou_gt = jnp.where(is_valid_gt[None, :], iou, -1.0)
    anchor_iou_argmax = jnp.argmax(iou_gt, axis=1)
    anchor_iou_max = jnp.max(iou_gt, axis=1)  # -1 if no valid gt

    crowd_iou = jnp.where(is_crowd[None, :], iou, -1.0)
    no_crowd = jnp.max(crowd_iou, axis=1, initial=-1.0) < 0.001

    match = jnp.zeros((a,), jnp.int32)
    match = jnp.where((anchor_iou_max < 0.3) & no_crowd, -1, match)
    # Best anchor(s) per GT are positive regardless of IoU (ties included).
    # Guard col_max > 0: the reference's unguarded `overlaps == max` would
    # mark huge anchor sets positive for a degenerate zero-IoU GT column.
    col_max = jnp.max(iou, axis=0, initial=0.0)
    is_best = (iou >= col_max[None, :]) & is_valid_gt[None, :] & (col_max[None, :] > 0)
    match = jnp.where(jnp.any(is_best, axis=1), 1, match)
    match = jnp.where(anchor_iou_max >= 0.7, 1, match)

    # Subsample: positives <= half, negatives fill the rest.
    rng_pos, rng_neg = jax.random.split(rng)
    half = train_anchors_per_image // 2
    pos = _random_keep_topk(rng_pos, match == 1, half, k_bound=half)
    num_pos = jnp.sum(pos)
    neg = _random_keep_topk(
        rng_neg,
        match == -1,
        train_anchors_per_image - num_pos,
        k_bound=train_anchors_per_image,
    )
    match = jnp.where(pos, 1, jnp.where(neg, -1, 0))

    # one-hot matmul instead of a row gather: [A, G] @ [G, 4] maps onto the
    # MXU; jnp.take here is ~500k scalar gathers (profiled at ~3 ms/step)
    onehot = jax.nn.one_hot(anchor_iou_argmax, gt_boxes.shape[0], dtype=jnp.float32)
    matched_gt = jnp.matmul(
        onehot, gt_boxes.astype(jnp.float32), precision="highest"
    )  # [A, 4] — f32: default matmul precision would round coords to bf16
    deltas = encode_boxes(anchors, matched_gt)
    deltas = deltas / jnp.asarray(rpn_bbox_std, deltas.dtype)
    deltas = jnp.where((match == 1)[:, None], deltas, 0.0)
    return RPNTargets(match=match, deltas=deltas)


# ---------------------------------------------------------------------------
# Detection targets (ROI head training sampler)
# ---------------------------------------------------------------------------

class DetectionTargets(NamedTuple):
    rois: jnp.ndarray  # [T, 4] normalized, zero-padded
    class_ids: jnp.ndarray  # [T] int32 gt class (0 = negative/padding)
    deltas: jnp.ndarray  # [T, 4] std-normalized, zero for non-positive
    masks: jnp.ndarray  # [T, mh, mw] {0,1}, zero for non-positive
    positive_mask: jnp.ndarray  # [T] bool
    valid_mask: jnp.ndarray  # [T] bool (positive or sampled negative)


def detection_targets(
    rng,
    proposals: jnp.ndarray,
    gt_class_ids: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_masks: jnp.ndarray,
    *,
    train_rois_per_image: int = 200,
    roi_positive_ratio: float = 0.33,
    bbox_std: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2),
    mask_shape: Tuple[int, int] = (28, 28),
    use_mini_masks: bool = False,
) -> DetectionTargets:
    """Sample proposals into ROI-head training targets for one image.

    Mirrors reference ``detection_targets_graph`` (mrcnn_layers.py:844-967):
    positives have IoU >= 0.5 with a non-crowd GT, negatives IoU < 0.5 and no
    crowd overlap; 1:(1/ratio - 1) pos:neg balance; mask targets are the
    assigned GT mask crop_and_resize'd to ``mask_shape`` and rounded.

    Args:
      proposals: [P, 4] normalized, zero-padded.
      gt_class_ids: [G] int32, zero-padded, negatives = crowd.
      gt_boxes: [G, 4] normalized, zero-padded.
      gt_masks: [G, mh', mw'] float/bool; full-image frame, or per-box frame
        when ``use_mini_masks`` (reference mini-mask remap,
        mrcnn_layers.py:935-946).
    """
    p = proposals.shape[0]
    t = train_rois_per_image

    proposal_valid = jnp.any(jnp.abs(proposals) > 0, axis=1)
    is_crowd = gt_class_ids < 0
    is_valid_gt = gt_class_ids > 0

    iou = overlaps(proposals, gt_boxes)  # [P, G]
    iou_gt = jnp.where(is_valid_gt[None, :], iou, -1.0)
    roi_iou_max = jnp.max(iou_gt, axis=1)
    crowd_iou = jnp.where(is_crowd[None, :], iou, -1.0)
    no_crowd = jnp.max(crowd_iou, axis=1, initial=-1.0) < 0.001

    positive_cand = proposal_valid & (roi_iou_max >= 0.5)
    negative_cand = proposal_valid & (roi_iou_max < 0.5) & no_crowd

    rng_pos, rng_neg = jax.random.split(rng)
    max_pos = int(t * roi_positive_ratio)
    pos_sel = _random_keep_topk(rng_pos, positive_cand, max_pos, k_bound=max_pos)
    pos_count = jnp.sum(pos_sel)
    # reference: r = 1/ratio; negative_count = int(r * positive_count) - positive_count
    neg_count = (
        (pos_count.astype(jnp.float32) / roi_positive_ratio).astype(jnp.int32)
        - pos_count
    )
    neg_sel = _random_keep_topk(rng_neg, negative_cand, neg_count, k_bound=t)

    # Pack: positives first, then negatives, then padding — by sorting a
    # composite priority key (positives 0..P-1, negatives P..2P-1, pad 2P+).
    arange = jnp.arange(p, dtype=jnp.int32)
    prio = jnp.where(pos_sel, arange, jnp.where(neg_sel, p + arange, 2 * p + arange))
    order = jnp.argsort(prio)[:t]  # [T] proposal indices
    slot_pos = jnp.take(pos_sel, order)
    slot_neg = jnp.take(neg_sel, order)
    slot_valid = slot_pos | slot_neg

    rois = jnp.where(slot_valid[:, None], jnp.take(proposals, order, axis=0), 0.0)

    # GT assignment by max IoU (only meaningful for positives).
    roi_gt_idx = jnp.take(jnp.argmax(iou_gt, axis=1), order)  # [T]
    roi_gt_boxes = jnp.take(gt_boxes, roi_gt_idx, axis=0)
    roi_gt_class = jnp.take(gt_class_ids, roi_gt_idx)
    class_ids = jnp.where(slot_pos, roi_gt_class, 0).astype(jnp.int32)

    deltas = encode_boxes(rois, roi_gt_boxes)
    deltas = deltas / jnp.asarray(bbox_std, deltas.dtype)
    deltas = jnp.where(slot_pos[:, None], deltas, 0.0)

    # Mask targets: crop the assigned GT mask to the ROI box.
    if use_mini_masks:
        # ROI coords re-expressed in the GT box frame (mrcnn_layers.py:935-946).
        gy1, gx1, gy2, gx2 = (roi_gt_boxes[:, i] for i in range(4))
        gh = jnp.maximum(gy2 - gy1, 1e-8)
        gw = jnp.maximum(gx2 - gx1, 1e-8)
        crop_boxes = jnp.stack(
            [
                (rois[:, 0] - gy1) / gh,
                (rois[:, 1] - gx1) / gw,
                (rois[:, 2] - gy1) / gh,
                (rois[:, 3] - gx1) / gw,
            ],
            axis=1,
        )
    else:
        crop_boxes = rois
    # Separable-matmul sampler when the per-ROI mask materialization is cheap
    # (always true for mini-masks); 4-corner scalar gathers are a profiled TPU
    # hot spot at full-image mask resolution.
    if gt_masks.shape[1] * gt_masks.shape[2] <= 256 * 256:
        masks = crop_and_resize_separable(
            gt_masks.astype(jnp.float32), crop_boxes, roi_gt_idx, mask_shape
        )
    else:
        masks = crop_and_resize(
            gt_masks[..., None].astype(jnp.float32), crop_boxes, roi_gt_idx, mask_shape
        )[..., 0]
    masks = jnp.where(slot_pos[:, None, None], jnp.round(masks), 0.0)

    return DetectionTargets(
        rois=rois,
        class_ids=class_ids,
        deltas=deltas,
        masks=masks,
        positive_mask=slot_pos,
        valid_mask=slot_valid,
    )
