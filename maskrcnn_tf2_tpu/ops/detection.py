"""Inference detection refinement: class-specific decode + per-class NMS.

Fixed-shape replacement for the reference ``DetectionLayer.refine_detections``
(mrcnn_layers.py:369-501) and the C++ ``DetectionLayer_TRT`` plugin
(inference_optimize.py:202-236). Differences by design:

* the per-image loop (``batch_slice``) becomes ``vmap``;
* per-class NMS is computed as ONE class-offset NMS: each box is translated
  by ``class_id * 2`` before suppression, so boxes of different classes can
  never overlap — exactly equivalent to looping per-class greedy NMS (the
  reference's ``_nms_keep_func`` per unique class, mrcnn_layers.py:440-468).
  The reference's per-class cap at ``detection_max_instances`` followed by a
  global top-``detection_max_instances`` is provably identical to the global
  cap used here: the cap can only drop a class's (max+1)-th best survivor,
  which max same-class boxes already outscore, so it can never reach the
  global top-k (pinned by tests/test_funnel_parity.py::test_per_class_cap_corner);
* output is the reference contract: ``[B, detection_max_instances, 6]`` =
  (y1, x1, y2, x2, class_id, score) in normalized coordinates, zero-padded.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.ops.boxes import apply_box_deltas, clip_boxes
from maskrcnn_tf2_tpu.ops.nms import non_max_suppression


def _refine_one_image(
    rois: jnp.ndarray,  # [N, 4] normalized
    probs: jnp.ndarray,  # [N, C]
    deltas: jnp.ndarray,  # [N, C, 4]
    window: jnp.ndarray,  # [4] normalized (y1, x1, y2, x2)
    bbox_std: Tuple[float, ...],
    min_confidence: float,
    nms_threshold: float,
    max_instances: int,
) -> jnp.ndarray:
    n = rois.shape[0]
    class_ids = jnp.argmax(probs, axis=1)  # [N] (background = 0 allowed)
    idx = jnp.arange(n)
    scores = probs[idx, class_ids]
    class_deltas = deltas[idx, class_ids] * jnp.asarray(bbox_std, jnp.float32)

    # Clamp before exp (see ops.proposal._DELTA_CLIP).
    class_deltas = jnp.clip(class_deltas, -4.135166556742356, 4.135166556742356)
    refined = apply_box_deltas(rois, class_deltas)
    refined = clip_boxes(refined, window)

    roi_valid = jnp.any(jnp.abs(rois) > 0, axis=1)
    keep = roi_valid & (class_ids > 0) & (scores >= min_confidence)

    # Class-offset trick: shift each class into its own disjoint unit square.
    offset = class_ids.astype(jnp.float32)[:, None] * 2.0
    shifted = refined + offset

    nms_idx, nms_valid = non_max_suppression(
        shifted, scores, max_instances, nms_threshold, valid=keep
    )
    out_boxes = jnp.where(nms_valid[:, None], jnp.take(refined, nms_idx, axis=0), 0.0)
    out_class = jnp.where(nms_valid, jnp.take(class_ids, nms_idx), 0)
    out_score = jnp.where(nms_valid, jnp.take(scores, nms_idx), 0.0)
    return jnp.concatenate(
        [
            out_boxes,
            out_class.astype(jnp.float32)[:, None],
            out_score[:, None],
        ],
        axis=1,
    )  # [max_instances, 6]


@partial(
    jax.jit,
    static_argnames=("min_confidence", "nms_threshold", "max_instances"),
)
def refine_detections(
    rois: jnp.ndarray,  # [B, N, 4]
    probs: jnp.ndarray,  # [B, N, C]
    deltas: jnp.ndarray,  # [B, N, C, 4]
    windows: jnp.ndarray,  # [B, 4] normalized
    bbox_std: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2),
    min_confidence: float = 0.7,
    nms_threshold: float = 0.3,
    max_instances: int = 100,
) -> jnp.ndarray:
    """Batched detection refinement -> ``[B, max_instances, 6]``."""
    fn = partial(
        _refine_one_image,
        bbox_std=bbox_std,
        min_confidence=min_confidence,
        nms_threshold=nms_threshold,
        max_instances=max_instances,
    )
    batched = jax.vmap(fn)
    # GSPMD tracing with the Pallas NMS engaged: shard_map island over the
    # data axis (see ops/proposal.py::generate_proposals).
    from maskrcnn_tf2_tpu.ops.nms import _use_pallas
    from maskrcnn_tf2_tpu.utils.platform import spmd_shard_batched

    if _use_pallas():
        batched = spmd_shard_batched(batched, 4)
    return batched(
        rois.astype(jnp.float32),
        probs.astype(jnp.float32),
        deltas.astype(jnp.float32),
        windows.astype(jnp.float32),
    )
