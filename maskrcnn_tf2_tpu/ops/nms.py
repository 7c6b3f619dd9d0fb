"""Fixed-shape non-max suppression for TPU.

The reference relies on ``tf.image.non_max_suppression`` inside
``ProposalLayer`` (mrcnn_layers.py:203-280) and per-class NMS inside
``DetectionLayer.refine_detections`` (mrcnn_layers.py:369-501); its deploy
path swaps these for NVIDIA's C++ TRT plugins (``ProposalLayer_TRT``,
``DetectionLayer_TRT``). Here NMS is a first-class fixed-shape device op:

* everything is padded/static — XLA/TPU friendly, vmap-able over batch and
  class axes;
* greedy NMS is computed by **fixpoint iteration** on the suppression
  recurrence instead of a sequential O(N) loop: with boxes sorted by score,
  ``keep[i] = valid[i] and not any_{j<i}(keep[j] and iou[j,i] > t)``.
  Iterating ``keep <- valid & ~(G^T keep)`` from ``keep = valid`` settles one
  suppression-chain level per step, so it converges to the exact greedy
  solution in ``depth(chains)`` iterations (typically < 10 for detection
  workloads) — each iteration is one masked matvec that maps cleanly onto
  the MXU/VPU.

A Pallas tiled variant (never materializing the NxN IoU matrix) lives in
``maskrcnn_tf2_tpu.kernels``; this module is the portable XLA fallback and
the semantic oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.ops.boxes import overlaps

_NEG_INF = jnp.float32(-1e9)


def _greedy_keep_from_iou(
    iou: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_iters: int | None = None,
) -> jnp.ndarray:
    """Greedy NMS keep-mask for score-sorted boxes given their IoU matrix.

    ``iou``: [N, N] of score-descending boxes. ``valid``: [N] bool.
    Returns keep mask [N] identical to sequential greedy NMS: the recurrence
    has a unique fixpoint (induction over the sorted order) and the iteration
    settles one suppression-chain level per step, so the loop exits after
    ``depth(chains)`` iterations; ``max_iters`` defaults to N, the upper bound.
    """
    n = iou.shape[0]
    if max_iters is None:
        max_iters = n
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # G[j, i]: earlier box j can suppress later box i.
    g = (iou > iou_threshold) & (row < col)
    g = g & valid[:, None] & valid[None, :]
    gf = g.astype(jnp.float32)

    def cond(state):
        it, keep, changed = state
        return changed & (it < max_iters)

    def body(state):
        it, keep, _ = state
        suppressed = (keep.astype(jnp.float32) @ gf) > 0.0
        new_keep = valid & ~suppressed
        return it + 1, new_keep, jnp.any(new_keep != keep)

    _, keep, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), valid, jnp.bool_(True))
    )
    return keep


@partial(jax.jit, static_argnames=("max_output_size", "iou_threshold"))
def non_max_suppression(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output_size: int,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
):
    """Fixed-shape greedy NMS.

    Args:
      boxes: ``[N, 4]`` (y1, x1, y2, x2), any consistent coordinate scale.
      scores: ``[N]``.
      max_output_size: static output slot count.
      iou_threshold: suppression threshold.
      valid: optional ``[N]`` bool mask of real (non-padding) rows.

    Returns:
      ``(indices, out_valid)``: ``indices [max_output_size]`` int32 indices
      into the input (padded with 0 where ``out_valid`` is False), ordered by
      descending score — the contract of ``tf.image.non_max_suppression``
      plus an explicit validity mask instead of dynamic length.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    scores = jnp.where(valid, scores, _NEG_INF)
    order = jnp.argsort(-scores)
    boxes_s = jnp.take(boxes, order, axis=0)
    valid_s = jnp.take(valid, order, axis=0)

    iou = overlaps(boxes_s, boxes_s)
    keep = _greedy_keep_from_iou(iou, valid_s, iou_threshold)

    # Stable-compact kept entries (already score-ordered) into output slots.
    keep_scores = jnp.where(keep, scores[order], _NEG_INF)
    if n < max_output_size:  # pad up so output always has max_output_size slots
        pad = max_output_size - n
        keep_scores = jnp.concatenate([keep_scores, jnp.full((pad,), _NEG_INF)])
        keep = jnp.concatenate([keep, jnp.zeros((pad,), bool)])
        order = jnp.concatenate([order, jnp.zeros((pad,), order.dtype)])
    top = jnp.argsort(-keep_scores)[:max_output_size]
    out_valid = jnp.take(keep, top)
    indices = jnp.where(out_valid, jnp.take(order, top), 0)
    return indices.astype(jnp.int32), out_valid


def nms_padded_boxes(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output_size: int,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
):
    """NMS returning gathered, zero-padded boxes (ProposalLayer contract:
    mrcnn_layers.py:224-231 pads the NMS output with zeros to a fixed count).

    Returns ``(out_boxes [M, 4], out_scores [M], out_valid [M])``.
    """
    idx, out_valid = non_max_suppression(
        boxes, scores, max_output_size, iou_threshold, valid
    )
    out_boxes = jnp.where(out_valid[:, None], jnp.take(boxes, idx, axis=0), 0.0)
    out_scores = jnp.where(out_valid, jnp.take(scores, idx), 0.0)
    return out_boxes, out_scores, out_valid
