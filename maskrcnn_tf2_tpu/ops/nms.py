"""Fixed-shape non-max suppression for TPU.

The reference relies on ``tf.image.non_max_suppression`` inside
``ProposalLayer`` (mrcnn_layers.py:203-280) and per-class NMS inside
``DetectionLayer.refine_detections`` (mrcnn_layers.py:369-501); its deploy
path swaps these for NVIDIA's C++ TRT plugins (``ProposalLayer_TRT``,
``DetectionLayer_TRT``). Here NMS is a first-class fixed-shape device op:

* everything is padded/static — XLA/TPU friendly, vmap-able over batch and
  class axes;
* greedy NMS is computed **tile-sequentially**: with boxes sorted by score
  and partitioned into tiles of ``TILE`` boxes, all boxes before tile ``i``
  are finalized when tile ``i`` is processed, so one ``[TILE, N]`` IoU block
  suppresses the tile from the finalized prefix, and a short fixpoint
  iteration on the ``[TILE, TILE]`` diagonal block settles within-tile
  suppression chains (depth-bounded, typically < 10 iterations). Total work
  is a fixed O(N^2 / TILE) sweep — no data-dependent full-matrix reiteration.

This file is the XLA reference implementation and semantic oracle; the
Pallas kernel in ``maskrcnn_tf2_tpu.kernels.nms_pallas`` implements the same
tiling fused in VMEM.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.ops.boxes import overlaps

# Python scalar, NOT jnp.float32(...): a module-level jnp constant forces
# backend initialization at import time (observed: `import maskrcnn_tf2_tpu`
# spinning on an unreachable TPU tunnel before any compute was requested).
_NEG_INF = -1e9
TILE = 512


def _use_pallas() -> bool:
    """Pallas kernel on real TPU unless disabled via MASKRCNN_TPU_NMS=xla
    or a surrounding utils.platform.no_pallas() scope; forced (in interpret
    mode) off-TPU by MASKRCNN_TPU_PALLAS=interpret for CPU-mesh tests."""
    from maskrcnn_tf2_tpu.utils.platform import (
        on_tpu,
        pallas_allowed,
        pallas_forced_interpret,
    )

    if os.environ.get("MASKRCNN_TPU_NMS", "").lower() == "xla":
        return False
    return pallas_allowed() and (on_tpu() or pallas_forced_interpret())


def _self_suppress(iou_block: jnp.ndarray, row_valid: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy keep-mask within one score-sorted tile.

    ``iou_block``: [T, T]; ``row_valid``: [T] rows still alive after prefix
    suppression. Fixpoint iteration of the greedy recurrence
    ``keep[i] = valid[i] & !any_{j<i}(keep[j] & iou[j,i] > t)`` — the
    recurrence has a unique fixpoint (induction over sorted order) and each
    iteration settles one suppression-chain level, so the loop exits after
    ``depth(chains) <= T`` iterations.
    """
    t = iou_block.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    g = iou_block & (row < col) & row_valid[:, None] & row_valid[None, :]
    gf = g.astype(jnp.float32)

    def cond(state):
        it, keep, changed = state
        return changed & (it < t)

    def body(state):
        it, keep, _ = state
        suppressed = (keep.astype(jnp.float32) @ gf) > 0.0
        new_keep = row_valid & ~suppressed
        return it + 1, new_keep, jnp.any(new_keep != keep)

    _, keep, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), row_valid, jnp.bool_(True)))
    return keep


def _greedy_keep_tiled(
    boxes_s: jnp.ndarray, valid_s: jnp.ndarray, iou_threshold: float
) -> jnp.ndarray:
    """Greedy NMS keep-mask for score-sorted boxes; exact, tile-sequential.

    boxes_s: [N, 4] (N padded to a multiple of TILE by the caller).
    """
    n = boxes_s.shape[0]
    tile = min(TILE, n)
    num_tiles = n // tile
    col_idx = jnp.arange(n)

    def tile_body(i, keep):
        start = i * tile
        rows = jax.lax.dynamic_slice(boxes_s, (start, 0), (tile, 4))
        iou_all = overlaps(rows, boxes_s) > iou_threshold  # [T, N] bool
        # (a) suppression by the finalized prefix (< start)
        prefix = keep & (col_idx < start)
        cross = jnp.any(iou_all & prefix[None, :], axis=1)
        row_valid = jax.lax.dynamic_slice(valid_s, (start,), (tile,)) & ~cross
        # (b) within-tile chains on the diagonal block
        diag = jax.lax.dynamic_slice(iou_all, (0, start), (tile, tile))
        tile_keep = _self_suppress(diag, row_valid)
        return jax.lax.dynamic_update_slice(keep, tile_keep, (start,))

    keep0 = jnp.zeros((n,), bool)
    return jax.lax.fori_loop(0, num_tiles, tile_body, keep0)


@partial(
    jax.jit, static_argnames=("max_output_size", "iou_threshold", "presorted")
)
def non_max_suppression(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output_size: int,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
    presorted: bool = False,
):
    """Fixed-shape greedy NMS.

    Args:
      boxes: ``[N, 4]`` (y1, x1, y2, x2), any consistent coordinate scale.
      scores: ``[N]``.
      max_output_size: static output slot count.
      iou_threshold: suppression threshold.
      valid: optional ``[N]`` bool mask of real (non-padding) rows.
      presorted: caller guarantees ``scores`` (where ``valid``) are already
        descending — e.g. they came out of ``lax.top_k`` (ProposalLayer).
        Skips the full [N] sort, the profiled hot spot of proposal
        generation (two 6000-row argsorts were ~4.5 ms at batch 16 on v5e).

    Returns:
      ``(indices, out_valid)``: ``indices [max_output_size]`` int32 indices
      into the input (padded with 0 where ``out_valid`` is False), ordered by
      descending score — the contract of ``tf.image.non_max_suppression``
      plus an explicit validity mask instead of dynamic length.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    scores = jnp.where(valid, scores.astype(jnp.float32), _NEG_INF)
    if presorted:
        order = jnp.arange(n, dtype=jnp.int32)
        boxes_s = boxes
        valid_s = valid
    else:
        order = jnp.argsort(-scores)
        boxes_s = jnp.take(boxes, order, axis=0)
        valid_s = jnp.take(valid, order, axis=0)

    if _use_pallas():
        from maskrcnn_tf2_tpu.kernels.nms_pallas import (
            CHUNK as P_CHUNK,
            greedy_keep_pallas,
        )

        # pad to the kernel's prefix-chunk width so it can use wide
        # (overhead-amortizing) column blocks; padding rows are invalid
        pad = (-n) % P_CHUNK
        if pad:
            boxes_s = jnp.concatenate([boxes_s, jnp.zeros((pad, 4), boxes_s.dtype)])
            valid_s = jnp.concatenate([valid_s, jnp.zeros((pad,), bool)])
        # Early exit once max_output_size boxes are kept: only the top
        # max_output_size kept rows (in score order) are consumed below.
        from maskrcnn_tf2_tpu.utils.platform import pallas_forced_interpret

        keep = greedy_keep_pallas(
            boxes_s,
            valid_s,
            iou_threshold,
            limit=max_output_size,
            interpret=pallas_forced_interpret(),
        )[:n]
    else:
        # Pad to a tile multiple (padding rows are invalid).
        tile = min(TILE, max(n, 1))
        pad = (-n) % tile
        if pad:
            boxes_s = jnp.concatenate([boxes_s, jnp.zeros((pad, 4), boxes_s.dtype)])
            valid_s = jnp.concatenate([valid_s, jnp.zeros((pad,), bool)])
        keep = _greedy_keep_tiled(boxes_s, valid_s, iou_threshold)[:n]

    # Stable-compact kept entries (already score-ordered) into output slots.
    # lax.top_k is documented to break ties by lowest index, so on the
    # score-sorted axis it is exactly the stable compaction the former full
    # argsort computed, at ~O(N) instead of a second [N] sort.
    keep_scores = jnp.where(keep, scores[order], _NEG_INF)
    if n < max_output_size:  # pad up so output always has max_output_size slots
        extra = max_output_size - n
        keep_scores = jnp.concatenate([keep_scores, jnp.full((extra,), _NEG_INF)])
        keep = jnp.concatenate([keep, jnp.zeros((extra,), bool)])
        order = jnp.concatenate([order, jnp.zeros((extra,), order.dtype)])
    _, top = jax.lax.top_k(keep_scores, max_output_size)
    out_valid = jnp.take(keep, top)
    indices = jnp.where(out_valid, jnp.take(order, top), 0)
    return indices.astype(jnp.int32), out_valid


def nms_padded_boxes(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_output_size: int,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
    presorted: bool = False,
):
    """NMS returning gathered, zero-padded boxes (ProposalLayer contract:
    mrcnn_layers.py:224-231 pads the NMS output with zeros to a fixed count).

    Returns ``(out_boxes [M, 4], out_scores [M], out_valid [M])``.
    """
    idx, out_valid = non_max_suppression(
        boxes, scores, max_output_size, iou_threshold, valid, presorted=presorted
    )
    out_boxes = jnp.where(out_valid[:, None], jnp.take(boxes, idx, axis=0), 0.0)
    out_scores = jnp.where(out_valid, jnp.take(scores, idx), 0.0)
    return out_boxes, out_scores, out_valid
