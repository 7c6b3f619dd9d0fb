"""Proposal generation: top-k scored anchors -> delta decode -> clip -> NMS.

Fixed-shape replacement for the reference ``ProposalLayer``
(mrcnn_layers.py:203-280), whose per-image python loop (``utils.batch_slice``,
utils.py:738-772) becomes ``jax.vmap`` here; its ``tf.nn.top_k`` +
``tf.image.non_max_suppression`` become static top-k + the fixed-shape greedy
NMS in ``ops.nms`` (or the Pallas kernel when enabled). This is also the
TPU-native equivalent of NVIDIA's C++ ``ProposalLayer_TRT`` plugin
(inference_optimize.py:124-164).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.ops.boxes import apply_box_deltas, clip_boxes
from maskrcnn_tf2_tpu.ops.nms import nms_padded_boxes
from maskrcnn_tf2_tpu.ops.topk import binned_top_k

# Clamp log-size deltas before exp so an untrained/exploding RPN cannot
# produce inf boxes (standard detectron BBOX_XFORM_CLIP = log(1000/16)).
_DELTA_CLIP = 4.135166556742356


from maskrcnn_tf2_tpu.utils.platform import on_tpu as _on_tpu  # shared probe


def _pre_nms_top_k(scores: jnp.ndarray, pre_nms_limit: int, approx_topk: bool):
    """Descending (scores, idx) of the top ``pre_nms_limit`` anchors."""
    pre = min(pre_nms_limit, scores.shape[0])
    if approx_topk and scores.shape[0] >= 4 * pre and _on_tpu():
        # Two-stage binned top-k (ops/topk.py) instead of the full stable
        # sort lax.top_k lowers to (sort of 262k anchors = 4.5 ms/b16 on
        # v5e; lax.approx_max_k silently fell back to the SAME full sort at
        # k=6000/recall 0.99). Recall ~0.999 of the true top-k; misses are
        # at the low-score boundary where NMS keeps none. Off-TPU this
        # branch is not taken, so CPU oracle parity
        # (tests/test_funnel_parity.py) is bit-unchanged.
        return binned_top_k(scores, pre)
    return jax.lax.top_k(scores, pre)


def _decode_and_nms(
    top_scores: jnp.ndarray,  # [pre] descending
    top_deltas: jnp.ndarray,  # [pre, 4] f32, std-scaled, unclipped
    top_anchors: jnp.ndarray,  # [pre, 4] normalized
    proposal_count: int,
    nms_threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared decode/clip/NMS tail of the dense and slim funnels — one
    definition so a decoding fix can never diverge the two paths the
    slim-vs-dense equivalence tests pin."""
    top_deltas = jnp.clip(top_deltas, -_DELTA_CLIP, _DELTA_CLIP)
    boxes = apply_box_deltas(top_anchors, top_deltas)
    boxes = clip_boxes(boxes, jnp.array([0.0, 0.0, 1.0, 1.0], boxes.dtype))
    # top_scores came out of (binned_)top_k, i.e. already descending: skip
    # the re-sort inside NMS (presorted fast path; ~4.5 ms of argsorts at
    # b16).
    out_boxes, _, out_valid = nms_padded_boxes(
        boxes, top_scores, proposal_count, nms_threshold, presorted=True
    )
    return out_boxes, out_valid


def _proposals_one_image(
    scores: jnp.ndarray,  # [A] foreground prob
    deltas: jnp.ndarray,  # [A, 4] (already std-scaled)
    anchors: jnp.ndarray,  # [A, 4] normalized
    pre_nms_limit: int,
    proposal_count: int,
    nms_threshold: float,
    approx_topk: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    top_scores, top_idx = _pre_nms_top_k(scores, pre_nms_limit, approx_topk)
    top_deltas = jnp.take(deltas, top_idx, axis=0)
    top_anchors = jnp.take(anchors, top_idx, axis=0)
    return _decode_and_nms(
        top_scores, top_deltas, top_anchors, proposal_count, nms_threshold
    )


@partial(
    jax.jit,
    static_argnames=(
        "pre_nms_limit", "proposal_count", "nms_threshold", "approx_topk"
    ),
)
def generate_proposals(
    rpn_probs: jnp.ndarray,  # [B, A, 2] (bg, fg) softmax
    rpn_deltas: jnp.ndarray,  # [B, A, 4]
    anchors: jnp.ndarray,  # [A, 4] normalized
    rpn_bbox_std: Tuple[float, ...],
    pre_nms_limit: int,
    proposal_count: int,
    nms_threshold: float,
    approx_topk: bool = False,
):
    """Batched proposals.

    Returns ``(proposals [B, proposal_count, 4] normalized zero-padded,
    valid [B, proposal_count] bool)`` — the reference pads with zeros and has
    no validity mask; downstream consumers here get the mask for free.
    """
    # Proposals are a gradient-free selection: RPN weights learn through the
    # RPN losses, and ROIAlign stop-gradients its boxes (the reference's
    # semantics, mrcnn_layers.py:617-641). This also lets the
    # non-differentiable Pallas NMS kernel run inside the training graph.
    rpn_probs = jax.lax.stop_gradient(rpn_probs)
    rpn_deltas = jax.lax.stop_gradient(rpn_deltas)
    scores = rpn_probs[..., 1].astype(jnp.float32)
    deltas = rpn_deltas.astype(jnp.float32) * jnp.asarray(
        rpn_bbox_std, jnp.float32
    )
    fn = partial(
        _proposals_one_image,
        pre_nms_limit=pre_nms_limit,
        proposal_count=proposal_count,
        nms_threshold=nms_threshold,
        approx_topk=approx_topk,
    )
    batched = jax.vmap(fn, in_axes=(0, 0, None))
    # Under GSPMD tracing (utils.platform.pallas_spmd scope) with the Pallas
    # NMS engaged, run the whole per-image funnel as a shard_map island over
    # the data axis so the kernel survives auto-partitioning.
    from maskrcnn_tf2_tpu.ops.nms import _use_pallas
    from maskrcnn_tf2_tpu.utils.platform import spmd_shard_batched

    if _use_pallas():
        batched = spmd_shard_batched(batched, 2, 1)
    return batched(scores, deltas, anchors)


def _proposals_one_image_slim(
    rank: jnp.ndarray,  # [A] f32 fg-bg logit diff (monotone in fg prob)
    p5: jnp.ndarray,  # [A, 5] (diff, dy, dx, dh, dw) compute-dtype
    anchors: jnp.ndarray,  # [A, 4] normalized
    std: jnp.ndarray,  # [4] f32
    pre_nms_limit: int,
    proposal_count: int,
    nms_threshold: float,
    approx_topk: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    top_scores, top_idx = _pre_nms_top_k(rank, pre_nms_limit, approx_topk)
    # ONE row gather fetches score + deltas together (the dense path gathers
    # deltas and anchors from two [A, ...] f32 tensors).
    rows = jnp.take(p5, top_idx, axis=0)  # [pre, 5]
    top_deltas = rows[:, 1:5].astype(jnp.float32) * std
    top_anchors = jnp.take(anchors, top_idx, axis=0)
    return _decode_and_nms(
        top_scores, top_deltas, top_anchors, proposal_count, nms_threshold
    )


@partial(
    jax.jit,
    static_argnames=(
        "pre_nms_limit", "proposal_count", "nms_threshold", "approx_topk"
    ),
)
def generate_proposals_slim(
    rank: jnp.ndarray,  # [B, A] f32 fg-bg logit diff
    p5: jnp.ndarray,  # [B, A, 5] fused (diff, deltas) rows (bf16 ok)
    anchors: jnp.ndarray,  # [A, 4] normalized
    rpn_bbox_std: Tuple[float, ...],
    pre_nms_limit: int,
    proposal_count: int,
    nms_threshold: float,
    approx_topk: bool = False,
):
    """``generate_proposals`` on the slim RPN form (models/rpn.py mode='slim').

    Ranking by the fg-bg logit difference is order-equivalent to ranking by
    softmax fg prob (sigmoid is strictly monotone); top-k, greedy NMS and the
    returned proposals only ever consume score ORDER, so the decoded boxes
    match the dense path up to bf16 rounding of (fg - bg). Deltas convert to
    f32 only AFTER the top-k gather — bf16 -> f32 is lossless, so delta
    decoding is bit-identical to the dense path.
    """
    rank = jax.lax.stop_gradient(rank)
    p5 = jax.lax.stop_gradient(p5)
    std = jnp.asarray(rpn_bbox_std, jnp.float32)
    fn = partial(
        _proposals_one_image_slim,
        pre_nms_limit=pre_nms_limit,
        proposal_count=proposal_count,
        nms_threshold=nms_threshold,
        approx_topk=approx_topk,
    )
    batched = jax.vmap(fn, in_axes=(0, 0, None, None))
    from maskrcnn_tf2_tpu.ops.nms import _use_pallas
    from maskrcnn_tf2_tpu.utils.platform import spmd_shard_batched

    if _use_pallas():  # see generate_proposals
        batched = spmd_shard_batched(batched, 2, 2)
    return batched(rank, p5, anchors, std)
