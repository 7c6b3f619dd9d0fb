"""Pyramid ROIAlign as a single fused gather over a flattened FPN pyramid.

The reference's ``PyramidROIAlign`` (mrcnn_layers.py:554-671) loops over the
four FPN levels, calls ``tf.image.crop_and_resize`` per level, then re-sorts
pooled boxes back into the original order with a merged ``batch*100000+box``
sort key; its deploy path replaces this with NVIDIA's C++
``PyramidROIAlign_TRT`` plugin. The TPU-native design avoids both the
per-level loop and the re-sort:

1. All levels ``P2..P5`` are flattened and concatenated into one
   ``[B, sum(Hl*Wl), C]`` buffer with static per-level offsets.
2. Each ROI's FPN level is computed with the reference's formula
   ``4 + round(log2(sqrt(h*w) / (denominator / sqrt(image_area))))`` clipped
   to [2, 5] (mrcnn_layers.py:596-607; ``denominator`` defaults to the
   reference's 244.0 — its documented typo-for-224 kept for parity).
3. ``tf.image.crop_and_resize`` bilinear semantics (sample grid with endpoints
   on box corners scaled by ``(H_level - 1, W_level - 1)``) reduce to 4 gather
   indices + weights per sample point, all computed vectorized; one
   ``take_along_axis`` gathers every (roi, point, corner) at once.

Result: one big gather + one weighted sum — no per-level control flow, no
dynamic shapes, identical output ordering to the input ROIs.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp


def _use_matmul() -> bool:
    """Separable-matmul sampling on real TPU (MXU) unless overridden via
    MASKRCNN_TPU_ROIALIGN=gather|matmul; scalar gathers are faster on CPU."""
    from maskrcnn_tf2_tpu.utils.platform import on_tpu

    env = os.environ.get("MASKRCNN_TPU_ROIALIGN", "").lower()
    if env in ("gather", "matmul"):
        return env == "matmul"
    return on_tpu()


def roi_level_assignment(
    boxes: jnp.ndarray,
    image_area: float,
    num_levels: int = 4,
    denominator: float = 244.0,
) -> jnp.ndarray:
    """FPN level index (0-based into P2..P5) per ROI.

    Matches reference mrcnn_layers.py:596-607: level = 4 + round(log2(
    sqrt(h*w)/(denominator/sqrt(image_area)))), clipped to [2, 5]; returned
    here shifted to [0, num_levels-1]. Zero-area (padding) boxes map to 0.
    """
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    scale = jnp.sqrt(jnp.maximum(h * w, 1e-12))
    image_scale = denominator / jnp.sqrt(jnp.asarray(image_area, boxes.dtype))
    # jnp.round = round-half-to-even, matching tf.round in the reference.
    lvl = jnp.round(jnp.log2(scale / image_scale)).astype(jnp.int32) + 4
    lvl = jnp.clip(lvl, 2, 2 + num_levels - 1) - 2
    valid = (h > 0) & (w > 0)
    return jnp.where(valid, lvl, 0)


def _flatten_pyramid(features: Sequence[jnp.ndarray]):
    """Concat per-level [B, Hl, Wl, C] maps into [B, S, C] + static metadata."""
    b = features[0].shape[0]
    c = features[0].shape[-1]
    flats, offsets, heights, widths = [], [], [], []
    off = 0
    for f in features:
        _, h, w, _ = f.shape
        flats.append(f.reshape(b, h * w, c))
        offsets.append(off)
        heights.append(h)
        widths.append(w)
        off += h * w
    flat = jnp.concatenate(flats, axis=1)
    return (
        flat,
        jnp.asarray(offsets, jnp.int32),
        jnp.asarray(heights, jnp.int32),
        jnp.asarray(widths, jnp.int32),
    )


def pyramid_roi_align_matmul(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    pool_size: int,
    image_shape: Sequence[int],
    denominator: float = 244.0,
) -> jnp.ndarray:
    """ROIAlign as per-level separable matmuls — the MXU formulation.

    Bilinear sampling is a rank-2 separable linear map: for a ROI on level l,
    ``out = Y @ F_l @ X^T`` with hat-function interpolation matrices
    ``Y [P, Hl]``, ``X [P, Wl]``. Every ROI is pooled from every level with
    its Y zeroed on non-assigned levels, and the level results summed — an
    exact select with no gather anywhere. Scalar gathers (the XLA fallback
    below) run at <10% HBM efficiency on TPU (profiled); dense MXU matmuls
    make this ~an order of magnitude faster despite the 4x level redundancy.
    """
    boxes = jax.lax.stop_gradient(boxes).astype(jnp.float32)
    b, n, _ = boxes.shape
    p = pool_size

    # Chunk the ROI axis so the [B, chunk, P, W, C] contraction intermediate
    # stays bounded (N=1000 x W=256 x C=256 would otherwise materialize GBs).
    # The lax.map chunk loop serializes and its backward adds copies
    # (~7 ms/step profiled), so the budget is generous: training-scale
    # (N<=200, W<=128) stays single-chunk.
    max_w = max(f.shape[2] for f in features)
    c = features[0].shape[-1]
    budget = 1536 * 1024 * 1024
    chunk = max(32, min(n, budget // max(1, b * p * max_w * c * 2)))
    if n > chunk:
        pad = (-n) % chunk
        boxes_p = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        stacked = boxes_p.reshape(b, -1, chunk, 4).swapaxes(0, 1)  # [K, B, chunk, 4]
        outs = jax.lax.map(
            lambda bx: _roi_align_matmul_impl(
                features, bx, p, image_shape, denominator
            ),
            stacked,
        )  # [K, B, chunk, P, P, C]
        out = outs.swapaxes(0, 1).reshape(b, -1, p, p, outs.shape[-1])[:, :n]
        return out
    return _roi_align_matmul_impl(features, boxes, p, image_shape, denominator)


def _roi_align_matmul_impl(
    features, boxes, pool_size, image_shape, denominator
) -> jnp.ndarray:
    num_levels = len(features)
    b, n, _ = boxes.shape
    p = pool_size
    compute_dtype = features[0].dtype

    image_area = float(image_shape[0]) * float(image_shape[1])
    levels = roi_level_assignment(boxes, image_area, num_levels, denominator)
    box_valid = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])

    y1, x1, y2, x2 = (boxes[..., i] for i in range(4))
    if p > 1:
        frac = jnp.arange(p, dtype=jnp.float32) / (p - 1)  # [P]
        ys_n = y1[..., None] + (y2 - y1)[..., None] * frac  # [B, N, P] in [0,1]
        xs_n = x1[..., None] + (x2 - x1)[..., None] * frac
    else:
        ys_n = (0.5 * (y1 + y2))[..., None]
        xs_n = (0.5 * (x1 + x2))[..., None]

    out = None
    for lvl, f in enumerate(features):
        hl, wl = f.shape[1], f.shape[2]
        ys = ys_n * (hl - 1)
        xs = xs_n * (wl - 1)
        sel = (levels == lvl) & box_valid  # [B, N]

        grid_h = jnp.arange(hl, dtype=jnp.float32)
        grid_w = jnp.arange(wl, dtype=jnp.float32)
        ymat = jnp.maximum(0.0, 1.0 - jnp.abs(ys[..., None] - grid_h))  # [B,N,P,Hl]
        ymat = ymat * ((ys >= 0) & (ys <= hl - 1))[..., None]
        ymat = ymat * sel[..., None, None]
        xmat = jnp.maximum(0.0, 1.0 - jnp.abs(xs[..., None] - grid_w))  # [B,N,P,Wl]
        xmat = xmat * ((xs >= 0) & (xs <= wl - 1))[..., None]

        rows = jnp.einsum(
            "bnph,bhwc->bnpwc",
            ymat.astype(compute_dtype),
            f,
            preferred_element_type=jnp.float32,
        )
        lvl_out = jnp.einsum(
            "bnpwc,bnqw->bnpqc",
            rows.astype(compute_dtype),
            xmat.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        out = lvl_out if out is None else out + lvl_out
    return out.astype(compute_dtype)


def pyramid_roi_align_gather(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    pool_size: int,
    image_shape: Sequence[int],
    denominator: float = 244.0,
) -> jnp.ndarray:
    """Crop-and-resize each ROI from its assigned FPN level.

    Args:
      features: list of ``[B, Hl, Wl, C]`` maps, finest first (P2..P5).
      boxes: ``[B, N, 4]`` normalized (y1, x1, y2, x2). Gradients do not flow
        into the boxes (reference applies stop_gradient on crop boxes,
        mrcnn_layers.py:617-641).
      pool_size: output spatial size P.
      image_shape: (H, W, ...) of the input image for the level formula.

    Returns:
      ``[B, N, P, P, C]`` pooled features in the original ROI order.
    """
    boxes = jax.lax.stop_gradient(boxes)
    num_levels = len(features)
    b, n, _ = boxes.shape
    p = pool_size
    compute_dtype = features[0].dtype

    flat, offsets, heights, widths = _flatten_pyramid(features)

    image_area = float(image_shape[0]) * float(image_shape[1])
    levels = roi_level_assignment(
        boxes.astype(jnp.float32), image_area, num_levels, denominator
    )  # [B, N]

    # Per-ROI level geometry.
    lvl_h = jnp.take(heights, levels)  # [B, N]
    lvl_w = jnp.take(widths, levels)
    lvl_off = jnp.take(offsets, levels)

    y1, x1, y2, x2 = (boxes.astype(jnp.float32)[..., i] for i in range(4))
    # crop_and_resize sample grid: endpoints at box corners, scaled by (dim-1).
    hm1 = (lvl_h - 1).astype(jnp.float32)[..., None]  # [B, N, 1]
    wm1 = (lvl_w - 1).astype(jnp.float32)[..., None]
    if p > 1:
        frac = jnp.arange(p, dtype=jnp.float32) / (p - 1)  # [P]
        ys = (y1[..., None] + (y2 - y1)[..., None] * frac) * hm1  # [B, N, P]
        xs = (x1[..., None] + (x2 - x1)[..., None] * frac) * wm1
    else:
        ys = (0.5 * (y1 + y2))[..., None] * hm1
        xs = (0.5 * (x1 + x2))[..., None] * wm1

    # Bilinear corners and weights (boxes are pre-clipped to [0,1], so clamp
    # to the valid grid rather than zero-extrapolate).
    def corners(coord, size):
        c0 = jnp.clip(jnp.floor(coord), 0, (size - 1).astype(jnp.float32)[..., None])
        c1 = jnp.clip(c0 + 1, 0, (size - 1).astype(jnp.float32)[..., None])
        t = jnp.clip(coord - c0, 0.0, 1.0)
        return c0.astype(jnp.int32), c1.astype(jnp.int32), t

    y0, y1i, ty = corners(ys, lvl_h)  # [B, N, P]
    x0, x1i, tx = corners(xs, lvl_w)

    # Linear indices into the flattened pyramid for the 4 corners of each
    # (roi, grid_y, grid_x) sample: idx = off + y * W_level + x.
    off = lvl_off[..., None, None]  # [B, N, 1, 1]
    wl = lvl_w[..., None, None]
    yy0 = y0[..., :, None] * wl  # [B, N, P, 1]
    yy1 = y1i[..., :, None] * wl
    xx0 = x0[..., None, :]  # [B, N, 1, P]
    xx1 = x1i[..., None, :]

    # 4-corner row gathers. (A paired slice_sizes=(2, C) lax.gather variant
    # measured ~40% SLOWER end-to-end — XLA lowers the strided-slice gather
    # worse than four plain row gathers; keep it simple.)
    idx = jnp.stack(
        [off + yy0 + xx0, off + yy0 + xx1, off + yy1 + xx0, off + yy1 + xx1],
        axis=-1,
    )  # [B, N, P, P, 4]

    wy1 = ty[..., :, None]  # weight toward y1 corner
    wx1 = tx[..., None, :]
    weights = jnp.stack(
        [
            (1.0 - wy1) * (1.0 - wx1),
            (1.0 - wy1) * wx1,
            wy1 * (1.0 - wx1),
            wy1 * wx1,
        ],
        axis=-1,
    )  # [B, N, P, P, 4]

    gathered = jnp.take_along_axis(
        flat, idx.reshape(b, -1)[..., None], axis=1
    )  # [B, N*P*P*4, C]
    gathered = gathered.reshape(b, n, p, p, 4, -1)
    out = jnp.sum(gathered * weights[..., None].astype(compute_dtype), axis=-2)
    # Zero-pad ROIs pool zeros (tf.crop_and_resize would sample pixel (0,0);
    # zero output is the cleaner contract and matches the matmul path).
    fb = boxes.astype(jnp.float32)
    box_valid = (fb[..., 2] > fb[..., 0]) & (fb[..., 3] > fb[..., 1])
    return out * box_valid[..., None, None, None].astype(out.dtype)


def pyramid_roi_align(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    pool_size: int,
    image_shape: Sequence[int],
    denominator: float = 244.0,
    training: bool = False,
) -> jnp.ndarray:
    """Mode/device-appropriate dispatch; both paths implement identical
    sampling semantics.

    * training on TPU -> matmul formulation: the gather's backward is a
      scatter-add that runs at <10% HBM efficiency (profiled ~27 ms/step);
      the MXU matmul fwd+bwd is ~10x cheaper at ROI counts ~200.
    * inference on TPU -> gather: forward-only, and at 1000 proposals the
      matmul's dense H x W contraction costs more than the gather
      (measured 68 vs 56 img/s R101@1024).
    * CPU -> always gather (no MXU; tests/oracles).
    """
    from maskrcnn_tf2_tpu.utils.platform import (
        on_tpu,
        pallas_allowed,
        pallas_forced_interpret,
        spmd_shard_batched,
    )

    env = os.environ.get("MASKRCNN_TPU_ROIALIGN", "").lower()
    if env in ("pallas", "gather", "matmul"):
        choice = env
    else:
        # TPU default: the exact Pallas two-mode DMA kernel, both modes —
        # measured vs the XLA paths at both scales (scripts/bench_roialign.py;
        # custom VJP covers training). CPU: gather (no MXU; tests/oracles),
        # unless MASKRCNN_TPU_PALLAS=interpret forces the kernel wiring.
        choice = (
            "pallas" if on_tpu() or pallas_forced_interpret() else "gather"
        )
    if choice == "pallas" and not pallas_allowed():
        # no_pallas() scope: fall through to the XLA implementations;
        # training still picks the matmul path below.
        choice = "gather"
    if choice == "pallas":
        from maskrcnn_tf2_tpu.kernels.roi_align_pallas import pyramid_roi_align_pallas

        def call(feats, bx):
            return pyramid_roi_align_pallas(
                feats,
                bx,
                pool_size,
                image_shape,
                denominator,
                interpret=pallas_forced_interpret(),
            )

        # Under GSPMD (utils.platform.pallas_spmd scope) the kernel runs as a
        # per-data-shard shard_map island; identity wrapper otherwise.
        return spmd_shard_batched(call, 2)(list(features), boxes)
    if choice == "matmul" or (training and _use_matmul()):
        return pyramid_roi_align_matmul(
            features, boxes, pool_size, image_shape, denominator
        )
    return pyramid_roi_align_gather(features, boxes, pool_size, image_shape, denominator)


def pyramid_roi_align_deferred(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    pool_size: int,
    image_shape: Sequence[int],
    denominator: float = 244.0,
):
    """Inference-only variant returning ``(pooled, unsort_slot_or_None)``.

    On the TPU Pallas grouped path the pooled features stay in the kernel's
    segment-sorted padded layout and ``slot [B, N]`` is returned so callers
    can defer the unsort past their per-ROI heads (the feature-sized unsort
    gather was ~2.8 ms/batch at 16k ROIs; the head outputs are ~200x
    smaller). Everywhere else ``slot is None`` and ``pooled`` is already in
    original ROI order with exactly N rows.
    """
    from maskrcnn_tf2_tpu.utils.platform import (
        on_tpu,
        pallas_allowed,
        pallas_forced_interpret,
        spmd_shard_batched,
    )

    env = os.environ.get("MASKRCNN_TPU_ROIALIGN", "").lower()
    if env in ("gather", "matmul") or not pallas_allowed():
        return (
            pyramid_roi_align(features, boxes, pool_size, image_shape, denominator),
            None,
        )
    if env != "pallas" and not (on_tpu() or pallas_forced_interpret()):
        return (
            pyramid_roi_align(
                features, boxes, pool_size, image_shape, denominator
            ),
            None,
        )
    from maskrcnn_tf2_tpu.kernels.roi_align_pallas import (
        pyramid_roi_align_pallas_deferred,
    )

    def call(feats, bx):
        return pyramid_roi_align_pallas_deferred(
            feats,
            bx,
            pool_size,
            image_shape,
            denominator,
            interpret=pallas_forced_interpret(),
        )

    # GSPMD tracing: per-data-shard shard_map island (see pyramid_roi_align).
    return spmd_shard_batched(call, 2)(list(features), boxes)
