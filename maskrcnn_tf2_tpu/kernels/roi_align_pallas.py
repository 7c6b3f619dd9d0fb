"""Pallas TPU kernel: per-ROI patch-DMA ROIAlign (single FPN level).

The third TRT-plugin equivalent (``PyramidROIAlign_TRT``,
inference_optimize.py:168-198) as a native kernel: one grid step per ROI,
double-buffered DMA of the ROI's bounding feature patch HBM->VMEM, then the
separable bilinear contraction (Y @ patch @ X^T) on the MXU. ROIs not
assigned to this level write zeros; summing the per-level outputs yields the
full pyramid ROIAlign (each ROI is on exactly one level).

Approximation bound: the DMA patch is a static ``patch`` x ``patch+8`` window
anchored at the box origin; sample points beyond it clamp to the patch edge.
With the reference level-assignment formula a box's span on its level is
~22 px, so the default ``patch=32`` is exact for aspect ratios up to ~2:1 and
clamps more extreme slivers. Measured on v5e @1024/1000 ROIs/b8:
18.2 ms vs 27.3 ms for the exact XLA gather — opt in with
``MASKRCNN_TPU_ROIALIGN=pallas`` where the approximation is acceptable;
the XLA paths remain the default and the exactness oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    # scalar prefetch
    y_start_ref,  # [G] int32 patch row origin per roi
    x_start_ref,  # [G] int32
    active_ref,  # [G] int32 1 if roi assigned to this level
    # tensor inputs
    feats_ref,  # [H, W, C] in ANY/HBM (per-image handled by caller loop)
    ymat_ref,  # [G, P, PATCH] f32 interpolation rows (VMEM)
    xmat_ref,  # [G, P, PATCH] f32
    # output
    out_ref,  # [G, P, P, C] (VMEM block per grid step: [1, P, P, C])
    # scratch
    patch,  # VMEM [2, PATCH, PATCH, C]
    sem,  # DMA sems [2]
    *,
    patch_y: int,
    patch_x: int,
    n_rois: int,
):
    g = pl.program_id(0)
    slot = jax.lax.rem(g, 2)

    def start_dma(i, slot_i):
        return pltpu.make_async_copy(
            feats_ref.at[
                pl.ds(y_start_ref[i], patch_y),
                pl.ds(pl.multiple_of(x_start_ref[i], 8), patch_x),
                :,
            ],
            patch.at[slot_i],
            sem.at[slot_i],
        )

    # warm-up: first step starts its own DMA; every step prefetches the next
    @pl.when(g == 0)
    def _():
        @pl.when(active_ref[0] == 1)
        def _():
            start_dma(0, 0).start()

    @pl.when((g + 1 < n_rois))
    def _():
        @pl.when(active_ref[g + 1] == 1)
        def _():
            start_dma(g + 1, (g + 1) % 2).start()

    @pl.when(active_ref[g] == 1)
    def _():
        start_dma(g, slot).wait()
        f = patch[slot].astype(jnp.float32)  # [PATCH, PATCH, C]
        c = f.shape[-1]
        ym = ymat_ref[0]  # [P, PATCH] (block over G)
        xm = xmat_ref[0]
        rows = jax.lax.dot_general(
            ym,
            f.reshape(patch_y, patch_x * c),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ym.shape[0], patch_x, c)
        # contract patch-x axis with xm: [P, PATCH, C] x [P, PATCH] -> [P, P, C]
        out = jax.lax.dot_general(
            xm,
            rows.transpose(1, 0, 2).reshape(patch_x, -1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P, P*C]
        out_ref[0] = (
            out.reshape(xm.shape[0], ym.shape[0], c)
            .transpose(1, 0, 2)
            .astype(out_ref.dtype)
        )

    @pl.when(active_ref[g] == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])


def roi_align_level_pallas(
    feats: jnp.ndarray,  # [H, W, C] one image, one level
    boxes: jnp.ndarray,  # [G, 4] normalized
    active: jnp.ndarray,  # [G] bool (assigned to this level & valid)
    pool_size: int,
    patch_size: int = 32,
) -> jnp.ndarray:
    """[G, P, P, C] pooled features; zeros for inactive ROIs."""
    h, w, c = feats.shape
    g = boxes.shape[0]
    p = pool_size
    patch_size = min(patch_size, h, w)

    boxes = boxes.astype(jnp.float32)
    y1, x1, y2, x2 = (boxes[:, i] for i in range(4))
    if p > 1:
        frac = jnp.arange(p, dtype=jnp.float32) / (p - 1)
        ys = (y1[:, None] + (y2 - y1)[:, None] * frac) * (h - 1)  # [G, P]
        xs = (x1[:, None] + (x2 - x1)[:, None] * frac) * (w - 1)
    else:
        ys = (0.5 * (y1 + y2))[:, None] * (h - 1)
        xs = (0.5 * (x1 + x2))[:, None] * (w - 1)

    patch_x = min(patch_size + 8, w)
    y_start = jnp.clip(jnp.floor(ys[:, 0]).astype(jnp.int32), 0, max(h - patch_size, 0))
    # x (sublane dim of the (8,128)-tiled feature layout) must start 8-aligned
    x_start = jnp.clip(jnp.floor(xs[:, 0]).astype(jnp.int32), 0, max(w - patch_x, 0))
    x_start = (x_start // 8) * 8

    # Interpolation matrices relative to the patch origin; samples beyond the
    # patch clamp to its last row/col (hat weights collapse there).
    rel_y = jnp.clip(ys - y_start[:, None].astype(jnp.float32), 0.0, patch_size - 1.0)
    rel_x = jnp.clip(xs - x_start[:, None].astype(jnp.float32), 0.0, patch_x - 1.0)
    ymat = jnp.maximum(
        0.0, 1.0 - jnp.abs(rel_y[:, :, None] - jnp.arange(patch_size, dtype=jnp.float32))
    )  # [G, P, PATCH_Y]
    xmat = jnp.maximum(
        0.0, 1.0 - jnp.abs(rel_x[:, :, None] - jnp.arange(patch_x, dtype=jnp.float32))
    )  # [G, P, PATCH_X]

    out = pl.pallas_call(
        functools.partial(_kernel, patch_y=patch_size, patch_x=patch_x, n_rois=g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # feats stay in HBM
                pl.BlockSpec((1, p, patch_size), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, p, patch_x), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, p, p, c), lambda i, *_: (i, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, patch_size, patch_x, c), feats.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((g, p, p, c), feats.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        y_start,
        x_start,
        active.astype(jnp.int32),
        feats,
        ymat,
        xmat,
    )
    return out


def pyramid_roi_align_pallas(
    features,  # list of [B, Hl, Wl, C]
    boxes: jnp.ndarray,  # [B, N, 4]
    pool_size: int,
    image_shape,
    denominator: float = 244.0,
) -> jnp.ndarray:
    """Full pyramid ROIAlign via the per-level Pallas kernel (sum of levels)."""
    from maskrcnn_tf2_tpu.ops.roi_align import roi_level_assignment

    boxes = jax.lax.stop_gradient(boxes).astype(jnp.float32)
    b, n, _ = boxes.shape
    image_area = float(image_shape[0]) * float(image_shape[1])
    levels = roi_level_assignment(boxes, image_area, len(features), denominator)
    valid = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])

    out = None
    for lvl, f in enumerate(features):
        active = (levels == lvl) & valid
        lvl_out = jax.vmap(
            lambda fi, bi, ai: roi_align_level_pallas(fi, bi, ai, pool_size)
        )(f, boxes, active)
        out = lvl_out if out is None else out + lvl_out
    return out
