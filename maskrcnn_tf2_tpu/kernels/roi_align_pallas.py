"""Pallas TPU kernel: EXACT per-ROI DMA ROIAlign (single FPN level).

The third TRT-plugin equivalent (``PyramidROIAlign_TRT``,
inference_optimize.py:168-198) as a native kernel, exact for every box
aspect ratio and scale (the TRT plugin is exact; so is this). One grid step
per ROI with two DMA modes, selected per ROI on the host side:

* **patch mode** — the ROI's sample grid fits a static ``PATCH_Y x PATCH_X``
  window (true for the typical ROI: the FPN level formula bounds a box's
  on-level scale to ~16-32 px, so only elongated boxes overflow): ONE
  double-buffered DMA of the window, then the separable bilinear
  contraction (Y @ patch @ X^T) on the MXU.
* **strip mode** — any other geometry: ``P`` DMAs of ``[2, W, C]``
  full-width row pairs (one per pooled row). Exact for arbitrarily tall
  boxes (each output row only needs its two neighbor feature rows) and
  arbitrarily wide boxes (the full row serves any x-span); the x
  contraction is a hat-weight matmul over the whole row.

ROIs not assigned to this level write zeros; summing the per-level outputs
yields the full pyramid ROIAlign (each ROI is on exactly one level).
Exactness is pinned against the XLA gather oracle at all aspect ratios in
tests/test_pallas_interpret.py (no tolerance escape hatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_Y = 32
PATCH_X = 40  # 32 + 8 slack so the 8-aligned x origin still covers 31 px


def _kernel(
    # scalar prefetch
    y_start_ref,  # [G] int32 patch-mode row origin per roi
    x_start_ref,  # [G] int32 patch-mode col origin (8-aligned)
    row0_ref,  # [G, P] int32 strip-mode row-pair origins (<= H-2)
    mode_ref,  # [G] int32: 0 = inactive, 1 = patch, 2 = strips
    tmat_ref,  # [G, P] f32 strip-mode within-pair fraction (SMEM scalars)
    # tensor inputs
    feats_ref,  # [H, W, C] in ANY/HBM (per-image handled by caller vmap)
    ymat_ref,  # [G, P, PATCH_Y] f32 patch-mode row interpolation (VMEM block)
    xmat_ref,  # [G, P, PATCH_X] f32 patch-mode col interpolation
    wmat_ref,  # [G, P, W] f32 strip-mode full-width hat weights
    # output
    out_ref,  # [G, P, P, C] (VMEM block per grid step: [1, P, P, C])
    # scratch
    patch,  # VMEM [2, PATCH_Y, PATCH_X, C]
    strips,  # VMEM [2, P, 2, W, C]
    psem,  # DMA sems [2]
    ssem,  # DMA sems [2, P]
    *,
    patch_y: int,
    patch_x: int,
    n_rois: int,
    pool: int,
):
    g = pl.program_id(0)
    slot = jax.lax.rem(g, 2)

    def patch_dma(i, slot_i):
        return pltpu.make_async_copy(
            feats_ref.at[
                pl.ds(y_start_ref[i], patch_y),
                pl.ds(pl.multiple_of(x_start_ref[i], 8), patch_x),
                :,
            ],
            patch.at[slot_i],
            psem.at[slot_i],
        )

    def strip_dma(i, row, slot_i):
        return pltpu.make_async_copy(
            feats_ref.at[pl.ds(row0_ref[i, row], 2), :, :],
            strips.at[slot_i, row],
            ssem.at[slot_i, row],
        )

    def start_dmas(i, slot_i):
        @pl.when(mode_ref[i] == 1)
        def _():
            patch_dma(i, slot_i).start()

        @pl.when(mode_ref[i] == 2)
        def _():
            for r in range(pool):
                strip_dma(i, r, slot_i).start()

    # warm-up: step 0 starts its own DMAs; every step prefetches the next ROI
    @pl.when(g == 0)
    def _():
        start_dmas(0, 0)

    @pl.when(g + 1 < n_rois)
    def _():
        start_dmas(g + 1, (g + 1) % 2)

    def xcontract(rows, xm):
        """rows [P, Wx, C] x xm [P, Wx] -> out [P, P, C] via one MXU matmul."""
        wx, c = rows.shape[1], rows.shape[2]
        out = jax.lax.dot_general(
            xm,
            rows.transpose(1, 0, 2).reshape(wx, pool * c),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P(q), P(p)*C]
        return out.reshape(pool, pool, c).transpose(1, 0, 2)

    @pl.when(mode_ref[g] == 1)
    def _():
        patch_dma(g, slot).wait()
        f = patch[slot].astype(jnp.float32)  # [PATCH_Y, PATCH_X, C]
        c = f.shape[-1]
        ym = ymat_ref[0]  # [P, PATCH_Y]
        rows = jax.lax.dot_general(
            ym,
            f.reshape(patch_y, patch_x * c),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(pool, patch_x, c)
        out_ref[0] = xcontract(rows, xmat_ref[0]).astype(out_ref.dtype)

    @pl.when(mode_ref[g] == 2)
    def _():
        wm = wmat_ref[0]  # [P(q), W]
        for r in range(pool):
            strip_dma(g, r, slot).wait()
            t = tmat_ref[g, r]  # f32 scalar (SMEM) — vector reshapes of the
            # lane-dim t were not lowerable (Mosaic "unsupported shape cast")
            f = strips[slot, r].astype(jnp.float32)  # [2, W, C]
            row = f[0] * (1.0 - t) + f[1] * t  # [W, C]
            o = jax.lax.dot_general(
                wm, row, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [P(q), C]
            out_ref[0, r] = o.astype(out_ref.dtype)

    @pl.when(mode_ref[g] == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])


def _level_geometry(boxes, active, h, w, p, patch_y, patch_x):
    """Per-ROI DMA geometry shared by the forward and backward kernels:
    (y_start, x_start, row0, mode, ymat, xmat, tmat, wmat)."""
    boxes = boxes.astype(jnp.float32)
    y1, x1, y2, x2 = (boxes[:, i] for i in range(4))
    if p > 1:
        frac = jnp.arange(p, dtype=jnp.float32) / (p - 1)
        ys = (y1[:, None] + (y2 - y1)[:, None] * frac) * (h - 1)  # [G, P]
        xs = (x1[:, None] + (x2 - x1)[:, None] * frac) * (w - 1)
    else:
        ys = (0.5 * (y1 + y2))[:, None] * (h - 1)
        xs = (0.5 * (x1 + x2))[:, None] * (w - 1)
    ys = jnp.clip(ys, 0.0, float(h - 1))
    xs = jnp.clip(xs, 0.0, float(w - 1))

    # ---- patch mode geometry (one window DMA) ----
    y_start = jnp.clip(jnp.floor(ys[:, 0]).astype(jnp.int32), 0, max(h - patch_y, 0))
    # x origin aligned down to the (8, 128) sublane tiling of the feature map
    x_start = jnp.clip(jnp.floor(xs[:, 0]).astype(jnp.int32), 0, max(w - patch_x, 0))
    x_start = (x_start // 8) * 8
    rel_y = ys - y_start[:, None].astype(jnp.float32)
    rel_x = xs - x_start[:, None].astype(jnp.float32)
    # a ROI may use the patch iff every sample's 2-tap stencil lies inside
    fits_patch = (
        (rel_y[:, -1] <= patch_y - 1.0001)
        & (rel_x[:, -1] <= patch_x - 1.0001)
        & (rel_y[:, 0] >= 0.0)
        & (rel_x[:, 0] >= 0.0)
    )
    ymat = jnp.maximum(
        0.0, 1.0 - jnp.abs(rel_y[:, :, None] - jnp.arange(patch_y, dtype=jnp.float32))
    )  # [G, P, PATCH_Y]
    xmat = jnp.maximum(
        0.0, 1.0 - jnp.abs(rel_x[:, :, None] - jnp.arange(patch_x, dtype=jnp.float32))
    )  # [G, P, PATCH_X]

    # ---- strip mode geometry (P row-pair DMAs) ----
    row0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, max(h - 2, 0))  # [G, P]
    tmat = ys - row0.astype(jnp.float32)  # in [0, 1]
    wmat = jnp.maximum(
        0.0, 1.0 - jnp.abs(xs[:, :, None] - jnp.arange(w, dtype=jnp.float32))
    )  # [G, P, W]

    mode = jnp.where(active, jnp.where(fits_patch, 1, 2), 0).astype(jnp.int32)
    return y_start, x_start, row0, mode, ymat, xmat, tmat, wmat


def roi_align_level_pallas(
    feats: jnp.ndarray,  # [H, W, C] one image, one level
    boxes: jnp.ndarray,  # [G, 4] normalized
    active: jnp.ndarray,  # [G] bool (assigned to this level & valid)
    pool_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[G, P, P, C] pooled features; zeros for inactive ROIs. Exact."""
    h, w, c = feats.shape
    g = boxes.shape[0]
    p = pool_size
    patch_y = min(PATCH_Y, h)
    patch_x = min(PATCH_X, w)
    y_start, x_start, row0, mode, ymat, xmat, tmat, wmat = _level_geometry(
        boxes, active, h, w, p, patch_y, patch_x
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, patch_y=patch_y, patch_x=patch_x, n_rois=g, pool=p
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # feats stay in HBM
                pl.BlockSpec((1, p, patch_y), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, p, patch_x), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, p, w), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, p, p, c), lambda i, *_: (i, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, patch_y, patch_x, c), feats.dtype),
                pltpu.VMEM((2, p, 2, w, c), feats.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2, p)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((g, p, p, c), feats.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        y_start,
        x_start,
        row0,
        mode,
        tmat,
        feats,
        ymat,
        xmat,
        wmat,
    )
    return out


def _bwd_kernel(
    # scalar prefetch
    y_start_ref,  # [G]
    x_start_ref,  # [G]
    row0_ref,  # [G, P]
    mode_ref,  # [G]
    tmat_ref,  # [G, P] f32 (SMEM scalars)
    # tensor inputs
    dfeats_in_ref,  # [H, W, C] f32 in ANY/HBM — aliased to the output
    dout_ref,  # [G, P, P, C] (VMEM block per step: [1, P, P, C])
    ymat_ref,  # [G, P, PATCH_Y]
    xmat_ref,  # [G, P, PATCH_X]
    wmat_ref,  # [G, P, W]
    # output
    dfeats_ref,  # [H, W, C] f32 in ANY/HBM (same buffer as dfeats_in_ref)
    # scratch
    win,  # VMEM [PATCH_Y, PATCH_X, C] f32
    spair,  # VMEM [2, W, C] f32
    wsem,  # DMA sem
    ssem,  # DMA sem
    *,
    patch_y: int,
    patch_x: int,
    pool: int,
):
    """Transpose of the forward kernel: scatter-accumulate each ROI's pooled
    cotangent back into the level feature map.

    Fully SERIAL per ROI (no double buffering): overlapping ROI windows make
    every read-modify-write of ``dfeats`` a potential RAW hazard with the
    previous ROI's write, so each window is read, accumulated and written
    back with both DMAs awaited before the next grid step touches memory.
    """
    g = pl.program_id(0)
    dout = dout_ref[0].astype(jnp.float32)  # [P, P, C]
    c = dout.shape[-1]

    def drows_from(xm, wx):
        """drows[p, w, c] = sum_q xm[q, w] * dout[p, q, c] — transpose of
        the forward xcontract."""
        d = jax.lax.dot_general(
            xm,  # [P(q), Wx]
            dout.transpose(1, 0, 2).reshape(pool, pool * c),  # [q, p*c]
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Wx, P*C]
        return d.reshape(wx, pool, c).transpose(1, 0, 2)  # [P, Wx, C]

    @pl.when(mode_ref[g] == 1)
    def _():
        ym = ymat_ref[0]  # [P, PATCH_Y]
        drows = drows_from(xmat_ref[0], patch_x)  # [P, PATCH_X, C]
        dpatch = jax.lax.dot_general(
            ym,
            drows.reshape(pool, patch_x * c),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(patch_y, patch_x, c)
        window = dfeats_ref.at[
            pl.ds(y_start_ref[g], patch_y),
            pl.ds(pl.multiple_of(x_start_ref[g], 8), patch_x),
            :,
        ]
        read = pltpu.make_async_copy(window, win, wsem)
        read.start()
        read.wait()
        win[...] = win[...] + dpatch
        write = pltpu.make_async_copy(win, window, wsem)
        write.start()
        write.wait()

    @pl.when(mode_ref[g] == 2)
    def _():
        wm = wmat_ref[0]  # [P(q), W]
        for r in range(pool):
            t = tmat_ref[g, r]  # f32 scalar (SMEM)
            # drow[w, c] = sum_q wm[q, w] * dout[r, q, c]
            drow = jax.lax.dot_general(
                wm, dout[r], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [W, C]
            pair = dfeats_ref.at[pl.ds(row0_ref[g, r], 2), :, :]
            read = pltpu.make_async_copy(pair, spair, ssem)
            read.start()
            read.wait()
            spair[0] = spair[0] + drow * (1.0 - t)
            spair[1] = spair[1] + drow * t
            write = pltpu.make_async_copy(spair, pair, ssem)
            write.start()
            write.wait()


def roi_align_level_bwd_pallas(
    dout: jnp.ndarray,  # [G, P, P, C] cotangent of the pooled output
    boxes: jnp.ndarray,  # [G, 4] normalized
    active: jnp.ndarray,  # [G] bool
    h: int,
    w: int,
    c: int,
    pool_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[H, W, C] f32 cotangent of the level feature map (exact transpose)."""
    g = boxes.shape[0]
    p = pool_size
    patch_y = min(PATCH_Y, h)
    patch_x = min(PATCH_X, w)
    y_start, x_start, row0, mode, ymat, xmat, tmat, wmat = _level_geometry(
        boxes, active, h, w, p, patch_y, patch_x
    )
    zeros = jnp.zeros((h, w, c), jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, patch_y=patch_y, patch_x=patch_x, pool=p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # dfeats init (aliased)
                pl.BlockSpec((1, p, p, c), lambda i, *_: (i, 0, 0, 0)),
                pl.BlockSpec((1, p, patch_y), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, p, patch_x), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, p, w), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((patch_y, patch_x, c), jnp.float32),
                pltpu.VMEM((2, w, c), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((h, w, c), jnp.float32),
        # input index 5 = dfeats_init (after the 5 scalar-prefetch operands)
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        y_start,
        x_start,
        row0,
        mode,
        tmat,
        zeros,
        dout,
        ymat,
        xmat,
        wmat,
    )


def _pyramid_fwd_impl(features, boxes, pool_size, image_shape, denominator, interpret):
    from maskrcnn_tf2_tpu.ops.roi_align import roi_level_assignment

    boxes = jax.lax.stop_gradient(boxes).astype(jnp.float32)
    image_area = float(image_shape[0]) * float(image_shape[1])
    levels = roi_level_assignment(boxes, image_area, len(features), denominator)
    valid = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])

    out = None
    for lvl, f in enumerate(features):
        active = (levels == lvl) & valid
        lvl_out = jax.vmap(
            lambda fi, bi, ai: roi_align_level_pallas(
                fi, bi, ai, pool_size, interpret=interpret
            )
        )(f, boxes, active)
        out = lvl_out if out is None else out + lvl_out
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _pyramid_roi_align_pallas(
    features, boxes, pool_size, image_shape, denominator, interpret, shapes_dtypes
):
    return _pyramid_fwd_impl(features, boxes, pool_size, image_shape, denominator, interpret)


def _pyramid_fwd(features, boxes, pool_size, image_shape, denominator, interpret, shapes_dtypes):
    out = _pyramid_fwd_impl(features, boxes, pool_size, image_shape, denominator, interpret)
    return out, boxes


def _pyramid_bwd(pool_size, image_shape, denominator, interpret, shapes_dtypes, res, dout):
    from maskrcnn_tf2_tpu.ops.roi_align import roi_level_assignment

    boxes = res.astype(jnp.float32)
    image_area = float(image_shape[0]) * float(image_shape[1])
    levels = roi_level_assignment(boxes, image_area, len(shapes_dtypes), denominator)
    valid = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])

    dfeats = []
    for lvl, (shape, dtype) in enumerate(shapes_dtypes):
        _, h, w, c = shape
        dtype = jnp.dtype(dtype)
        active = (levels == lvl) & valid
        df = jax.vmap(
            lambda di, bi, ai: roi_align_level_bwd_pallas(
                di, bi, ai, h, w, c, pool_size, interpret=interpret
            )
        )(dout, boxes, active)
        dfeats.append(df.astype(dtype))
    # boxes get no gradient (reference stop_gradient, mrcnn_layers.py:617-641)
    return dfeats, jnp.zeros_like(boxes)


_pyramid_roi_align_pallas.defvjp(_pyramid_fwd, _pyramid_bwd)


def pyramid_roi_align_pallas(
    features,  # list of [B, Hl, Wl, C]
    boxes: jnp.ndarray,  # [B, N, 4]
    pool_size: int,
    image_shape,
    denominator: float = 244.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full pyramid ROIAlign via the per-level Pallas kernel (sum of levels).

    Differentiable: a custom VJP routes the feature cotangent through the
    serial scatter kernel (``_bwd_kernel``); boxes receive zero gradient,
    matching the reference's stop_gradient on crop boxes.
    """
    return _pyramid_roi_align_pallas(
        list(features),
        boxes,
        int(pool_size),
        (int(image_shape[0]), int(image_shape[1])),
        float(denominator),
        bool(interpret),
        tuple((tuple(f.shape), str(f.dtype)) for f in features),
    )
