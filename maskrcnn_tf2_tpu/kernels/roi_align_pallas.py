"""Pallas TPU kernel: EXACT pyramid ROIAlign, one kernel over all FPN levels.

The third TRT-plugin equivalent (``PyramidROIAlign_TRT``,
inference_optimize.py:168-198) as a native kernel, exact for every box
aspect ratio and scale (the TRT plugin is exact; so is this).

Grid = (batch, roi): each grid step pools ONE ROI from ITS assigned FPN
level — a single pass over the ROIs (an earlier per-level design ran a
kernel per level over all ROIs: 4x the grid steps, 4x the inactive-slot
zero writes, plus a 4-way output sum; and vmapping over batch wrapped every
image in a dynamic-update-slice — folding batch into the grid removes both).

Per ROI the kernel picks one of several DMA geometries, selected host-side:

* **tiered patch mode** — the ROI's sample grid fits a static
  ``py x px`` window from ``TIERS`` (smallest fitting tier wins): ONE DMA
  of the window, then the separable bilinear contraction (Y @ patch @ X^T)
  on the MXU. The FPN level formula bounds a typical box's on-level scale
  to ~10-20 px, so most ROIs take the small tiers — tiering cut the
  end-to-end DMA volume ~45% vs a single 32x40 window. A window that
  reaches the level's edge always fits (samples are clipped to the last
  row/col, so the interpolation weight beyond the window is exactly zero);
  without this rule every full-level box at P5 fell to strip mode.
* **strip mode** — any other geometry (extreme aspect ratios wider/taller
  than the largest tier): ``P`` DMAs of ``[2, W_l, C]`` full-width row
  pairs (one per pooled row). Exact for arbitrarily tall boxes (each
  output row only needs its two neighbor feature rows) and arbitrarily
  wide boxes (the full row serves any x-span).

DMAs run in per-tier ring buffers (depth chosen under a ~12 MB VMEM
budget, prefetch distance ``depth-1``): with one ROI per grid step the
per-DMA issue/wait latency is the bottleneck, not bandwidth — 2-deep
double buffering left the kernel ~2x above its bandwidth floor.

The within-pair fraction ``t`` lives in SMEM scalar prefetch — vector
reshapes moving it across the lane dim are not lowerable (Mosaic
"unsupported shape cast"), so strip rows contract one pooled row at a time
with scalar ``t``.

Differentiable: a custom VJP routes the feature cotangent through a serial
read-modify-write scatter kernel (overlapping ROI windows make every RMW a
potential RAW hazard with the previous ROI's write, so the backward runs
without double buffering); boxes receive zero gradient, matching the
reference's stop_gradient on crop boxes (mrcnn_layers.py:617-641).

Exactness is pinned against the XLA gather oracle at all aspect ratios and
for the VJP in tests/test_pallas_interpret.py (no tolerance escape hatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Patch window tiers, smallest to largest (y, x). x sizes carry +8 slack so
# the 8-aligned x origin still covers (px - 8 - 1) sample columns; the
# largest tier covers every box the FPN level formula maps into ~31 px.
# The (8, 16) tier (spans <= 7 px) is the cheapest at 1/3 the DMA bytes of
# (16, 24) — small boxes land there because the level formula maps a box's
# on-level scale to ~10-20 px only for boxes at the CENTER of a level's
# area range.
TIERS = ((8, 16), (16, 24), (24, 32), (32, 40))
_VMEM_BUDGET = 12 * 1024 * 1024

# Grouped-mode knobs (see _grouped_fwd_impl): ROIs per grid step, the ROI
# count above which grouping pays for its (level, tier)-segment padding, and
# the larger VMEM budget the G-wide DMA rings need.
GROUP = 8
GROUP_MIN = 256
_VMEM_BUDGET_GROUPED = 40 * 1024 * 1024


def _effective_tiers(level_hw_s):
    """TIERS clamped to the largest level's storage dims, deduplicated."""
    hmax = max(h for h, _ in level_hw_s)
    wmax = max(w for _, w in level_hw_s)
    tiers, seen = [], set()
    for py, px in TIERS:
        t = (min(py, hmax), min(px, wmax))
        if t not in seen:
            seen.add(t)
            tiers.append(t)
    return tuple(tiers)


def _ring_depths(tiers, pool, w_max, c, itemsize):
    """Per-tier DMA ring depths + strip ring depth under the VMEM budget.

    Deeper rings on the small (common) tiers hide per-DMA latency; the
    strip path is rare and stays at classic double buffering.
    """
    strip_depth = 2
    strip_bytes = strip_depth * pool * 2 * w_max * c * itemsize
    for cand in ((12, 8, 6, 4), (8, 6, 4, 3), (6, 4, 3, 2), (4, 3, 2, 2),
                 (3, 2, 2, 2), (2, 2, 2, 2)):
        depths = tuple(cand[: len(tiers)])
        if len(depths) < len(tiers):
            depths = depths + (2,) * (len(tiers) - len(depths))
        tot = strip_bytes + sum(
            d * py * px * c * itemsize for d, (py, px) in zip(depths, tiers)
        )
        if tot <= _VMEM_BUDGET:
            return depths, strip_depth
    return (2,) * len(tiers), strip_depth


def _pyramid_geometry(
    boxes, valid, levels, level_hw, p, tiers, level_hw_s, with_mats=True
):
    """Per-ROI DMA geometry at each ROI's assigned level.

    boxes: [N, 4] normalized; valid: [N] bool; levels: [N] int32 in
    [0, L); level_hw: static list of (H_l, W_l) SAMPLING dims;
    level_hw_s: STORAGE dims (levels smaller than the 8-sublane tile are
    zero-padded up to 8 — VMEM slices below 8 are not lowerable). Sampling
    math uses the original dims; window clamps use the storage dims.

    Returns per-ROI ``(y_start, x_start, y1f, mode, dy, ymat, xmat, wmat)``
    where ``mode`` is 0 = inactive, 1..T = patch tier t-1 (smallest fitting
    window from ``tiers``), T+1 = strip. With ``with_mats=False`` the
    interpolation matrices are skipped (placement-only pass, used by the
    grouped kernel to assign segment slots before recomputing the full
    geometry on the sorted boxes) and the tuple ends at ``dy``.
    """
    boxes = boxes.astype(jnp.float32)
    n_tiers = len(tiers)
    patch_y = max(py for py, _ in tiers)
    patch_x = max(px for _, px in tiers)
    w_max = max(w for _, w in level_hw_s)
    y1, x1, y2, x2 = (boxes[:, i] for i in range(4))

    outs = {}
    for lvl, (h, w) in enumerate(level_hw):
        h_s, w_s = level_hw_s[lvl]
        if p > 1:
            frac = jnp.arange(p, dtype=jnp.float32) / (p - 1)
            ys = (y1[:, None] + (y2 - y1)[:, None] * frac) * (h - 1)  # [N, P]
            xs = (x1[:, None] + (x2 - x1)[:, None] * frac) * (w - 1)
        else:
            ys = (0.5 * (y1 + y2))[:, None] * (h - 1)
            xs = (0.5 * (x1 + x2))[:, None] * (w - 1)
        ys = jnp.clip(ys, 0.0, float(h - 1))
        xs = jnp.clip(xs, 0.0, float(w - 1))

        # Smallest fitting tier per ROI. A window that reaches the level's
        # sampling edge always fits: clipping bounds the last sample at
        # exactly (h-1) - y_start <= py - 1, so the interpolation weight
        # beyond the window is exactly zero (no epsilon needed there).
        tier_idx = jnp.full(ys.shape[0], n_tiers, jnp.int32)  # T = none/strip
        y_start = jnp.zeros(ys.shape[0], jnp.int32)
        x_start = jnp.zeros(ys.shape[0], jnp.int32)
        for t in reversed(range(n_tiers)):
            py, px = min(tiers[t][0], h_s), min(tiers[t][1], w_s)
            y0 = jnp.clip(jnp.floor(ys[:, 0]).astype(jnp.int32), 0, max(h_s - py, 0))
            x0 = jnp.clip(jnp.floor(xs[:, 0]).astype(jnp.int32), 0, max(w_s - px, 0))
            x0 = (x0 // 8) * 8  # align to the (8, 128) feature tiling
            fit_y = (ys[:, -1] - y0.astype(jnp.float32) <= py - 1.0001) | (
                y0 + py >= h
            )
            fit_x = (xs[:, -1] - x0.astype(jnp.float32) <= px - 1.0001) | (
                x0 + px >= w
            )
            fits = fit_y & fit_x
            tier_idx = jnp.where(fits, t, tier_idx)
            y_start = jnp.where(fits, y0, y_start)
            x_start = jnp.where(fits, x0, x_start)
        mode_lvl = jnp.where(tier_idx < n_tiers, tier_idx + 1, n_tiers + 1)

        per_level = [
            ("y_start", y_start),
            ("x_start", x_start),
            ("mode", mode_lvl),
        ]
        if with_mats:
            rel_y = ys - y_start[:, None].astype(jnp.float32)
            rel_x = xs - x_start[:, None].astype(jnp.float32)
            ymat = jnp.maximum(
                0.0,
                1.0
                - jnp.abs(rel_y[:, :, None] - jnp.arange(patch_y, dtype=jnp.float32)),
            )  # [N, P, PATCH_Y] (zero weight beyond the chosen tier's window)
            xmat = jnp.maximum(
                0.0,
                1.0
                - jnp.abs(rel_x[:, :, None] - jnp.arange(patch_x, dtype=jnp.float32)),
            )
            wmat = jnp.maximum(
                0.0,
                1.0 - jnp.abs(xs[:, :, None] - jnp.arange(w_max, dtype=jnp.float32)),
            )
            wmat = wmat * (jnp.arange(w_max) < w)  # no weight beyond the level width
            per_level += [("ymat", ymat), ("xmat", xmat), ("wmat", wmat)]

        is_l = levels == lvl
        for key, val in per_level:
            prev = outs.get(key)
            if prev is None:
                outs[key] = val
            else:
                m = is_l.reshape((-1,) + (1,) * (val.ndim - 1))
                outs[key] = jnp.where(m, val, prev)

    mode = jnp.where(valid, outs["mode"], 0).astype(jnp.int32)
    # strip rows are derived IN-KERNEL from two normalized scalars per ROI
    # (ys_r = (y1 + (y2-y1) * r/(P-1)) * (H_l-1), the oracle's exact op
    # order): shipping [N, P] row origins + fractions through SMEM scalar
    # prefetch exceeds the 1 MB SMEM budget at batch 16 (~440 KB each).
    if p > 1:
        y1f = y1
        dy = y2 - y1
    else:
        y1f = 0.5 * (y1 + y2)
        dy = jnp.zeros_like(y1f)
    base = (outs["y_start"], outs["x_start"], y1f, mode, dy)
    if not with_mats:
        return base
    return base + (outs["ymat"], outs["xmat"], outs["wmat"])


def _fwd_kernel(
    # scalar prefetch (SMEM) — all FLATTENED to 1-D: ranked SMEM operands
    # pad their last dim to 128 lanes (a [B, G, P] int32 would claim 4 MB of
    # the 1 MB SMEM); 1-D arrays are stored densely.
    level_ref,  # [B*G] int32 assigned level
    y_start_ref,  # [B*G] int32 patch-mode row origin
    x_start_ref,  # [B*G] int32 patch-mode col origin (8-aligned)
    y1f_ref,  # [B*G] f32 strip-mode first sample row (level scale)
    mode_ref,  # [B*G] int32: 0 inactive, 1..T patch tier, T+1 strips
    dy_ref,  # [B*G] f32 strip-mode row span (ys_r = y1f + dy * r/(P-1))
    # tensor inputs / output / scratch (see unpacking below)
    *refs,
    tiers: tuple,
    depths: tuple,
    strip_depth: int,
    pool: int,
    n_rois: int,
    batch: int,
    level_hw: tuple,  # storage dims (padded to >= 8) — DMA extents
    level_h_orig: tuple,  # original level heights — strip sampling scale
    flat_bc: bool = False,  # feats are [H, W, B*C] (bitcast of conv layout)
):
    n_levels = len(level_hw)
    n_tiers = len(tiers)
    strip_mode = n_tiers + 1
    feats = refs[:n_levels]
    ymat_ref, xmat_ref, wmat_ref, out_ref = refs[n_levels : n_levels + 4]
    scratch = refs[n_levels + 4 :]
    patches = scratch[:n_tiers]
    strips = scratch[n_tiers]
    psems = scratch[n_tiers + 1 : 2 * n_tiers + 1]
    ssem = scratch[2 * n_tiers + 1]

    b = pl.program_id(0)
    g = pl.program_id(1)
    step = b * n_rois + g
    total = batch * n_rois

    def strip_row(st, r, h):
        """(row0, t) scalars for pooled row r, recomputed from the ROI's
        normalized (y1, y2-y1) — same op order as the host/oracle geometry
        so results are bit-identical."""
        frac = (r / (pool - 1)) if pool > 1 else 0.0
        ys_r = (y1f_ref[st] + dy_ref[st] * frac) * float(h - 1)
        ys_r = jnp.clip(ys_r, 0.0, float(h - 1))
        row0 = jnp.clip(jnp.floor(ys_r).astype(jnp.int32), 0, max(h - 2, 0))
        return row0, ys_r - row0.astype(jnp.float32)

    c_feat = out_ref.shape[-1]

    def patch_dma(bb, st, t, slot_i, lvl):
        # When flat_bc, feats are [H, W, B*C] — the row-major view of the
        # conv output's native {3,0,2,1} layout, so the host-side
        # transpose+reshape feeding the kernel is a free bitcast (a
        # [B,H,W,C] operand forced XLA to emit a 1.6 ms/batch relayout copy
        # of P2 before every pallas_call). The image is picked by a
        # lane-dim slice at bb*C (128-aligned since C % 128 == 0; a [B]
        # sublane slice of extent 1 is rejected by Mosaic).
        h, w = level_hw[lvl]
        py, px = min(tiers[t][0], h), min(tiers[t][1], w)
        if flat_bc:
            src = feats[lvl].at[
                pl.ds(y_start_ref[st], py),
                pl.ds(pl.multiple_of(x_start_ref[st], 8), px),
                pl.ds(pl.multiple_of(bb * c_feat, 128), c_feat),
            ]
        else:
            src = feats[lvl].at[
                bb,
                pl.ds(y_start_ref[st], py),
                pl.ds(pl.multiple_of(x_start_ref[st], 8), px),
                :,
            ]
        return pltpu.make_async_copy(
            src,
            patches[t].at[slot_i, pl.ds(0, py), pl.ds(0, px), :],
            psems[t].at[slot_i],
        )

    def strip_dma(bb, st, row, slot_i, lvl):
        w = level_hw[lvl][1]
        row0, _ = strip_row(st, row, level_h_orig[lvl])
        if flat_bc:
            src = feats[lvl].at[
                pl.ds(row0, 2), :, pl.ds(pl.multiple_of(bb * c_feat, 128), c_feat)
            ]
        else:
            src = feats[lvl].at[bb, pl.ds(row0, 2), :, :]
        return pltpu.make_async_copy(
            src,
            strips.at[slot_i, row, :, pl.ds(0, w), :],
            ssem.at[slot_i, row],
        )

    def start_patch(j, bb, t, lvl):
        patch_dma(bb, j, t, jax.lax.rem(j, depths[t]), lvl).start()

    def start_strips(j, bb, lvl):
        slot_i = jax.lax.rem(j, strip_depth)
        for r in range(pool):
            strip_dma(bb, j, r, slot_i, lvl).start()

    # Warm-up: step 0 starts every DMA whose owning step precedes its ring's
    # prefetch distance (step j's DMA is otherwise started at step
    # j - (depth_mode - 1); distance depth-1 keeps the in-flight slot
    # disjoint from the slot being consumed this step).
    max_dist = max(max(depths), strip_depth) - 1

    @pl.when(step == 0)
    def _():
        for k in range(min(max_dist, total)):  # static python loop
            bb_k = k // n_rois
            for lvl in range(n_levels):
                on_lvl = level_ref[k] == lvl
                for t in range(n_tiers):
                    if k < depths[t] - 1:

                        @pl.when((mode_ref[k] == t + 1) & on_lvl)
                        def _(k=k, bb_k=bb_k, t=t, lvl=lvl):
                            start_patch(k, bb_k, t, lvl)

                if k < strip_depth - 1:

                    @pl.when((mode_ref[k] == strip_mode) & on_lvl)
                    def _(k=k, bb_k=bb_k, lvl=lvl):
                        start_strips(k, bb_k, lvl)

    # Steady-state prefetch: distance depth-1 per ring (grouped by distance
    # so each future step index is computed once).
    dist_groups = {}
    for t in range(n_tiers):
        dist_groups.setdefault(depths[t] - 1, []).append(t + 1)
    dist_groups.setdefault(strip_depth - 1, []).append(strip_mode)
    for dist, modes in sorted(dist_groups.items()):

        @pl.when(step + dist < total)
        def _(dist=dist, modes=modes):
            j = step + dist
            bb = j // n_rois
            for lvl in range(n_levels):
                on_lvl = level_ref[j] == lvl
                for m in modes:
                    if m == strip_mode:

                        @pl.when((mode_ref[j] == m) & on_lvl)
                        def _(j=j, bb=bb, lvl=lvl):
                            start_strips(j, bb, lvl)

                    else:

                        @pl.when((mode_ref[j] == m) & on_lvl)
                        def _(j=j, bb=bb, m=m, lvl=lvl):
                            start_patch(j, bb, m - 1, lvl)

    c = out_ref.shape[-1]

    @pl.when(mode_ref[step] == 0)
    def _():
        out_ref[0, 0] = jnp.zeros_like(out_ref[0, 0])

    for lvl in range(n_levels):
        h, w = level_hw[lvl]
        h_o = level_h_orig[lvl]
        on_lvl = level_ref[step] == lvl

        for t in range(n_tiers):
            py, px = min(tiers[t][0], h), min(tiers[t][1], w)

            @pl.when((mode_ref[step] == t + 1) & on_lvl)
            def _(t=t, py=py, px=px, lvl=lvl):
                slot = jax.lax.rem(step, depths[t])
                patch_dma(b, step, t, slot, lvl).wait()
                f = patches[t][slot, pl.ds(0, py), pl.ds(0, px), :].astype(
                    jnp.float32
                )
                ym = ymat_ref[0, 0, :, pl.ds(0, py)]  # [P, py]
                xm = xmat_ref[0, 0, :, pl.ds(0, px)]  # [P, px]
                rows = jax.lax.dot_general(
                    ym,
                    f.reshape(py, px * c),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(pool, px, c)
                out = jax.lax.dot_general(
                    xm,
                    rows.transpose(1, 0, 2).reshape(px, pool * c),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [P(q), P(p)*C]
                out = out.reshape(pool, pool, c).transpose(1, 0, 2)
                out_ref[0, 0] = out.astype(out_ref.dtype)

        @pl.when((mode_ref[step] == strip_mode) & on_lvl)
        def _(lvl=lvl, h_o=h_o, w=w):
            slot = jax.lax.rem(step, strip_depth)
            wm = wmat_ref[0, 0, :, pl.ds(0, w)]  # [P(q), W_l]
            for r in range(pool):
                strip_dma(b, step, r, slot, lvl).wait()
                _, t = strip_row(step, r, h_o)
                f = strips[slot, r, :, pl.ds(0, w), :].astype(jnp.float32)
                row = f[0] * (1.0 - t) + f[1] * t  # [W_l, C]
                o = jax.lax.dot_general(
                    wm, row, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [P(q), C]
                out_ref[0, 0, r] = o.astype(out_ref.dtype)


def _segment_slots(levels, mode, n_levels, n_tiers, group):
    """Per-image slot assignment grouping ROIs by (level, mode) segment.

    The grouped kernel (``_fwd_kernel_grouped``) requires every grid step's
    ``group`` ROIs to share one (FPN level, tier/strip/inactive mode) so its
    DMA extents and contraction shapes are static per step. Stable-bucketing
    by segment and padding each segment to a multiple of ``group`` makes that
    true by construction: no boundary groups mix segments, and every group's
    FIRST slot is a real ROI (pads only fill segment tails), so the kernel
    can read the group's (level, mode) from it. Pad slots hold zero boxes;
    their pooled output is garbage under the group's branch and is dropped
    by the final unsort gather.

    Returns ``slot [N] int32`` — each ROI's destination in the padded sorted
    layout of static length ``_padded_len(n, K, group)``.
    """
    n_modes = n_tiers + 2
    k = n_levels * n_modes
    combo = levels * n_modes + mode  # [N]
    onehot = (combo[:, None] == jnp.arange(k)[None, :]).astype(jnp.int32)
    rank = (
        jnp.take_along_axis(jnp.cumsum(onehot, axis=0), combo[:, None], axis=1)[:, 0]
        - 1
    )
    counts = jnp.sum(onehot, axis=0)  # [K]
    padded = ((counts + group - 1) // group) * group
    offsets = jnp.cumsum(padded) - padded
    return (jnp.take(offsets, combo) + rank).astype(jnp.int32)


def _padded_len(n, k, group):
    np_pad = n + k * (group - 1)
    return np_pad + (-np_pad) % group


def _ring_depths_grouped(tiers, pool, w_max, c, itemsize, group):
    """Per-tier DMA ring depths for the grouped kernel (G windows per slot)."""
    strip_depth = 2
    strip_bytes = strip_depth * pool * 2 * w_max * c * itemsize
    for cand in ((6, 3, 2, 2), (4, 2, 2, 2), (3, 2, 2, 2), (2, 2, 2, 2)):
        depths = tuple(cand[: len(tiers)])
        if len(depths) < len(tiers):
            depths = depths + (2,) * (len(tiers) - len(depths))
        tot = strip_bytes + sum(
            d * group * py * px * c * itemsize
            for d, (py, px) in zip(depths, tiers)
        )
        if tot <= _VMEM_BUDGET_GROUPED:
            return depths, strip_depth
    return (2,) * len(tiers), strip_depth


def _fwd_kernel_grouped(
    # scalar prefetch (SMEM), flattened [B * NP] (see _fwd_kernel)
    level_ref,
    y_start_ref,
    x_start_ref,
    y1f_ref,
    mode_ref,
    dy_ref,
    # tensor inputs / output / scratch (unpacked below)
    *refs,
    tiers: tuple,
    depths: tuple,
    strip_depth: int,
    pool: int,
    group: int,
    n_groups: int,  # groups per image
    np_pad: int,  # padded ROI slots per image
    batch: int,
    level_hw: tuple,  # storage dims (padded to >= 8)
    level_h_orig: tuple,
    flat_bc: bool = False,  # feats are [H, W, B*C] (bitcast of conv layout)
):
    """Grouped forward: one grid step pools GROUP same-(level, mode) ROIs.

    The per-ROI kernel's bottleneck is fixed per-step cost (two tiny MXU
    matmuls, a transpose, ~25 predicated regions, DMA waits) x B*N steps —
    measured ~1.24 us/step = 19.9 ms for 16k ROIs on v5e, ~10x its bandwidth
    floor. Here each step runs the separable contraction for all GROUP ROIs
    as TWO block-diagonal matmuls:

        rows_blk = blockdiag(ym_g) [G*P8, G*py] @ fstack [G*py, px*c]
        out_blk  = blockdiag(xm_g) [G*P8, G*px] @ rowsT  [G*px, P8*c]

    The block-diagonal weight scratches are zeroed ONCE (step 0); diagonal
    blocks live at tier-constant offsets so each group just overwrites them
    (off-diagonals stay zero forever). Stale fstack rows/cols beyond a
    clamped window are killed by the interpolation weights, which are zero
    beyond the window by construction (hat functions vs. the full tier
    iota). The G-fold zero padding of the block-diagonal adds ~G x MXU work
    to matmuls that are >100x under the MXU's utilization floor — free.
    """
    n_levels = len(level_hw)
    n_tiers = len(tiers)
    strip_mode = n_tiers + 1
    feats = refs[:n_levels]
    ymat_ref, xmat_ref, wmat_ref, out_ref = refs[n_levels : n_levels + 4]
    scratch = refs[n_levels + 4 :]
    patches = scratch[:n_tiers]  # [depth, G*py, px, c] per tier
    strips = scratch[n_tiers]  # [strip_depth, P, 2, w_max, c]
    ymblks = scratch[n_tiers + 1 : 2 * n_tiers + 1]  # [G*P8, G*py] f32
    xmblks = scratch[2 * n_tiers + 1 : 3 * n_tiers + 1]  # [G*P8, G*px] f32
    psems = scratch[3 * n_tiers + 1 : 4 * n_tiers + 1]  # DMA (depth, G)
    ssem = scratch[4 * n_tiers + 1]  # DMA (strip_depth, P)

    p8 = -(-pool // 8) * 8
    b = pl.program_id(0)
    grp = pl.program_id(1)
    step = b * n_groups + grp
    total = batch * n_groups
    base = b * np_pad + grp * group  # scalar index of the group's first ROI
    c = out_ref.shape[-1]

    def strip_row(st, r, h):
        frac = (r / (pool - 1)) if pool > 1 else 0.0
        ys_r = (y1f_ref[st] + dy_ref[st] * frac) * float(h - 1)
        ys_r = jnp.clip(ys_r, 0.0, float(h - 1))
        row0 = jnp.clip(jnp.floor(ys_r).astype(jnp.int32), 0, max(h - 2, 0))
        return row0, ys_r - row0.astype(jnp.float32)

    def gpatch_dma(bb, st, t, slot_i, g, lvl):
        # when flat_bc, feats are [H, W, B*C] — see _fwd_kernel.patch_dma
        h, w = level_hw[lvl]
        py_t, px_t = tiers[t]
        py, px = min(py_t, h), min(px_t, w)
        if flat_bc:
            src = feats[lvl].at[
                pl.ds(y_start_ref[st], py),
                pl.ds(pl.multiple_of(x_start_ref[st], 8), px),
                pl.ds(pl.multiple_of(bb * c, 128), c),
            ]
        else:
            src = feats[lvl].at[
                bb,
                pl.ds(y_start_ref[st], py),
                pl.ds(pl.multiple_of(x_start_ref[st], 8), px),
                :,
            ]
        return pltpu.make_async_copy(
            src,
            patches[t].at[slot_i, pl.ds(g * py_t, py), pl.ds(0, px), :],
            psems[t].at[slot_i, g],
        )

    def start_group(j, t, lvl):
        """Issue all GROUP window DMAs of (global) group j at tier t."""
        bb = j // n_groups
        jbase = bb * np_pad + jax.lax.rem(j, n_groups) * group
        slot_i = jax.lax.rem(j, depths[t])
        for g in range(group):
            gpatch_dma(bb, jbase + g, t, slot_i, g, lvl).start()

    def strip_dma(bb, st, row, slot_i, lvl):
        w = level_hw[lvl][1]
        row0, _ = strip_row(st, row, level_h_orig[lvl])
        if flat_bc:
            src = feats[lvl].at[
                pl.ds(row0, 2), :, pl.ds(pl.multiple_of(bb * c, 128), c)
            ]
        else:
            src = feats[lvl].at[bb, pl.ds(row0, 2), :, :]
        return pltpu.make_async_copy(
            src,
            strips.at[slot_i, row, :, pl.ds(0, w), :],
            ssem.at[slot_i, row],
        )

    # One-time init: zero the block-diagonal weight scratches (diagonal
    # blocks sit at tier-constant offsets and are overwritten per group;
    # off-diagonal zeros are never touched again).
    @pl.when(step == 0)
    def _():
        for t in range(n_tiers):
            ymblks[t][...] = jnp.zeros_like(ymblks[t])
            xmblks[t][...] = jnp.zeros_like(xmblks[t])

    # Warm-up DMA issue for the first groups (their owning step precedes
    # their ring's prefetch distance).
    max_dist = max(depths) - 1

    @pl.when(step == 0)
    def _():
        for kk in range(min(max_dist, total)):
            kbb = kk // n_groups
            kbase = kbb * np_pad + (kk % n_groups) * group
            for lvl in range(n_levels):
                on_lvl = level_ref[kbase] == lvl
                for t in range(n_tiers):
                    if kk < depths[t] - 1:

                        @pl.when((mode_ref[kbase] == t + 1) & on_lvl)
                        def _(kk=kk, t=t, lvl=lvl):
                            start_group(kk, t, lvl)

    # Steady-state prefetch, grouped by ring distance.
    dist_groups = {}
    for t in range(n_tiers):
        dist_groups.setdefault(depths[t] - 1, []).append(t)
    for dist, tier_list in sorted(dist_groups.items()):

        @pl.when(step + dist < total)
        def _(dist=dist, tier_list=tier_list):
            j = step + dist
            jbase = (j // n_groups) * np_pad + jax.lax.rem(j, n_groups) * group
            for lvl in range(n_levels):
                on_lvl = level_ref[jbase] == lvl
                for t in tier_list:

                    @pl.when((mode_ref[jbase] == t + 1) & on_lvl)
                    def _(j=j, t=t, lvl=lvl):
                        start_group(j, t, lvl)

    gmode = mode_ref[base]
    glevel = level_ref[base]

    @pl.when(gmode == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    # ---- patch tiers: two block-diagonal matmuls per group ----
    for t in range(n_tiers):
        py_t, px_t = tiers[t]

        @pl.when(gmode == t + 1)
        def _(t=t, py_t=py_t, px_t=px_t):
            # fresh diagonal weight blocks for this group (full tier width:
            # weights beyond a clamped window are zero by construction, so
            # they also erase the previous group's values there)
            for g in range(group):
                ymblks[t][
                    pl.ds(g * p8, pool), pl.ds(g * py_t, py_t)
                ] = ymat_ref[0, g, :, pl.ds(0, py_t)]
                xmblks[t][
                    pl.ds(g * p8, pool), pl.ds(g * px_t, px_t)
                ] = xmat_ref[0, g, :, pl.ds(0, px_t)]
            slot = jax.lax.rem(step, depths[t])
            for lvl in range(n_levels):

                @pl.when(glevel == lvl)
                def _(lvl=lvl, t=t):
                    for g in range(group):
                        gpatch_dma(b, base + g, t, slot, g, lvl).wait()

            f = patches[t][slot].astype(jnp.float32)  # [G*py, px, c]
            a = f.reshape(group * py_t, px_t * c)
            ym = ymblks[t][...]
            rows = jax.lax.dot_general(
                ym, a, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G*P8, px*c]
            rows4 = rows.reshape(group, p8, px_t, c)
            rows_t = jnp.swapaxes(rows4, 1, 2).reshape(group * px_t, p8 * c)
            xm = xmblks[t][...]
            out = jax.lax.dot_general(
                xm, rows_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G*P8(q), P8*c(p,c)]
            out4 = jnp.swapaxes(out.reshape(group, p8, p8, c), 1, 2)
            out_ref[0] = out4[:, :pool, :pool, :].astype(out_ref.dtype)

    # ---- strip groups: per-ROI full-width row pairs, double-buffered
    # within the group (strips are rare; no cross-group prefetch) ----
    for lvl in range(n_levels):
        h_o = level_h_orig[lvl]
        w = level_hw[lvl][1]

        @pl.when((gmode == strip_mode) & (glevel == lvl))
        def _(lvl=lvl, h_o=h_o, w=w):
            for r in range(pool):
                strip_dma(b, base, r, 0, lvl).start()
            for g in range(group):
                slot = g % strip_depth
                if g + 1 < group:
                    nxt = (g + 1) % strip_depth
                    for r in range(pool):
                        strip_dma(b, base + g + 1, r, nxt, lvl).start()
                wm = wmat_ref[0, g, :, pl.ds(0, w)]  # [P(q), W_l]
                for r in range(pool):
                    strip_dma(b, base + g, r, slot, lvl).wait()
                    _, tt = strip_row(base + g, r, h_o)
                    fs = strips[slot, r, :, pl.ds(0, w), :].astype(jnp.float32)
                    row = fs[0] * (1.0 - tt) + fs[1] * tt  # [W_l, C]
                    o = jax.lax.dot_general(
                        wm, row, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [P(q), C]
                    out_ref[0, g, r] = o.astype(out_ref.dtype)


def _grouped_fwd_impl(
    features, boxes, pool_size, image_shape, denominator, interpret,
    defer_unsort=False,
):
    """Host-side wrapper for the grouped kernel: a cheap placement-only
    geometry pass assigns each ROI a (level, mode)-segment slot, the BOXES
    alone are scattered into the padded layout (pads = zero boxes), the full
    geometry (incl. the big interpolation matrices) is computed directly on
    the sorted boxes — avoiding ~250 MB of mat scatters — and the pooled
    outputs are gathered back into original ROI order.

    With ``defer_unsort=True`` the final unsort gather is skipped and
    ``(out_sorted [B, np_pad, P, P, C], slot [B, N])`` is returned instead:
    per-ROI heads are order-invariant, so callers can run them on the sorted
    layout and unsort only the tiny per-ROI head outputs — the [B*N, P, P, C]
    feature gather (+ its layout copy) was ~2.8 ms/batch at 16k ROIs."""
    level_hw = tuple((f.shape[1], f.shape[2]) for f in features)
    level_hw_s = _storage_hw(level_hw)
    if level_hw_s != level_hw:
        features = [
            jnp.pad(f, ((0, 0), (0, hs - h), (0, ws - w), (0, 0)))
            if (hs, ws) != (h, w) else f
            for f, (h, w), (hs, ws) in zip(features, level_hw, level_hw_s)
        ]
    bsz, n = boxes.shape[0], boxes.shape[1]
    p = pool_size
    c = features[0].shape[-1]
    w_max = max(w for _, w in level_hw_s)
    # placement-only pass on the original boxes -> segment slots
    levels, place, tiers = _batched_geometry(
        boxes, pool_size, image_shape, denominator, level_hw, with_mats=False
    )
    mode = place[3]
    n_tiers = len(tiers)
    n_levels = len(level_hw)
    group = GROUP
    np_pad = _padded_len(n, n_levels * (n_tiers + 2), group)
    n_groups = np_pad // group
    patch_y = max(py for py, _ in tiers)
    patch_x = max(px for _, px in tiers)
    depths, strip_depth = _ring_depths_grouped(
        tiers, p, w_max, c, jnp.dtype(features[0].dtype).itemsize, group
    )

    slot = jax.vmap(
        lambda lv, md: _segment_slots(lv, md, n_levels, n_tiers, group)
    )(levels.astype(jnp.int32), mode)
    boxes32 = jax.lax.stop_gradient(boxes).astype(jnp.float32)
    sorted_boxes = jax.vmap(
        lambda bx, sl: jnp.zeros((np_pad, 4), jnp.float32).at[sl].set(bx)
    )(boxes32, slot)
    # full geometry directly in sorted order (identical per-box results:
    # geometry is a deterministic function of the box alone)
    s_level, s_geo, _ = _batched_geometry(
        sorted_boxes, pool_size, image_shape, denominator, level_hw
    )
    s_ys, s_xs, s_y1f, s_mode, s_dy, s_ym, s_xm, s_wm = s_geo

    flat_bc = c % 128 == 0
    out_sorted = pl.pallas_call(
        functools.partial(
            _fwd_kernel_grouped,
            tiers=tiers,
            depths=depths,
            strip_depth=strip_depth,
            pool=p,
            group=group,
            n_groups=n_groups,
            np_pad=np_pad,
            batch=bsz,
            level_hw=level_hw_s,
            level_h_orig=tuple(h for h, _ in level_hw),
            flat_bc=flat_bc,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(bsz, n_groups),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_levels
            + [
                pl.BlockSpec((1, group, p, patch_y), lambda b, i, *_: (b, i, 0, 0)),
                pl.BlockSpec((1, group, p, patch_x), lambda b, i, *_: (b, i, 0, 0)),
                pl.BlockSpec((1, group, p, w_max), lambda b, i, *_: (b, i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, group, p, p, c), lambda b, i, *_: (b, i, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (d, group * min(py, max(h for h, _ in level_hw_s)),
                     min(px, w_max), c),
                    features[0].dtype,
                )
                for d, (py, px) in zip(depths, tiers)
            ]
            + [pltpu.VMEM((strip_depth, p, 2, w_max, c), features[0].dtype)]
            + [
                pltpu.VMEM((group * (-(-p // 8) * 8), group * py), jnp.float32)
                for py, _ in tiers
            ]
            + [
                pltpu.VMEM((group * (-(-p // 8) * 8), group * px), jnp.float32)
                for _, px in tiers
            ]
            + [pltpu.SemaphoreType.DMA((d, group)) for d in depths]
            + [pltpu.SemaphoreType.DMA((strip_depth, p))],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, np_pad, p, p, c), features[0].dtype),
        # the G-wide DMA rings (~27 MB) exceed the default 16 MB scoped-vmem
        # limit; v5e has 128 MB of VMEM — raise the cap for this kernel
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        s_level.reshape(-1),
        s_ys.reshape(-1),
        s_xs.reshape(-1),
        s_y1f.reshape(-1),
        s_mode.reshape(-1),
        s_dy.reshape(-1),
        # [H, W, B*C] — see _pyramid_fwd_impl
        *(
            [
                jnp.transpose(f, (1, 2, 0, 3)).reshape(
                    f.shape[1], f.shape[2], bsz * c
                )
                for f in features
            ]
            if flat_bc
            else features
        ),
        s_ym,
        s_xm,
        s_wm,
    )
    if defer_unsort:
        return out_sorted, slot
    # back to original ROI order (one contiguous-row gather)
    return jnp.take_along_axis(
        out_sorted, slot[:, :, None, None, None], axis=1
    )


def _bwd_kernel(
    # scalar prefetch (SMEM) — flattened 1-D (see _fwd_kernel)
    level_ref,  # [B*G]
    y_start_ref,  # [B*G]
    x_start_ref,  # [B*G]
    y1f_ref,  # [B*G] f32
    mode_ref,  # [B*G]
    dy_ref,  # [B*G] f32
    # tensor inputs / outputs / scratch (see unpacking below)
    *refs,
    tiers: tuple,
    pool: int,
    level_hw: tuple,  # storage dims (padded to >= 8)
    level_h_orig: tuple,
):
    """Transpose of the forward kernel: serial RMW scatter-accumulate each
    ROI's pooled cotangent into its level's (zero-initialized, aliased)
    feature-map cotangent buffer."""
    n_levels = len(level_hw)
    n_tiers = len(tiers)
    strip_mode = n_tiers + 1
    dout_ref, ymat_ref, xmat_ref, wmat_ref = refs[n_levels : n_levels + 4]
    dfeats = refs[n_levels + 4 : 2 * n_levels + 4]
    win, spair, wsem, ssem = refs[2 * n_levels + 4 :]

    b = pl.program_id(0)
    g = pl.program_id(1)
    step = b * pl.num_programs(1) + g
    dout = dout_ref[0, 0].astype(jnp.float32)  # [P, P, C]
    c = dout.shape[-1]

    def strip_row(st, r, h):
        frac = (r / (pool - 1)) if pool > 1 else 0.0
        ys_r = (y1f_ref[st] + dy_ref[st] * frac) * float(h - 1)
        ys_r = jnp.clip(ys_r, 0.0, float(h - 1))
        row0 = jnp.clip(jnp.floor(ys_r).astype(jnp.int32), 0, max(h - 2, 0))
        return row0, ys_r - row0.astype(jnp.float32)

    for lvl in range(n_levels):
        h, w = level_hw[lvl]
        h_o = level_h_orig[lvl]
        on_lvl = level_ref[step] == lvl

        for t in range(n_tiers):
            py, px = min(tiers[t][0], h), min(tiers[t][1], w)

            @pl.when((mode_ref[step] == t + 1) & on_lvl)
            def _(py=py, px=px, lvl=lvl):
                ym = ymat_ref[0, 0, :, pl.ds(0, py)]  # [P, py]
                xm = xmat_ref[0, 0, :, pl.ds(0, px)]  # [P, px]
                # drows[p, x, c] = sum_q xm[q, x] * dout[p, q, c]
                drows = jax.lax.dot_general(
                    xm,
                    dout.transpose(1, 0, 2).reshape(pool, pool * c),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(px, pool, c).transpose(1, 0, 2)  # [P, px, C]
                dpatch = jax.lax.dot_general(
                    ym,
                    drows.reshape(pool, px * c),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(py, px, c)
                window = dfeats[lvl].at[
                    b,
                    pl.ds(y_start_ref[step], py),
                    pl.ds(pl.multiple_of(x_start_ref[step], 8), px),
                    :,
                ]
                wv = win.at[pl.ds(0, py), pl.ds(0, px), :]
                read = pltpu.make_async_copy(window, wv, wsem)
                read.start()
                read.wait()
                win[pl.ds(0, py), pl.ds(0, px), :] = (
                    win[pl.ds(0, py), pl.ds(0, px), :] + dpatch
                )
                write = pltpu.make_async_copy(wv, window, wsem)
                write.start()
                write.wait()

        @pl.when((mode_ref[step] == strip_mode) & on_lvl)
        def _(lvl=lvl, h_o=h_o, w=w):
            wm = wmat_ref[0, 0, :, pl.ds(0, w)]  # [P(q), W_l]
            for r in range(pool):
                row0, t = strip_row(step, r, h_o)
                # drow[x, c] = sum_q wm[q, x] * dout[r, q, c]
                drow = jax.lax.dot_general(
                    wm, dout[r], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [W_l, C]
                pair = dfeats[lvl].at[b, pl.ds(row0, 2), :, :]
                sv = spair.at[:, pl.ds(0, w), :]
                read = pltpu.make_async_copy(pair, sv, ssem)
                read.start()
                read.wait()
                spair[0, pl.ds(0, w), :] = spair[0, pl.ds(0, w), :] + drow * (1.0 - t)
                spair[1, pl.ds(0, w), :] = spair[1, pl.ds(0, w), :] + drow * t
                write = pltpu.make_async_copy(sv, pair, ssem)
                write.start()
                write.wait()


def _bwd_kernel_vmem(
    # scalar prefetch (SMEM) — flattened 1-D (see _fwd_kernel)
    level_ref,  # [B*G]
    y_start_ref,  # [B*G]
    x_start_ref,  # [B*G]
    y1f_ref,  # [B*G] f32
    mode_ref,  # [B*G]
    dy_ref,  # [B*G] f32
    # tensor inputs then outputs
    dout_ref,  # [1, 1, P, P, C] block per (b, g)
    ymat_ref,
    xmat_ref,
    wmat_ref,
    *dfeats,  # n_levels OUTPUT blocks [1, H_l, W_l, C], resident per image
    tiers: tuple,
    pool: int,
    level_hw: tuple,
    level_h_orig: tuple,
):
    """VMEM-resident transpose of the forward kernel (VERDICT r3 next #7).

    The RMW variant (``_bwd_kernel``) serializes a read-window -> add ->
    write-window HBM round trip per ROI (~10 ms/step attributed by the
    roofline). Here each level's per-image cotangent block IS the pallas
    output buffer, revisited across the ROI grid dimension (index_map
    ignores g): zeroed once at g==0, accumulated entirely in VMEM, flushed
    to HBM by pallas exactly once when b advances. The whole pyramid fits
    VMEM for the training shapes (~22 MB at 512^2 C=256, ~84 MB at 1024^2);
    the dispatcher falls back to the RMW kernel above this budget.
    """
    n_tiers = len(tiers)
    strip_mode = n_tiers + 1
    b = pl.program_id(0)
    g = pl.program_id(1)
    step = b * pl.num_programs(1) + g

    @pl.when(g == 0)
    def _():
        for df in dfeats:
            df[...] = jnp.zeros(df.shape, df.dtype)

    dout = dout_ref[0, 0].astype(jnp.float32)  # [P, P, C]
    c = dout.shape[-1]

    def strip_row(st, r, h):
        frac = (r / (pool - 1)) if pool > 1 else 0.0
        ys_r = (y1f_ref[st] + dy_ref[st] * frac) * float(h - 1)
        ys_r = jnp.clip(ys_r, 0.0, float(h - 1))
        row0 = jnp.clip(jnp.floor(ys_r).astype(jnp.int32), 0, max(h - 2, 0))
        return row0, ys_r - row0.astype(jnp.float32)

    for lvl in range(len(level_hw)):
        h, w = level_hw[lvl]
        h_o = level_h_orig[lvl]
        on_lvl = level_ref[step] == lvl
        df = dfeats[lvl]

        for t in range(n_tiers):
            py, px = min(tiers[t][0], h), min(tiers[t][1], w)

            @pl.when((mode_ref[step] == t + 1) & on_lvl)
            def _(py=py, px=px, df=df):
                ym = ymat_ref[0, 0, :, pl.ds(0, py)]  # [P, py]
                xm = xmat_ref[0, 0, :, pl.ds(0, px)]  # [P, px]
                drows = jax.lax.dot_general(
                    xm,
                    dout.transpose(1, 0, 2).reshape(pool, pool * c),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(px, pool, c).transpose(1, 0, 2)  # [P, px, C]
                dpatch = jax.lax.dot_general(
                    ym,
                    drows.reshape(pool, px * c),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(py, px, c)
                ys = y_start_ref[step]
                xs = pl.multiple_of(x_start_ref[step], 8)
                df[0, pl.ds(ys, py), pl.ds(xs, px), :] = (
                    df[0, pl.ds(ys, py), pl.ds(xs, px), :] + dpatch
                )

        @pl.when((mode_ref[step] == strip_mode) & on_lvl)
        def _(h_o=h_o, w=w, df=df):
            wm = wmat_ref[0, 0, :, pl.ds(0, w)]  # [P(q), W_l]
            for r in range(pool):
                row0, t = strip_row(step, r, h_o)
                drow = jax.lax.dot_general(
                    wm, dout[r], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [W_l, C]
                pair = df[0, pl.ds(row0, 2), :, :]
                df[0, pl.ds(row0, 2), :, :] = pair + jnp.stack(
                    [drow * (1.0 - t), drow * t]
                )


def _storage_hw(level_hw):
    """Levels below the 8-sublane VMEM tile are zero-padded up to 8."""
    return tuple((max(h, 8), max(w, 8)) for h, w in level_hw)


def _batched_geometry(
    boxes, pool_size, image_shape, denominator, level_hw, with_mats=True
):
    from maskrcnn_tf2_tpu.ops.roi_align import roi_level_assignment

    level_hw_s = _storage_hw(level_hw)
    tiers = _effective_tiers(level_hw_s)
    boxes = jax.lax.stop_gradient(boxes).astype(jnp.float32)
    image_area = float(image_shape[0]) * float(image_shape[1])
    levels = roi_level_assignment(boxes, image_area, len(level_hw), denominator)
    valid = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])
    geo = jax.vmap(
        lambda bx, vl, lv: _pyramid_geometry(
            bx, vl, lv, level_hw, pool_size, tiers, level_hw_s, with_mats=with_mats
        )
    )(boxes, valid, levels)
    return levels, geo, tiers


def _pyramid_fwd_impl(features, boxes, pool_size, image_shape, denominator, interpret):
    if boxes.shape[1] >= GROUP_MIN:
        # large ROI counts (classifier head at inference, 1000/img) are
        # per-step-overhead bound in the per-ROI kernel; the grouped kernel
        # amortizes it G ways (see _fwd_kernel_grouped). Small counts (mask
        # head, training) don't amortize the (level, mode)-segment padding.
        return _grouped_fwd_impl(
            features, boxes, pool_size, image_shape, denominator, interpret
        )
    level_hw = tuple((f.shape[1], f.shape[2]) for f in features)
    level_hw_s = _storage_hw(level_hw)
    if level_hw_s != level_hw:
        features = [
            jnp.pad(f, ((0, 0), (0, hs - h), (0, ws - w), (0, 0)))
            if (hs, ws) != (h, w) else f
            for f, (h, w), (hs, ws) in zip(features, level_hw, level_hw_s)
        ]
    bsz, g = boxes.shape[0], boxes.shape[1]
    p = pool_size
    c = features[0].shape[-1]
    w_max = max(w for _, w in level_hw_s)
    levels, geo, tiers = _batched_geometry(
        boxes, pool_size, image_shape, denominator, level_hw
    )
    y_start, x_start, y1f, mode, dy, ymat, xmat, wmat = geo
    patch_y = max(py for py, _ in tiers)
    patch_x = max(px for _, px in tiers)
    depths, strip_depth = _ring_depths(
        tiers, p, w_max, c, jnp.dtype(features[0].dtype).itemsize
    )

    flat_bc = c % 128 == 0
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            tiers=tiers,
            depths=depths,
            strip_depth=strip_depth,
            pool=p,
            n_rois=g,
            batch=bsz,
            level_hw=level_hw_s,
            level_h_orig=tuple(h for h, _ in level_hw),
            flat_bc=flat_bc,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(bsz, g),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(level_hw)
            + [
                pl.BlockSpec((1, 1, p, patch_y), lambda b, i, *_: (b, i, 0, 0)),
                pl.BlockSpec((1, 1, p, patch_x), lambda b, i, *_: (b, i, 0, 0)),
                pl.BlockSpec((1, 1, p, w_max), lambda b, i, *_: (b, i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, p, p, c), lambda b, i, *_: (b, i, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((d, min(py, max(h for h, _ in level_hw_s)),
                            min(px, w_max), c), features[0].dtype)
                for d, (py, px) in zip(depths, tiers)
            ]
            + [
                pltpu.VMEM((strip_depth, p, 2, w_max, c), features[0].dtype),
            ]
            + [pltpu.SemaphoreType.DMA((d,)) for d in depths]
            + [pltpu.SemaphoreType.DMA((strip_depth, p))],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, g, p, p, c), features[0].dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        levels.astype(jnp.int32).reshape(-1),
        y_start.reshape(-1),
        x_start.reshape(-1),
        y1f.reshape(-1),
        mode.reshape(-1),
        dy.reshape(-1),
        # [H, W, B*C]: row-major view of the conv outputs' native
        # {3,0,2,1} layout -> the transpose is a bitcast, where a [B,H,W,C]
        # operand forced a real relayout copy (1.6 ms/batch for P2 at b16)
        *(
            [
                jnp.transpose(f, (1, 2, 0, 3)).reshape(
                    f.shape[1], f.shape[2], bsz * c
                )
                for f in features
            ]
            if flat_bc
            else features
        ),
        ymat,
        xmat,
        wmat,
    )


def _pyramid_bwd_impl(
    dout, boxes, pool_size, image_shape, denominator, interpret, shapes_dtypes
):
    level_hw = tuple((s[1], s[2]) for s, _ in shapes_dtypes)
    level_hw_s = _storage_hw(level_hw)
    bsz, g = boxes.shape[0], boxes.shape[1]
    p = pool_size
    c = shapes_dtypes[0][0][-1]
    w_max = max(w for _, w in level_hw_s)
    n_levels = len(level_hw)
    levels, geo, tiers = _batched_geometry(
        boxes, pool_size, image_shape, denominator, level_hw
    )
    y_start, x_start, y1f, mode, dy, ymat, xmat, wmat = geo
    patch_y = max(py for py, _ in tiers)
    patch_x = max(px for _, px in tiers)

    # VMEM-resident backward when the per-image cotangent pyramid fits
    # (~22 MB at 512^2 C=256); RMW fallback above budget or via the A/B env
    # MASKRCNN_TPU_ROIALIGN_BWD=rmw.
    import os as _os

    pyramid_bytes = sum(h * w * c * 4 for (h, w) in level_hw_s)
    use_vmem = (
        pyramid_bytes <= 88 * 1024 * 1024
        and _os.environ.get("MASKRCNN_TPU_ROIALIGN_BWD", "vmem") != "rmw"
    )
    if use_vmem:
        out = pl.pallas_call(
            functools.partial(
                _bwd_kernel_vmem,
                tiers=tiers,
                pool=p,
                level_hw=level_hw_s,
                level_h_orig=tuple(h for h, _ in level_hw),
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=6,
                grid=(bsz, g),
                in_specs=[
                    pl.BlockSpec((1, 1, p, p, c), lambda b, i, *_: (b, i, 0, 0, 0)),
                    pl.BlockSpec((1, 1, p, patch_y), lambda b, i, *_: (b, i, 0, 0)),
                    pl.BlockSpec((1, 1, p, patch_x), lambda b, i, *_: (b, i, 0, 0)),
                    pl.BlockSpec((1, 1, p, w_max), lambda b, i, *_: (b, i, 0, 0)),
                ],
                # each level's per-image block revisited across g: stays in
                # VMEM for the whole image, flushed once when b advances
                out_specs=[
                    pl.BlockSpec((1, h, w, c), lambda b, i, *_: (b, 0, 0, 0))
                    for (h, w) in level_hw_s
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bsz, h, w, c), jnp.float32)
                for (h, w) in level_hw_s
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            levels.astype(jnp.int32).reshape(-1),
            y_start.reshape(-1),
            x_start.reshape(-1),
            y1f.reshape(-1),
            mode.reshape(-1),
            dy.reshape(-1),
            dout,
            ymat,
            xmat,
            wmat,
        )
        return [
            df[:, :h, :w, :].astype(jnp.dtype(dt))
            for df, ((_, h, w, _c), dt) in zip(out, shapes_dtypes)
        ]

    zeros = [jnp.zeros((bsz, h, w, c), jnp.float32) for (h, w) in level_hw_s]
    out = pl.pallas_call(
        functools.partial(
            _bwd_kernel,
            tiers=tiers,
            pool=p,
            level_hw=level_hw_s,
            level_h_orig=tuple(h for h, _ in level_hw),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(bsz, g),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_levels
            + [
                pl.BlockSpec((1, 1, p, p, c), lambda b, i, *_: (b, i, 0, 0, 0)),
                pl.BlockSpec((1, 1, p, patch_y), lambda b, i, *_: (b, i, 0, 0)),
                pl.BlockSpec((1, 1, p, patch_x), lambda b, i, *_: (b, i, 0, 0)),
                pl.BlockSpec((1, 1, p, w_max), lambda b, i, *_: (b, i, 0, 0)),
            ],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_levels,
            scratch_shapes=[
                pltpu.VMEM((patch_y, patch_x, c), jnp.float32),
                pltpu.VMEM((2, w_max, c), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w, c), jnp.float32) for (h, w) in level_hw_s
        ],
        # inputs 6..6+L-1 are the zero-initialized dfeats buffers (after the
        # 6 scalar-prefetch operands), aliased to outputs 0..L-1
        input_output_aliases={6 + lvl: lvl for lvl in range(n_levels)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        levels.astype(jnp.int32).reshape(-1),
        y_start.reshape(-1),
        x_start.reshape(-1),
        y1f.reshape(-1),
        mode.reshape(-1),
        dy.reshape(-1),
        *zeros,
        dout,
        ymat,
        xmat,
        wmat,
    )
    return [
        df[:, :h, :w, :].astype(jnp.dtype(dt))
        for df, ((_, h, w, _c), dt) in zip(out, shapes_dtypes)
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _pyramid_roi_align_pallas(
    features, boxes, pool_size, image_shape, denominator, interpret, shapes_dtypes
):
    return _pyramid_fwd_impl(
        features, boxes, pool_size, image_shape, denominator, interpret
    )


def _pyramid_fwd(
    features, boxes, pool_size, image_shape, denominator, interpret, shapes_dtypes
):
    out = _pyramid_fwd_impl(
        features, boxes, pool_size, image_shape, denominator, interpret
    )
    return out, boxes


def _pyramid_bwd(
    pool_size, image_shape, denominator, interpret, shapes_dtypes, res, dout
):
    boxes = res.astype(jnp.float32)
    dfeats = _pyramid_bwd_impl(
        dout, boxes, pool_size, image_shape, denominator, interpret, shapes_dtypes
    )
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
    """Full pyramid ROIAlign in one multi-level Pallas kernel (see module
    docstring). Differentiable via the custom-VJP scatter kernel."""
    return _pyramid_roi_align_pallas(
        list(features),
        boxes,
        int(pool_size),
        (int(image_shape[0]), int(image_shape[1])),
        float(denominator),
        bool(interpret),
        tuple((tuple(f.shape), str(f.dtype)) for f in features),
    )


def pyramid_roi_align_pallas_deferred(
    features,
    boxes: jnp.ndarray,  # [B, N, 4]
    pool_size: int,
    image_shape,
    denominator: float = 244.0,
    interpret: bool = False,
):
    """Forward-only grouped ROIAlign WITHOUT the final unsort gather.

    Returns ``(pooled, slot)``: ``pooled [B, NP_PAD, P, P, C]`` in the
    kernel's (level, tier)-segment-sorted padded layout and ``slot [B, N]``
    mapping original ROI i to its row in ``pooled``. Callers run their
    per-ROI (order-invariant) heads on the sorted layout and unsort only the
    small head outputs via ``take_along_axis(out, slot, axis=1)``. Pad rows
    may hold garbage (even NaN from uninitialized output slots of all-pad
    groups) — they are never selected by ``slot``, and every per-ROI op
    keeps rows independent, so the garbage cannot contaminate real ROIs.

    For small N (< GROUP_MIN, where the per-ROI kernel wins) this falls back
    to the regular in-order forward and returns ``(pooled, None)``. Forward
    only — no custom VJP; use :func:`pyramid_roi_align_pallas` for training.
    """
    features = list(features)
    image_shape = (int(image_shape[0]), int(image_shape[1]))
    if boxes.shape[1] < GROUP_MIN:
        return (
            pyramid_roi_align_pallas(
                features, boxes, pool_size, image_shape, denominator, interpret
            ),
            None,
        )
    return _grouped_fwd_impl(
        features,
        boxes,
        int(pool_size),
        image_shape,
        float(denominator),
        bool(interpret),
        defer_unsort=True,
    )
