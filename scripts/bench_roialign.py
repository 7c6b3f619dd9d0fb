"""ROIAlign implementation shootout on the available accelerator.

Times the three pyramid-ROIAlign paths (XLA gather, MXU matmul, exact
Pallas two-mode DMA kernel) at inference scale (1000 ROIs) and mask-head
scale (100 ROIs, pool 14) on flagship feature shapes, printing one JSON
line. Decides the ``pyramid_roi_align`` dispatch defaults (ops/roi_align.py).

    python scripts/bench_roialign.py [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    from maskrcnn_tf2_tpu.kernels.roi_align_pallas import pyramid_roi_align_pallas
    from maskrcnn_tf2_tpu.ops.roi_align import (
        pyramid_roi_align_gather,
        pyramid_roi_align_matmul,
    )

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    img = 1024
    c = 256
    rs = np.random.RandomState(0)
    feats = [
        jnp.asarray(rs.randn(b, img // s, img // s, c).astype(jnp.bfloat16))
        for s in (4, 8, 16, 32)
    ]

    def boxes_like_detections(n, seed):
        r = np.random.RandomState(seed)
        y1, x1 = r.uniform(0, 0.7, (2, b, n))
        scale = np.exp(r.uniform(np.log(0.02), np.log(0.5), (b, n)))
        aspect = np.exp(r.normal(0, 0.5, (b, n)))
        h = np.minimum(scale * aspect, 0.95)
        w = np.minimum(scale / aspect, 0.95)
        return jnp.asarray(
            np.stack([y1, x1, np.minimum(y1 + h, 1.0), np.minimum(x1 + w, 1.0)], -1)
            .astype(np.float32)
        )

    results = {}
    for tag, n, pool in (("cls_1000x7", 1000, 7), ("mask_100x14", 100, 14)):
        boxes = boxes_like_detections(n, 1)
        for name, fn in (
            ("gather", pyramid_roi_align_gather),
            ("matmul", pyramid_roi_align_matmul),
            ("pallas", pyramid_roi_align_pallas),
        ):
            # feats must be jit ARGUMENTS: closed-over arrays embed ~270 MB
            # of constants into the remote-compile payload (HTTP 413).
            f = jax.jit(lambda fs, bx, fn=fn, pool=pool: fn(fs, bx, pool, (img, img)))
            out = jax.block_until_ready(f(feats, boxes))  # compile + warm
            iters = 20
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(feats, boxes)
            jax.block_until_ready(out)
            results[f"{tag}_{name}_ms"] = round(
                (time.perf_counter() - t0) / iters * 1e3, 2
            )
        # numeric agreement pallas vs gather at bf16 tolerance
        g = np.asarray(
            jax.jit(lambda fs, bx: pyramid_roi_align_gather(fs, bx, pool, (img, img)))(feats, boxes),
            np.float32,
        )
        p = np.asarray(
            jax.jit(lambda fs, bx: pyramid_roi_align_pallas(fs, bx, pool, (img, img)))(feats, boxes),
            np.float32,
        )
        results[f"{tag}_pallas_maxerr"] = float(np.abs(g - p).max())
    print(json.dumps({"metric": "roialign_shootout_b%d" % b, **results}))


if __name__ == "__main__":
    main()
