"""NMS kernel microbench at proposal scale (diagnosis for the 4.6 ms/batch
greedy_keep_pallas cost seen in the inference profile).

Builds proposal-like candidates (decoded anchor boxes, stride-spread like
the binned top-k output, scores descending), times greedy_keep_pallas at
b16 with and without the early-exit limit, and reports keep statistics so
the early-exit behavior is visible.

    python scripts/bench_nms.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache
from maskrcnn_tf2_tpu.kernels.nms_pallas import greedy_keep_pallas


def main():
    enable_cache()
    b, n = 16, 6144  # CHUNK multiple, as ops/nms pads
    rs = np.random.RandomState(0)
    # anchor-like boxes: centers spread over the image, sizes ~ anchor scales
    cy, cx = rs.uniform(0.02, 0.98, (2, b, n))
    scale = np.exp(rs.uniform(np.log(0.02), np.log(0.25), (b, n)))
    ratio = np.exp(rs.normal(0.0, 0.4, (b, n)))
    h = scale * ratio
    w = scale / ratio
    boxes = np.stack(
        [
            np.clip(cy - h / 2, 0, 1),
            np.clip(cx - w / 2, 0, 1),
            np.clip(cy + h / 2, 0, 1),
            np.clip(cx + w / 2, 0, 1),
        ],
        -1,
    ).astype(np.float32)
    valid = jnp.ones((b, n), bool)
    bx = jnp.asarray(boxes)

    for limit in (1000, 0):
        f = jax.jit(
            jax.vmap(
                lambda bb, vv: greedy_keep_pallas(bb, vv, 0.7, limit=limit)
            )
        )
        keep = jax.block_until_ready(f(bx, valid))
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            keep = f(bx, valid)
        jax.block_until_ready(keep)
        dt = (time.perf_counter() - t0) / iters * 1e3
        k = np.asarray(keep)
        print(
            f"limit={limit}: {dt:.2f} ms/b16  keeps/img mean={k.sum(1).mean():.0f}",
            flush=True,
        )
        if limit:
            # how many 128-tiles until `limit` keeps (early-exit depth)
            csum = np.cumsum(k.reshape(b, -1, 128).sum(2), axis=1)
            tiles = (csum < 1000).sum(1) + 1
            print(f"  tiles to {limit} keeps: mean={tiles.mean():.1f} / {n // 128}")


if __name__ == "__main__":
    main()
