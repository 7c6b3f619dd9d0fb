"""Microbenchmark stem formulations (normalize + 7x7/s2 conv) on TPU.

Full-graph profile: the W-pair stem costs ~6.0 ms/batch at b16@1024
(copy.1183 relayout 1.5 ms + 7x4 conv 4.5 ms) vs a ~1.3 ms floor.
Candidates (all start from the raw f32 [B,1024,1024,3] host image and
include ImageNet normalization, matching the real graph):

  wpair   normalize -> [B,H,W/2,6] view -> conv [7,4,6,64] s(2,1)   (current)
  plain   normalize -> conv [7,7,3,64] s(2,2)
  s2d_xla normalize -> reshape/transpose to [B,H/2,W/2,12] -> conv [4,4,12,64]
  s2d_idx normalize + s2d via strided slices (no 6-D transpose) -> 4x4 conv

Numerical equivalence of every variant vs `plain` is asserted (<=2e-2 bf16).

Usage: python scripts/bench_stem.py [batch] [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache

MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    enable_cache()
    d = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32) * 255.0)
    k = jnp.asarray(rng.rand(7, 7, 3, 64).astype(np.float32) * 0.05, dtype=d)
    mean = jnp.asarray(MEAN)
    std = jnp.asarray(STD)

    def norm(x):
        return ((x - mean) / std).astype(d)

    def v_plain(x):
        return lax.conv_general_dilated(
            norm(x), k, (2, 2), ((2, 3), (2, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # --- W-pair (current production form) -------------------------------
    kpadw = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, 1), (0, 0), (0, 0)))
    kw = kpadw.reshape(7, 4, 6, 64).astype(d)

    def v_wpair(x):
        xn = norm(x)
        xc = xn.reshape(batch, size, size // 2, 6)
        return lax.conv_general_dilated(
            xc, kw, (2, 1), ((2, 3), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # --- full 2x2 s2d ----------------------------------------------------
    # out[r,c] = sum_{dy,dx in 0..6} in[2r+dy-2, 2c+dx-2] * K[dy,dx]
    # Block pairs: in row 2i+py -> block i slot py. 2r+dy-2 = 2(r-1+ (dy+py')/..)
    # With kernel padded 7->8 on both axes (extra row/col zero), dy = 2*jy+py:
    # out[r,c] = sum_{jy,py,jx,px} blk[r-1+jy, c-1+jx, py,px] * Kp[2jy+py, 2jx+px]
    # i.e. a [4,4] conv over 12 channels, stride 1, pad (1,2)x(1,2).
    kpad2 = jnp.pad(k.astype(jnp.float32), ((0, 1), (0, 1), (0, 0), (0, 0)))
    k2 = (
        kpad2.reshape(4, 2, 4, 2, 3, 64)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 12, 64)
        .astype(d)
    )

    def v_s2d_xla(x):
        xn = norm(x)
        blk = xn.reshape(batch, size // 2, 2, size // 2, 2, 3).transpose(
            0, 1, 3, 2, 4, 5
        ).reshape(batch, size // 2, size // 2, 12)
        return lax.conv_general_dilated(
            blk, k2, (1, 1), ((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def v_s2d_idx(x):
        xn = norm(x)
        # strided slices instead of a 6-D transpose
        parts = [
            xn[:, py::2, px::2, :] for py in range(2) for px in range(2)
        ]
        blk = jnp.concatenate(parts, axis=-1)  # [B,H/2,W/2,12] (py,px,ch)
        return lax.conv_general_dilated(
            blk, k2, (1, 1), ((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def v_s2d_cat(x):
        # transpose-free full 2x2 s2d: W-pairing is a free row-major view,
        # H-pairing is a channel-concat of two H-strided slices.
        xn = norm(x)
        xc = xn.reshape(batch, size, size // 2, 6)  # free (px,ch) blocking
        blk = jnp.concatenate([xc[:, 0::2], xc[:, 1::2]], axis=-1)
        return lax.conv_general_dilated(
            blk, k2, (1, 1), ((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # even/odd H rows -> two stride-1 convs summed (no channel concat)
    # out[r] = sum_jy E[r-1+jy] K[2jy] + sum_jy O[r-1+jy] K[2jy+1]
    ke = kpadw.reshape(7, 4, 6, 64)[0::2].astype(d)  # [4,4,6,64] dy even
    ko = kpadw.reshape(7, 4, 6, 64)[1::2].astype(d)  # [3,4,6,64] dy odd

    def v_evenodd(x):
        xn = norm(x)
        xc = xn.reshape(batch, size, size // 2, 6)
        e, o = xc[:, 0::2], xc[:, 1::2]
        ye = lax.conv_general_dilated(
            e, ke, (1, 1), ((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        yo = lax.conv_general_dilated(
            o, ko, (1, 1), ((1, 1), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return ye + yo

    variants = dict(plain=v_plain, wpair=v_wpair, s2d_xla=v_s2d_xla,
                    s2d_idx=v_s2d_idx, s2d_cat=v_s2d_cat, evenodd=v_evenodd)
    ref = None
    for name, fn in variants.items():
        c = jax.jit(fn).lower(x).compile()
        out = np.asarray(c(x), np.float32)
        if ref is None:
            ref = out
        else:
            err = np.max(np.abs(out - ref))
            assert err < 2e-2 * max(1.0, np.max(np.abs(ref))), (name, err)
        print(f"{name:10s} {timeit(c, x):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
