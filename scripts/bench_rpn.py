"""Microbenchmark RPN-head formulations on a P2-sized feature map (TPU).

The full-graph profile attributes ~13 ms/batch (b16 R101@1024) to the fused
RPN prediction conv at P2 (rpn.py:69) — ~9x its bandwidth floor. This bench
times the head in isolation under several formulations to pick the fastest:

  current   shared 3x3 conv -> relu -> tensordot [512,18] (+bias)
  split     shared -> two tensordots (512->6, 512->12)
  pad128    shared -> tensordot with weights padded [512,128], slice
  flat2d    shared.reshape(-1,512) @ [512,18]
  f32pred   pred computed/emitted in f32
  sharedonly / predonly  the two stages alone (cost attribution)

Usage: python scripts/bench_rpn.py [batch] [hw]
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
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    enable_cache()
    d = jnp.bfloat16
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(batch, hw, hw, 256).astype(np.float32), dtype=d)
    w3 = jnp.asarray(rng.rand(3, 3, 256, 512).astype(np.float32) * 0.01, dtype=d)
    b3 = jnp.zeros((512,), d)
    wp = jnp.asarray(rng.rand(512, 18).astype(np.float32) * 0.01, dtype=d)
    bp = jnp.zeros((18,), d)

    def shared(f):
        y = lax.conv_general_dilated(
            f, w3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jax.nn.relu(y + b3)

    def v_current(f):
        s = shared(f)
        pred = jnp.tensordot(s, wp, axes=[[3], [0]]) + bp
        return (pred[..., :6].reshape(batch, -1, 2),
                pred[..., 6:].reshape(batch, -1, 4))

    def v_split(f):
        s = shared(f)
        lg = jnp.tensordot(s, wp[:, :6], axes=[[3], [0]]) + bp[:6]
        bx = jnp.tensordot(s, wp[:, 6:], axes=[[3], [0]]) + bp[6:]
        return lg.reshape(batch, -1, 2), bx.reshape(batch, -1, 4)

    wp128 = jnp.zeros((512, 128), d).at[:, :18].set(wp)
    bp128 = jnp.zeros((128,), d).at[:18].set(bp)

    def v_pad128(f):
        s = shared(f)
        pred = jnp.tensordot(s, wp128, axes=[[3], [0]]) + bp128
        return (pred[..., :6].reshape(batch, -1, 2),
                pred[..., 6:18].reshape(batch, -1, 4))

    def v_flat2d(f):
        s = shared(f)
        s2 = s.reshape(-1, 512)
        pred = s2 @ wp + bp
        pred = pred.reshape(batch, hw * hw, 18)
        return (pred[..., :6].reshape(batch, -1, 2),
                pred[..., 6:].reshape(batch, -1, 4))

    def v_f32pred(f):
        s = shared(f)
        pred = jnp.tensordot(s, wp.astype(jnp.float32), axes=[[3], [0]],
                             preferred_element_type=jnp.float32) + bp.astype(jnp.float32)
        return (pred[..., :6].reshape(batch, -1, 2),
                pred[..., 6:].reshape(batch, -1, 4))

    def v_sharedonly(f):
        return shared(f)

    s_fixed = jax.jit(v_sharedonly).lower(f).compile()(f)
    jax.block_until_ready(s_fixed)

    def v_predonly(s):
        pred = jnp.tensordot(s, wp, axes=[[3], [0]]) + bp
        return (pred[..., :6].reshape(batch, -1, 2),
                pred[..., 6:].reshape(batch, -1, 4))

    # ---- slim-funnel (5k = 15 channel) variants: rpn.py mode='slim' ----
    w15 = jnp.asarray(rng.rand(512, 15).astype(np.float32) * 0.01, dtype=d)
    b15 = jnp.zeros((15,), d)
    w16 = jnp.zeros((512, 16), d).at[:, :15].set(w15)
    b16 = jnp.zeros((16,), d).at[:15].set(b15)

    def v_slim15(f):  # production form: tensordot to 15, free row reshape
        s = shared(f)
        pred = jnp.tensordot(s, w15, axes=[[3], [0]]) + b15
        p5 = pred.reshape(batch, -1, 5)
        return p5[..., 0].astype(jnp.float32), p5

    def v_slim16(f):  # lane-aligned 16-wide write, slice to 15 after
        s = shared(f)
        pred = jnp.tensordot(s, w16, axes=[[3], [0]]) + b16
        p5 = pred[..., :15].reshape(batch, -1, 5)
        return p5[..., 0].astype(jnp.float32), p5

    def v_slim15_flat(f):  # 2D matmul form
        s = shared(f)
        pred = s.reshape(-1, 512) @ w15 + b15
        p5 = pred.reshape(batch, -1, 5)
        return p5[..., 0].astype(jnp.float32), p5

    def v_slim16_flat(f):
        s = shared(f)
        pred = s.reshape(-1, 512) @ w16 + b16
        p5 = pred.reshape(batch, hw * hw, 16)[..., :15].reshape(batch, -1, 5)
        return p5[..., 0].astype(jnp.float32), p5

    variants = dict(
        current=v_current, split=v_split, pad128=v_pad128,
        flat2d=v_flat2d, f32pred=v_f32pred,
        slim15=v_slim15, slim16=v_slim16,
        slim15_flat=v_slim15_flat, slim16_flat=v_slim16_flat,
        sharedonly=v_sharedonly,
    )
    for name, fn in variants.items():
        c = jax.jit(fn).lower(f).compile()
        print(f"{name:12s} {timeit(c, f):8.3f} ms", flush=True)
    c = jax.jit(v_predonly).lower(s_fixed).compile()
    print(f"{'predonly':12s} {timeit(c, s_fixed):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
