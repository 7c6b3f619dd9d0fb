"""Profile the flagship train step on TPU: wall time + top device ops.

    python scripts/prof_train.py [batch] [image_size] [backbone]

Builds the exact train step bench.py measures (r50@512 b8 by default) and
prints ms/step, img/s, and the top-k device ops from a jax.profiler trace.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.ops.image import compose_image_meta
from maskrcnn_tf2_tpu.train.train_step import create_train_state, make_train_step
from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache
from maskrcnn_tf2_tpu.utils.profiling import print_top_ops, trace


def main():
    tb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    backbone = sys.argv[3] if len(sys.argv) > 3 else "resnet50"

    enable_cache()
    tcfg = MaskRCNNConfig(
        image_shape=(size, size, 3),
        num_classes=81,
        backbone=backbone,
        compute_dtype="bfloat16",
        image_min_dim=size,
        image_max_dim=size,
    )
    state = create_train_state(tcfg, jax.random.PRNGKey(0))
    g = tcfg.max_gt_instances
    mh, mw = tcfg.mini_mask_shape if tcfg.use_mini_masks else (size, size)
    rs = np.random.RandomState(0)
    tmeta = compose_image_meta(
        0, (size, size, 3), (size, size, 3), (0, 0, size, size), 1.0,
        np.ones(tcfg.num_classes),
    )
    n_gt = 8
    boxes = np.zeros((tb, g, 4), np.float32)
    y1x1 = rs.uniform(0.05, 0.6, (tb, n_gt, 2))
    hw = rs.uniform(0.1, 0.35, (tb, n_gt, 2))
    boxes[:, :n_gt, :2] = y1x1
    boxes[:, :n_gt, 2:] = np.minimum(y1x1 + hw, 0.98)
    batch_t = {
        "images": jnp.asarray(rs.rand(tb, size, size, 3).astype(np.float32) * 255),
        "image_meta": jnp.tile(jnp.asarray(tmeta), (tb, 1)),
        "gt_class_ids": jnp.asarray(
            np.pad(rs.randint(1, 81, (tb, n_gt)), ((0, 0), (0, g - n_gt)))
        ),
        "gt_boxes": jnp.asarray(boxes),
        "gt_masks": jnp.asarray((rs.rand(tb, g, mh, mw) > 0.5).astype(np.float32)),
    }
    step = make_train_step(tcfg)
    rng = jax.random.PRNGKey(1)
    compiled = jax.jit(step).lower(state, batch_t, rng).compile()
    state, losses = compiled(state, batch_t, rng)
    jax.block_until_ready(losses)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = compiled(state, batch_t, rng)
    # A host-side scalar FETCH, not block_until_ready: on the axon tunnel,
    # block_until_ready on the donated train-state outputs can resolve ~10x
    # early (observed 9 ms/step vs 98 ms/step device time); only an actual
    # device->host transfer of a value that depends on the last step forces
    # the whole chain to drain.
    float(jax.tree.leaves(losses)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"train b{tb}@{size} {backbone}: {dt * 1e3:.2f} ms/step  "
          f"{tb / dt:.2f} img/s", flush=True)

    def run3():
        s, l = state, losses
        for _ in range(3):
            s, l = compiled(s, batch_t, rng)
        jax.block_until_ready(l)

    tdir = trace(run3)
    print(f"trace dir: {tdir}")
    print_top_ops(tdir, k=40)


if __name__ == "__main__":
    main()
