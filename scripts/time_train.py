"""Time the flagship train step (bench.py's exact train config), nothing else.

    python scripts/time_train.py [batch] [size] [backbone]

Honors MASKRCNN_TPU_ROIALIGN / MASKRCNN_TPU_NMS env overrides, so A/B runs
of op implementations are one env var away. Best-of-3 windows of 8 steps,
host-fetch terminated (CLAUDE.md TPU-timing rules).
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


def main():
    tb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    backbone = sys.argv[3] if len(sys.argv) > 3 else "resnet50"

    enable_cache()
    extra = {}
    if os.environ.get("TRAIN_BN") == "0":
        # the reference COCO CLI's own default (coco.py:555 store_true)
        extra = dict(train_bn=False, train_bn_backbone=False)
    if os.environ.get("MASK_SLIM") == "0":
        extra["mask_train_slim"] = False
    if os.environ.get("GUARD"):
        extra["nonfinite_guard"] = os.environ["GUARD"]
    tcfg = MaskRCNNConfig(
        image_shape=(size, size, 3),
        num_classes=81,
        backbone=backbone,
        compute_dtype="bfloat16",
        image_min_dim=size,
        image_max_dim=size,
        **extra,
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
        "gt_masks": jnp.asarray((rs.rand(tb, g, mh, mw) > 0.5).astype(np.float32)),
        "gt_boxes": jnp.asarray(boxes),
    }
    step = make_train_step(tcfg)
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    if os.environ.get("GSPMD") == "1":
        # Time the REAL auto-partitioned step on a 1x1 mesh: same trace the
        # multi-chip DP x TP path compiles, including the pallas_spmd
        # shard_map islands that keep the kernels (r5; the old no_pallas
        # routing was the measured +18%). On one chip the partitioner
        # inserts no collectives, so the delta vs the plain step isolates
        # island/wiring overhead.
        from maskrcnn_tf2_tpu.parallel.gspmd import (
            make_gspmd_train_step,
            make_mesh_2d,
            shard_global_batch,
        )

        mesh = make_mesh_2d(1, 1, tcfg.mesh_data_axis, tcfg.mesh_model_axis)
        jstep, state = make_gspmd_train_step(tcfg, mesh, state)
        batch_t = shard_global_batch(batch_t, mesh, tcfg)
        compiled = jstep.lower(state, batch_t, rng).compile()
    elif os.environ.get("NO_PALLAS") == "1":
        # A/B the gspmd-path kernel set (VERDICT r3 next #5): GSPMD traces
        # under no_pallas() (tpu_custom_call has no SPMD partitioning rule),
        # so this times the XLA ROIAlign/NMS train step single-chip — the
        # kernels-only cost of choosing TP, without partitioner noise.
        from maskrcnn_tf2_tpu.utils.platform import no_pallas

        with no_pallas():
            compiled = jax.jit(step).lower(state, batch_t, rng).compile()
    elif os.environ.get("DONATE") == "1":
        # Donate the TrainState: params/opt/batch_stats alias in place, so
        # XLA drops the defensive copies an undonated 700 MB state forces.
        compiled = (
            jax.jit(step, donate_argnums=0).lower(state, batch_t, rng).compile()
        )
    else:
        compiled = jax.jit(step).lower(state, batch_t, rng).compile()
    print(f"compile {time.perf_counter() - t0:.1f}s", flush=True)
    state, losses = compiled(state, batch_t, rng)
    jax.block_until_ready(losses)

    iters, best = 8, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, losses = compiled(state, batch_t, rng)
        float(jax.tree.leaves(losses)[0])  # host fetch drains the chain
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1000
    print(
        f"train b{tb}@{size} {backbone} "
        f"no_pallas={os.environ.get('NO_PALLAS', '0')} "
        f"roialign={os.environ.get('MASKRCNN_TPU_ROIALIGN', 'default')} "
        f"train_bn={tcfg.train_bn} slim={tcfg.mask_train_slim}: "
        f"{ms:.2f} ms/step  {tb / ms * 1000:.2f} img/s"
    )


if __name__ == "__main__":
    main()
