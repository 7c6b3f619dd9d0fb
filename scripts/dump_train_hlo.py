"""Dump the optimized HLO of the flagship train step (bench.py's config)
to a file for fusion-level inspection.

    python scripts/dump_train_hlo.py [out_path] [batch] [size] [backbone]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.ops.image import compose_image_meta
from maskrcnn_tf2_tpu.train.train_step import create_train_state, make_train_step
from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_hlo.txt"
    tb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    backbone = sys.argv[4] if len(sys.argv) > 4 else "resnet50"

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
    with open(out, "w") as f:
        f.write(compiled.as_text())
    print("wrote", out, os.path.getsize(out), "bytes")


if __name__ == "__main__":
    main()
