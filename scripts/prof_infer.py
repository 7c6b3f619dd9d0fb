"""Profile the flagship inference graph on TPU: wall time + top device ops.

    python scripts/prof_infer.py [batch] [image_size] [backbone]

Prints ms/batch, img/s, and the top-k device ops from a jax.profiler trace
(utils/profiling.py). Feature maps travel as jit ARGUMENTS (closed-over
arrays blow up the axon remote-compile payload).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.models import MaskRCNN
from maskrcnn_tf2_tpu.ops.image import compose_image_meta
from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache
from maskrcnn_tf2_tpu.utils.profiling import print_top_ops, trace


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    backbone = sys.argv[3] if len(sys.argv) > 3 else "resnet101"

    enable_cache()
    cfg = MaskRCNNConfig(
        image_shape=(size, size, 3),
        num_classes=2,
        backbone=backbone,
        compute_dtype="bfloat16",
        image_min_dim=size,
        image_max_dim=size,
    )
    model = MaskRCNN(cfg)
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, size, size, 3).astype(np.float32)
    )
    meta = jnp.tile(
        jnp.asarray(
            compose_image_meta(
                0, (size, size, 3), (size, size, 3), (0, 0, size, size), 1.0,
                np.ones(cfg.num_classes),
            )
        ),
        (batch, 1),
    )
    variables = jax.jit(
        lambda r: model.init({"params": r}, images, meta, train=False)
    )(jax.random.PRNGKey(0))

    if os.environ.get("QUANT", "") == "1":  # profile the int8 PTQ graph
        import dataclasses

        from maskrcnn_tf2_tpu.export.quantize import quantize_for_inference

        cfg = dataclasses.replace(
            cfg,
            quant_classifier=os.environ.get("QUANT_CLS", "") == "1",
            quant_mask_head=os.environ.get("QUANT_MASK", "") == "1",
        )
        cfg, variables = quantize_for_inference(
            cfg, dict(variables), [(images, meta)]
        )
        model = MaskRCNN(cfg)
        print(
            f"profiling quant_mode=int8 graph (cls={cfg.quant_classifier} "
            f"mask={cfg.quant_mask_head})",
            flush=True,
        )

    def infer(images, meta):
        out = model.apply(variables, images, meta, train=False)
        return out["detections"], out["mrcnn_masks"]

    compiled = jax.jit(infer).lower(images, meta).compile()
    d, m = compiled(images, meta)
    # axon-tunnel-reliable timing: end with a scalar fetch
    float(jnp.sum(d))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        d, m = compiled(images, meta)
    jax.block_until_ready((d, m))
    dt = (time.perf_counter() - t0) / iters
    print(f"b{batch}@{size} {backbone}: {dt * 1e3:.2f} ms/batch  "
          f"{batch / dt:.2f} img/s", flush=True)

    tdir = trace(lambda: jax.block_until_ready(
        [compiled(images, meta) for _ in range(3)]
    ))
    print(f"trace dir: {tdir}")
    print_top_ops(tdir, k=40)


if __name__ == "__main__":
    main()
