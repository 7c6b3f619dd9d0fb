"""Benchmark: flagship inference throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's best published comparable number — TensorRT fp16
ResNet101 @ 1024x1024 on RTX2060 = 58.0508 ms/img => 17.23 img/s
(reference README.md:471; see BASELINE.md). We measure end-to-end jitted
images/sec (batched, fixed-shape inference graph) per chip.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    from maskrcnn_tf2_tpu.config import MaskRCNNConfig
    from maskrcnn_tf2_tpu.models import MaskRCNN
    from maskrcnn_tf2_tpu.ops.image import compose_image_meta

    on_tpu = any(d.platform == "tpu" for d in jax.devices()) or "TPU" in str(
        jax.devices()[0]
    )
    if on_tpu:
        image_size, batch, backbone = 1024, 8, "resnet101"
    else:  # CPU smoke fallback so the script always produces a line
        image_size, batch, backbone = 256, 1, "resnet18"

    cfg = MaskRCNNConfig(
        image_shape=(image_size, image_size, 3),
        num_classes=2,  # matches the reference's 2-class benchmark engines
        backbone=backbone,
        compute_dtype="bfloat16",
        image_min_dim=image_size,
        image_max_dim=image_size,
    )
    model = MaskRCNN(cfg)
    h = w = image_size
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, h, w, 3).astype(np.float32)
    )
    meta = jnp.tile(
        jnp.asarray(
            compose_image_meta(
                0, (h, w, 3), (h, w, 3), (0, 0, h, w), 1.0, np.ones(cfg.num_classes)
            )
        ),
        (batch, 1),
    )

    variables = jax.jit(
        lambda r: model.init({"params": r}, images, meta, train=False)
    )(jax.random.PRNGKey(0))

    @jax.jit
    def infer(images, meta):
        out = model.apply(variables, images, meta, train=False)
        return out["detections"], out["mrcnn_masks"]

    # Warmup / compile.
    jax.block_until_ready(infer(images, meta))

    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        d, m = infer(images, meta)
    jax.block_until_ready((d, m))
    dt = time.perf_counter() - t0

    img_per_s = batch * iters / dt
    baseline_img_per_s = 1000.0 / 58.0508  # reference TRT fp16 R101@1024, README.md:471
    print(
        json.dumps(
            {
                "metric": f"inference_throughput_{backbone}_{image_size}px_b{batch}",
                "value": round(img_per_s, 3),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_s / baseline_img_per_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
