"""A/B the int8-quantized inference graph vs bf16 at the flagship bench
config (R101@1024 b32 on the real chip) — same timing protocol as bench.py.

Also reports a quick numerics sanity: top-score detections' box agreement
between the two graphs on the same input.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache

enable_cache()

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.export.quantize import quantize_for_inference
from maskrcnn_tf2_tpu.models import MaskRCNN
from maskrcnn_tf2_tpu.ops.image import compose_image_meta


def time_graph(model, variables, images, meta):
    def infer(v, images, meta):
        out = model.apply(v, images, meta, train=False)
        return out["detections"], out["mrcnn_masks"]

    compiled = jax.jit(infer).lower(variables, images, meta).compile()
    d, m = compiled(variables, images, meta)
    jax.block_until_ready((d, m))  # warmup
    windows, iters = 3, 12
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            d, m = compiled(variables, images, meta)
        np.asarray(jax.device_get(d))  # host fetch ends the window
        best = min(best, time.perf_counter() - t0)
    return images.shape[0] * iters / best, np.asarray(jax.device_get(d))


def main():
    image_size = int(os.environ.get("SIZE", "1024"))
    batch = int(os.environ.get("B", "32"))
    backbone = os.environ.get("BACKBONE", "resnet101")
    cfg = MaskRCNNConfig(
        image_shape=(image_size, image_size, 3),
        num_classes=2,
        backbone=backbone,
        compute_dtype="bfloat16",
        image_min_dim=image_size,
        image_max_dim=image_size,
        quant_mask_head=os.environ.get("QUANT_MASK", "") == "1",
    )
    model = MaskRCNN(cfg)
    h = w = image_size
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, h, w, 3).astype(np.float32) * 255.0
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

    fps_bf16, det_bf16 = time_graph(model, variables, images, meta)
    print(f"bf16 : {fps_bf16:7.2f} img/s", flush=True)

    t0 = time.perf_counter()
    qcfg, qvars = quantize_for_inference(cfg, dict(variables), [(images, meta)])
    print(f"calibration (1 batch incl. compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    qmodel = MaskRCNN(qcfg)
    fps_int8, det_int8 = time_graph(qmodel, qvars, images, meta)
    print(f"int8 : {fps_int8:7.2f} img/s  ({fps_int8 / fps_bf16:.3f}x)", flush=True)

    # numerics sanity on random weights: mean |box delta| of top detections
    b0, b1 = det_bf16[..., :4], det_int8[..., :4]
    print(json.dumps({
        "bf16_img_per_s": round(fps_bf16, 2),
        "int8_img_per_s": round(fps_int8, 2),
        "speedup": round(fps_int8 / fps_bf16, 4),
        "mean_box_delta_top5": float(np.mean(np.abs(b0[:, :5] - b1[:, :5]))),
    }))


if __name__ == "__main__":
    main()
