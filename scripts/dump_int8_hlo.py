"""Dump the int8 inference graph's optimized HLO to /tmp/int8_hlo.txt and
summarize the clamp_convert fusions (the unfused quantize passes)."""
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.export.quantize import quantize_for_inference
from maskrcnn_tf2_tpu.models import MaskRCNN
from maskrcnn_tf2_tpu.ops.image import compose_image_meta
from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    backbone = sys.argv[3] if len(sys.argv) > 3 else "resnet101"
    enable_cache()
    cfg = MaskRCNNConfig(
        image_shape=(size, size, 3), num_classes=2, backbone=backbone,
        compute_dtype="bfloat16", image_min_dim=size, image_max_dim=size,
    )
    model = MaskRCNN(cfg)
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, size, size, 3).astype(np.float32)
    )
    meta = jnp.tile(
        jnp.asarray(compose_image_meta(
            0, (size, size, 3), (size, size, 3), (0, 0, size, size), 1.0,
            np.ones(cfg.num_classes))), (batch, 1),
    )
    variables = jax.jit(
        lambda r: model.init({"params": r}, images, meta, train=False)
    )(jax.random.PRNGKey(0))
    cfg, variables = quantize_for_inference(cfg, dict(variables), [(images, meta)])
    model = MaskRCNN(cfg)

    def infer(images, meta):
        out = model.apply(variables, images, meta, train=False)
        return out["detections"], out["mrcnn_masks"]

    compiled = jax.jit(infer).lower(images, meta).compile()
    txt = compiled.as_text()
    open("/tmp/int8_hlo.txt", "w").write(txt)
    print(f"wrote {len(txt)} chars")

    # print the instruction line of each clamp_convert fusion + its users
    lines = txt.splitlines()
    for i, line in enumerate(lines):
        if re.match(r"\s*%?clamp_convert_fusion(\.\d+)?\s*=", line):
            print("-" * 70)
            print(line.strip()[:300])


if __name__ == "__main__":
    main()
