"""Serving throughput: sequential Predictor.detect vs pipelined
detect_stream on one TPU chip, END TO END — host resize/pad preprocessing,
device compute, host unmold back to original-image pixel space.

    python scripts/bench_serving.py [n_images] [batch] [size] [backbone]

The reference's serving story stops at a TRT engine; feeding it is the
user's problem. detect_stream overlaps the three stages, so the chip stays
busy while the (single-core) host prepares the next batch and unmolds the
previous one.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    backbone = sys.argv[4] if len(sys.argv) > 4 else "resnet101"

    from maskrcnn_tf2_tpu.config import MaskRCNNConfig
    from maskrcnn_tf2_tpu.predictor import Predictor
    from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    cfg = MaskRCNNConfig(
        image_shape=(size, size, 3),
        num_classes=2,
        backbone=backbone,
        compute_dtype="bfloat16",
        image_min_dim=size,
        image_max_dim=size,
    )

    import jax

    params_rng = jax.random.PRNGKey(0)
    from maskrcnn_tf2_tpu.models import MaskRCNN
    from maskrcnn_tf2_tpu.ops.image import compose_image_meta
    import jax.numpy as jnp

    model = MaskRCNN(cfg)
    imgs0 = jnp.zeros((batch, size, size, 3))
    meta0 = jnp.tile(
        jnp.asarray(
            compose_image_meta(
                0, (size, size, 3), (size, size, 3), (0, 0, size, size), 1.0,
                np.ones(cfg.num_classes),
            )
        ),
        (batch, 1),
    )
    variables = jax.jit(
        lambda r: model.init({"params": r}, imgs0, meta0, train=False)
    )(params_rng)
    pred = Predictor(cfg, variables)

    # Realistic inputs: mixed-size uint8 camera frames -> resize+pad on host.
    rs = np.random.RandomState(0)
    shapes = [(768, 1024), (1024, 768), (800, 1200), (1080, 1920)]
    images = [
        rs.randint(0, 255, (*shapes[i % len(shapes)], 3), np.uint8)
        for i in range(n)
    ]

    # warmup both paths (one compile, shared graph)
    list(pred.detect_stream(iter(images[: 2 * batch]), batch_size=batch))
    pred.detect(images[:batch])

    t0 = time.perf_counter()
    seq_results = []
    for i in range(0, n, batch):
        chunk = images[i : i + batch]
        if len(chunk) < batch:
            chunk = chunk + [images[0]] * (batch - len(chunk))
        seq_results.extend(pred.detect(chunk))
    dt_seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    stream_results = list(
        pred.detect_stream(iter(images), batch_size=batch, depth=2)
    )
    dt_stream = time.perf_counter() - t0
    assert len(stream_results) == n

    print(
        f"sequential detect():  {n / dt_seq:7.2f} img/s  ({dt_seq:.2f} s)\n"
        f"detect_stream():      {n / dt_stream:7.2f} img/s  ({dt_stream:.2f} s)"
        f"  -> {dt_seq / dt_stream:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
