"""Sweep per-jit XLA compiler options over the flagship inference graph,
looking for free conv-MFU headroom (STATUS roofline: backbone convs run at
60-85% MFU; every named hot op is within ~25% of its analytic floor).

    python scripts/sweep_xla_options.py [batch] [size] [backbone]

Unknown/rejected options are caught and reported as SKIP — jaxlib versions
differ in which xla_tpu_* knobs they expose.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CANDIDATES = [
    ("baseline", None),
    # Bigger scoped-VMEM budget lets the fusion cost model keep larger
    # conv+elementwise fusions resident (default is ~16 MB on v5e).
    ("scoped_vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    # Overlap DMA with compute more aggressively in the scheduler.
    ("latency_hiding", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("flash_opt", {"xla_tpu_enable_flash_attention": "false"}),
    (
        "vmem+latency",
        {
            "xla_tpu_scoped_vmem_limit_kib": "32768",
            "xla_tpu_enable_latency_hiding_scheduler": "true",
        },
    ),
]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    backbone = sys.argv[3] if len(sys.argv) > 3 else "resnet101"

    import jax
    import jax.numpy as jnp

    from maskrcnn_tf2_tpu.config import MaskRCNNConfig
    from maskrcnn_tf2_tpu.models import MaskRCNN
    from maskrcnn_tf2_tpu.ops.image import compose_image_meta
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

    def infer(images, meta):
        out = model.apply(variables, images, meta, train=False)
        return out["detections"], out["mrcnn_masks"]

    results = []
    for name, opts in CANDIDATES:
        try:
            t0 = time.time()
            jitted = jax.jit(infer, compiler_options=opts or {})
            compiled = jitted.lower(images, meta).compile()
            compile_s = time.time() - t0
            d, m = compiled(images, meta)
            np.asarray(jax.device_get(d))  # warmup + host-fetch sync
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(12):
                    d, m = compiled(images, meta)
                np.asarray(jax.device_get(d))
                best = min(best, time.perf_counter() - t0)
            ms = best / 12 * 1e3
            results.append((name, ms))
            print(
                f"{name:18s} {ms:8.2f} ms/batch  {batch / (best / 12):7.2f} "
                f"img/s  (compile {compile_s:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"{name:18s} SKIP: {type(e).__name__}: {str(e)[:120]}", flush=True)

    if results:
        base = dict(results).get("baseline")
        best_name, best_ms = min(results, key=lambda r: r[1])
        if base:
            print(
                f"\nbest: {best_name} {best_ms:.2f} ms "
                f"({base / best_ms:.3f}x vs baseline)"
            )


if __name__ == "__main__":
    main()
