"""Batch-1 latency sweep mirroring the reference's OWN headline benchmark
table (TensorRT trtexec fp16 rows, /root/reference/README.md:460-550; values
transcribed in BASELINE.md) — every (backbone, size) row the reference
publishes for RTX2060 fp16, measured head-to-head on one TPU chip in bf16.

    python scripts/bench_latency_table.py [--quick]

Prints one markdown row per config plus a JSON line with all results, and
writes BENCH_LATENCY_TABLE.md at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# (backbone, image_size) -> (rtx2060_fp16_ms, jetson_fp16_ms or None)
# Sources: reference README.md lines cited in BASELINE.md.
REFERENCE_ROWS = [
    ("resnet18", 1024, 46.6753, 120.743),
    ("resnet34", 1024, 49.6903, None),
    ("resnet50", 1024, 54.0631, 130.978),
    ("resnet101", 1024, 58.0508, 158.226),
    ("mobilenet", 1024, 40.6769, None),
    ("mobilenetv2", 1024, 43.8202, 115.311),
    ("efficientnetb0", 1024, 56.5004, None),
    ("efficientnetb2", 1024, 64.0362, None),
    ("resnet18", 512, 19.6023, 55.0673),
    ("resnet50", 512, 25.6267, None),
    ("resnet101", 512, 28.1458, 73.7332),
    ("mobilenet", 512, 19.5832, None),
    ("efficientnetb0", 512, 24.5434, None),
    ("efficientnetb3", 512, 34.7724, 83.1854),
]


def measure_latency(backbone: str, size: int, int8: bool = False) -> float:
    """Compile the full inference graph (2 classes, reference benchmark
    setting) and return best-of-windows ms/image at batch 1. ``int8=True``
    calibrates on the benchmark input and times the int8 graph (incl. the
    s8 residual stream + C endpoints) instead — the TRT-int8 analog
    (reference inference_optimize.py engines are the fp16 rows)."""
    import jax
    import jax.numpy as jnp

    from maskrcnn_tf2_tpu.config import MaskRCNNConfig
    from maskrcnn_tf2_tpu.models import MaskRCNN
    from maskrcnn_tf2_tpu.ops.image import compose_image_meta

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
        np.random.RandomState(0).rand(1, size, size, 3).astype(np.float32)
    )
    meta = jnp.asarray(
        compose_image_meta(
            0, (size, size, 3), (size, size, 3), (0, 0, size, size), 1.0,
            np.ones(cfg.num_classes),
        )
    )[None]
    variables = jax.jit(
        lambda r: model.init({"params": r}, images, meta, train=False)
    )(jax.random.PRNGKey(0))

    if int8:
        from maskrcnn_tf2_tpu.export.quantize import quantize_for_inference

        cfg, variables = quantize_for_inference(
            cfg, dict(variables), [(images, meta)]
        )
        model = MaskRCNN(cfg)

    def infer(images, meta):
        out = model.apply(variables, images, meta, train=False)
        return out["detections"], out["mrcnn_masks"]

    compiled = jax.jit(infer).lower(images, meta).compile()
    d, _ = compiled(images, meta)
    np.asarray(jax.device_get(d))  # warmup, host-fetch sync (CLAUDE.md rule)

    iters, windows = 50, 3
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            d, m = compiled(images, meta)
        np.asarray(jax.device_get(d))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    rows = REFERENCE_ROWS[:2] if "--quick" in sys.argv else REFERENCE_ROWS

    with_int8 = "--no-int8" not in sys.argv

    results = []
    lines = [
        "# Batch-1 latency: this framework (1x TPU v5e, bf16 + int8) vs the "
        "reference's published TensorRT fp16 engines",
        "",
        "The reference's headline benchmark is this exact table "
        "(README.md:460-550): trtexec mean GPU compute latency, batch 1, "
        "2 classes. Same configs, same batch, measured end-to-end "
        "(preprocessing-normalize + backbone + FPN + RPN + proposal + "
        "ROIAlign + heads + detection NMS + masks) on one chip. The int8 "
        "column is the TRT-int8 analog (export/quantize.py PTQ incl. the s8 "
        "residual stream + C endpoints). Measured finding: at BATCH 1 int8 "
        "LOSES on every config (+~17 ms at 1024², +~5 ms at 512² — the "
        "quantize/dequant fusions are occupancy-bound with one image); int8 "
        "is a batch-throughput play (1.30x bf16 at b32, bench_int8.py). "
        "bf16 therefore carries every best-speedup cell.",
        "",
        "| Backbone | Input | TPU bf16 (ms) | TPU int8 (ms) | RTX2060 TRT "
        "fp16 (ms) | best speedup | Jetson AGX fp16 (ms) | speedup |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for backbone, size, rtx_ms, jet_ms in rows:
        t0 = time.time()
        ms = measure_latency(backbone, size)
        ms_q = measure_latency(backbone, size, int8=True) if with_int8 else None
        best_ms = min(ms, ms_q) if ms_q else ms
        print(
            f"{backbone}@{size}: bf16 {ms:.2f} ms"
            + (f", int8 {ms_q:.2f} ms" if ms_q else "")
            + f"  (rtx2060 {rtx_ms} ms -> {rtx_ms / best_ms:.2f}x)"
            f"  [measured in {time.time() - t0:.0f}s]",
            flush=True,
        )
        jet_txt = f"{jet_ms:.1f} | {jet_ms / best_ms:.2f}x" if jet_ms else "— | —"
        q_txt = f"{ms_q:.2f}" if ms_q else "—"
        lines.append(
            f"| {backbone} | {size}² | **{ms:.2f}** | {q_txt} | {rtx_ms:.2f} | "
            f"**{rtx_ms / best_ms:.2f}x** | {jet_txt} |"
        )
        results.append(
            {
                "backbone": backbone,
                "size": size,
                "tpu_ms": round(ms, 3),
                "tpu_int8_ms": round(ms_q, 3) if ms_q else None,
                "rtx2060_ms": rtx_ms,
                "speedup_rtx2060": round(rtx_ms / best_ms, 3),
                "jetson_ms": jet_ms,
                "speedup_jetson": round(jet_ms / best_ms, 3) if jet_ms else None,
            }
        )

    geo = float(np.exp(np.mean([np.log(r["speedup_rtx2060"]) for r in results])))
    lines += [
        "",
        f"Geometric-mean speedup vs RTX2060 TRT fp16 (best of bf16/int8 per "
        f"row): **{geo:.2f}x** across {len(results)} published configs.",
        "",
        "Reproduce: `python scripts/bench_latency_table.py` "
        "(`--no-int8` for the bf16-only sweep).",
    ]
    out_path = os.path.join(os.path.dirname(__file__), "..", "BENCH_LATENCY_TABLE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"geomean_speedup_rtx2060": round(geo, 3), "rows": results}))
    print(f"wrote {os.path.abspath(out_path)}")


if __name__ == "__main__":
    main()
