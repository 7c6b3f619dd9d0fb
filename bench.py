"""Benchmark: flagship inference + train throughput with MFU accounting.

Prints ONE JSON line with the driver contract keys
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus supplementary keys (train throughput, MFU, baseline definition).

Baseline (vs_baseline): an A100-class TensorRT deployment estimate for the
reference. The reference publishes RTX2060 TRT fp16 ResNet101@1024 =
58.0508 ms/img = 17.23 img/s (README.md:471); an A100-class TRT engine is
~4x an RTX2060 on this CNN workload (BASELINE.md "A100-class" target), so
baseline = 68.9 img/s. BASELINE.md's bar is >=2x that (~138 img/s/chip).

MFU = analytic executable FLOPs (XLA cost analysis) / wall time / chip peak.
"""

from __future__ import annotations

import json
import time

import numpy as np

# bf16 peak FLOPS by TPU generation (per chip).
PEAK_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
    "v6 lite": 918e12,
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, val in PEAK_FLOPS.items():
        if key in kind:
            return val
    return 197e12  # assume v5e-class when unknown


def _flops_of(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _devices_with_retry(jax, attempts: int = 6, wait_s: float = 120.0):
    """The axon TPU tunnel is occasionally unavailable for minutes at a
    time; one failed backend init would otherwise lose the whole bench run
    (observed: rc!=0 after 25 min of buffering). Bounded retry, then raise."""
    for i in range(attempts):
        try:
            return jax.devices()
        except Exception as e:  # backend init failure — tunnel down
            if i == attempts - 1:
                raise
            print(f"# TPU backend unavailable ({e!r}); retry {i + 1}/{attempts}", flush=True)
            time.sleep(wait_s)


def main():
    import jax
    import jax.numpy as jnp

    from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    from maskrcnn_tf2_tpu.config import MaskRCNNConfig
    from maskrcnn_tf2_tpu.models import MaskRCNN
    from maskrcnn_tf2_tpu.ops.image import compose_image_meta

    dev = _devices_with_retry(jax)[0]
    on_tpu = any(d.platform == "tpu" for d in jax.devices()) or "TPU" in str(dev)
    peak = _peak_flops(dev)
    if on_tpu:
        # Batch sweep (v5e, R101@1024): b8 115 < b16 129.7 < b32 140.8 img/s
        # (b48 OOMs 16 GB HBM) — larger batches amortize the per-batch
        # detection tail; the reference's TRT tables are b1 latency, so
        # throughput/chip is the honest comparison axis either way.
        image_size, batch, backbone = 1024, 32, "resnet101"
    else:  # CPU smoke fallback so the script always produces a line
        image_size, batch, backbone = 256, 1, "resnet18"

    # ---------------- inference: the headline metric ----------------
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

    from maskrcnn_tf2_tpu.utils.platform import inference_compiler_options

    copts = inference_compiler_options()

    def infer(images, meta):
        out = model.apply(variables, images, meta, train=False)
        return out["detections"], out["mrcnn_masks"]

    compiled_infer = (
        jax.jit(infer, compiler_options=copts).lower(images, meta).compile()
    )
    infer_flops = _flops_of(compiled_infer)
    jax.block_until_ready(compiled_infer(images, meta))  # warmup

    # Best-of-windows timing: transient host/tunnel contention (anything
    # else touching the one CPU core while this runs) can inflate a single
    # long window >30x (observed: 3.8 img/s vs 140 clean with pytest
    # running concurrently). Several windows, keep the fastest — the
    # device-bound floor — so one contended window can't poison the
    # recorded artifact. Windows stay long (12 iters ≈ 2.7 s) because each
    # window pays one ~40 ms host-fetch sync: 5-iter windows measurably
    # shaved ~2.5% off the reported throughput.
    windows, iters = (3, 12) if on_tpu else (1, 3)
    best_dt = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            d, m = compiled_infer(images, meta)
        # End with a host-side FETCH of the last iteration's output: on the
        # axon tunnel, block_until_ready alone can resolve before the device
        # drains the dispatch queue (observed ~10x under-measurement on the
        # train step). device_get is a pure transfer — no new computation,
        # so nothing to compile inside the timed window (detections = 77 KB).
        np.asarray(jax.device_get(d))
        best_dt = min(best_dt, time.perf_counter() - t0)
    img_per_s = batch * iters / best_dt
    mfu_infer = infer_flops * iters / best_dt / peak if infer_flops else None

    # ---------------- int8 PTQ inference (supplementary) ----------------
    # The TPU-native TRT-int8 analog (config.quant_mode, export/quantize.py).
    # Reported SEPARATELY from the headline: the baseline is the reference's
    # TRT **fp16** deployment, so the like-for-like comparison stays bf16.
    # AP cost measured on the shapes demo: scripts/eval_int8_shapes.py.
    int8_metrics = {}
    if on_tpu:
        from maskrcnn_tf2_tpu.export.quantize import quantize_for_inference

        qcfg, qvars = quantize_for_inference(
            cfg, dict(variables), [(images, meta)]
        )
        qmodel = MaskRCNN(qcfg)

        def infer_q(images, meta):
            out = qmodel.apply(qvars, images, meta, train=False)
            return out["detections"], out["mrcnn_masks"]

        compiled_q = (
            jax.jit(infer_q, compiler_options=copts).lower(images, meta).compile()
        )
        jax.block_until_ready(compiled_q(images, meta))  # warmup
        best_qdt = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(iters):
                d, m = compiled_q(images, meta)
            np.asarray(jax.device_get(d))
            best_qdt = min(best_qdt, time.perf_counter() - t0)
        int8_metrics = {
            "int8_img_per_s": round(batch * iters / best_qdt, 3),
            "int8_vs_bf16": round(best_dt / best_qdt, 4),
        }

    # ---------------- training: flagship train step ----------------
    train_metrics = {}
    if on_tpu:
        tcfg = MaskRCNNConfig(
            image_shape=(512, 512, 3),
            num_classes=81,
            backbone="resnet50",
            compute_dtype="bfloat16",
            image_min_dim=512,
            image_max_dim=512,
        )
        from maskrcnn_tf2_tpu.train.train_step import (
            create_train_state,
            make_train_step,
        )

        tb = 8
        state = create_train_state(tcfg, jax.random.PRNGKey(0))
        g = tcfg.max_gt_instances
        mh, mw = tcfg.mini_mask_shape if tcfg.use_mini_masks else (512, 512)
        rs = np.random.RandomState(0)
        tmeta = compose_image_meta(
            0, (512, 512, 3), (512, 512, 3), (0, 0, 512, 512), 1.0,
            np.ones(tcfg.num_classes),
        )
        n_gt = 8
        boxes = np.zeros((tb, g, 4), np.float32)
        y1x1 = rs.uniform(0.05, 0.6, (tb, n_gt, 2))
        hw = rs.uniform(0.1, 0.35, (tb, n_gt, 2))
        boxes[:, :n_gt, :2] = y1x1
        boxes[:, :n_gt, 2:] = np.minimum(y1x1 + hw, 0.98)
        batch_t = {
            "images": jnp.asarray(rs.rand(tb, 512, 512, 3).astype(np.float32) * 255),
            "image_meta": jnp.tile(jnp.asarray(tmeta), (tb, 1)),
            "gt_class_ids": jnp.asarray(
                np.pad(rs.randint(1, 81, (tb, n_gt)), ((0, 0), (0, g - n_gt)))
            ),
            "gt_boxes": jnp.asarray(boxes),
            "gt_masks": jnp.asarray(
                (rs.rand(tb, g, mh, mw) > 0.5).astype(np.float32)
            ),
        }
        def time_train(cfg_t, st):
            step = make_train_step(cfg_t)
            rng = jax.random.PRNGKey(1)
            compiled = jax.jit(step).lower(st, batch_t, rng).compile()
            flops = _flops_of(compiled)
            st, losses = compiled(st, batch_t, rng)
            jax.block_until_ready(losses)  # warmup
            t_iters = 8
            best = float("inf")
            for _ in range(3):  # best-of-windows, see the inference loop note
                t0 = time.perf_counter()
                for _ in range(t_iters):
                    st, losses = compiled(st, batch_t, rng)
                # scalar fetch, not block_until_ready
                float(jax.tree_util.tree_leaves(losses)[0])
                best = min(best, time.perf_counter() - t0)
            return tb * t_iters / best, flops * t_iters / best / peak

        tps, tmfu = time_train(tcfg, state)
        train_metrics = {
            "train_img_per_s": round(tps, 3),
            "train_config": "resnet50_512px_b8",
        }
        if tmfu:
            train_metrics["mfu_train"] = round(tmfu, 4)
        # The reference COCO CLI's own default is frozen BN (store_true at
        # reference coco.py:555) — report that flagship train mode too; the
        # primary train_img_per_s keeps the CONFIG-default train_bn=True for
        # round-over-round comparability.
        fcfg = MaskRCNNConfig(
            image_shape=(512, 512, 3),
            num_classes=81,
            backbone="resnet50",
            compute_dtype="bfloat16",
            image_min_dim=512,
            image_max_dim=512,
            train_bn=False,
            train_bn_backbone=False,
        )
        fps, _ = time_train(fcfg, create_train_state(fcfg, jax.random.PRNGKey(0)))
        train_metrics["train_img_per_s_frozen_bn"] = round(fps, 3)

    # Reference RTX2060 TRT fp16 R101@1024 = 17.23 img/s (README.md:471);
    # A100-class TRT ~ 4x that on this workload => 68.9 img/s baseline.
    rtx2060_img_per_s = 1000.0 / 58.0508
    a100_class_img_per_s = 4.0 * rtx2060_img_per_s
    out = {
        "metric": f"inference_throughput_{backbone}_{image_size}px_b{batch}",
        "value": round(img_per_s, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / a100_class_img_per_s, 3),
        "baseline": "A100-class TRT fp16 estimate = 4x RTX2060 (68.9 img/s)",
        "vs_rtx2060_trt": round(img_per_s / rtx2060_img_per_s, 3),
    }
    if mfu_infer is not None:
        out["mfu_infer"] = round(mfu_infer, 4)
        out["infer_tflops_per_img"] = round(infer_flops / batch / 1e12, 3)
    out.update(int8_metrics)
    out.update(train_metrics)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
