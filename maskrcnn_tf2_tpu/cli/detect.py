"""Inference CLI: run detection on images with a trained checkpoint.

Usage:
  python -m maskrcnn_tf2_tpu.cli.detect --checkpoint_dir logs/... \
      --backbone resnet50 --num_classes 81 --images a.jpg b.jpg [--out out/]
"""

from __future__ import annotations

import argparse
import json
import os

import cv2
import jax
import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.predictor import Predictor
from maskrcnn_tf2_tpu.train import checkpoint as ckpt_lib
from maskrcnn_tf2_tpu.train.train_step import create_train_state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--num_classes", type=int, default=81)
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--checkpoints_dir", default="logs")
    p.add_argument(
        "--images",
        nargs="+",
        default=None,
        help="image paths; required unless --build_engine is given without "
        "--int8 (int8 needs them as the calibration set)",
    )
    p.add_argument("--out", default=None, help="directory for JSON + overlays")
    p.add_argument(
        "--int8",
        action="store_true",
        help="int8 post-training quantization (the TPU TRT-int8 analog): "
        "calibrates activation scales on the input images, then serves the "
        "quantized graph (~1.25x throughput, AP-neutral — see STATUS.md)",
    )
    p.add_argument(
        "--build_engine",
        default=None,
        metavar="PATH",
        help="AOT-compile the inference graph and serialize the executable "
        "to PATH (the TRT-engine-build analog: zero compilation at serving "
        "time; backend-pinned), then exit",
    )
    p.add_argument(
        "--engine_batch", type=int, default=1, help="batch size baked into --build_engine"
    )
    args = p.parse_args(argv)
    if args.images is None and not (args.build_engine and not args.int8):
        p.error(
            "--images is required (only a plain --build_engine run, without "
            "--int8 calibration, can omit it)"
        )

    cfg = MaskRCNNConfig(
        backbone=args.backbone,
        num_classes=args.num_classes,
        image_shape=(args.img_size, args.img_size, 3),
        image_min_dim=args.img_size,
        image_max_dim=args.img_size,
        checkpoints_dir=args.checkpoints_dir,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    manager = ckpt_lib.make_manager(cfg)
    state, epoch, _ = ckpt_lib.restore(manager, state)
    if epoch == 0:
        print("WARNING: no checkpoint found — using random weights")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.int8:
        import jax.numpy as jnp

        from maskrcnn_tf2_tpu.export.inference import process_input
        from maskrcnn_tf2_tpu.export.quantize import quantize_for_inference

        def calib_batches():
            for path in args.images:
                img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
                m, meta = process_input(img, cfg, image_id=0)
                yield jnp.asarray(m[None]), jnp.asarray(meta[None])

        cfg, variables = quantize_for_inference(cfg, variables, calib_batches())
    if args.build_engine:
        from maskrcnn_tf2_tpu.export.engine import build_engine

        out = build_engine(cfg, variables, args.build_engine, batch_size=args.engine_batch)
        print(f"engine written: {out} (batch={args.engine_batch})")
        return
    pred = Predictor(cfg, variables)
    for path in args.images:
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        r = pred.detect([img])[0]
        print(
            f"{path}: {len(r['class_ids'])} instances "
            f"classes={r['class_ids'].tolist()} scores={np.round(r['scores'], 3).tolist()}"
        )
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            base = os.path.splitext(os.path.basename(path))[0]
            with open(os.path.join(args.out, base + ".json"), "w") as f:
                json.dump(
                    {
                        "rois": r["rois"].tolist(),
                        "class_ids": r["class_ids"].tolist(),
                        "scores": r["scores"].tolist(),
                    },
                    f,
                )
            overlay = img.copy()
            for i, (y1, x1, y2, x2) in enumerate(r["rois"]):
                cv2.rectangle(overlay, (x1, y1), (x2, y2), (255, 0, 0), 2)
                overlay[r["masks"][:, :, i]] = (
                    0.5 * overlay[r["masks"][:, :, i]] + 0.5 * np.array([0, 255, 0])
                ).astype(np.uint8)
            cv2.imwrite(
                os.path.join(args.out, base + "_det.png"),
                cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR),
            )


if __name__ == "__main__":
    main()
