"""Accuracy validation for int8 PTQ: train on synthetic shapes, then compare
COCO-style AP between the bf16 graph and the calibrated int8 graph.

This is the AP-parity evidence the environment permits for the quantized
deployment path (the TRT-int8 analog), mirroring what the reference would
check by evaluating a TRT engine against the Keras graph.

    python scripts/eval_int8_shapes.py --epochs 10
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.data.synthetic import SyntheticShapesDataset
from maskrcnn_tf2_tpu.eval.coco_eval import evaluate_dataset
from maskrcnn_tf2_tpu.export.inference import process_input
from maskrcnn_tf2_tpu.export.quantize import quantize_for_inference
from maskrcnn_tf2_tpu.predictor import Predictor
from maskrcnn_tf2_tpu.train.loop import train_model
from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--n_train", type=int, default=256)
    p.add_argument("--n_val", type=int, default=48)
    p.add_argument("--calib", type=int, default=16, help="calibration images")
    p.add_argument("--img", type=int, default=128)
    p.add_argument("--backbone", default="resnet18")
    args = p.parse_args()

    enable_cache()
    cfg = MaskRCNNConfig(
        image_shape=(args.img, args.img, 3),
        image_min_dim=args.img,
        image_max_dim=args.img,
        rpn_anchor_scales=(8, 16, 32, 64, 128),
        num_classes=4,
        max_gt_instances=6,
        pre_nms_limit=1024,
        post_nms_rois_training=256,
        post_nms_rois_inference=128,
        train_rois_per_image=64,
        detection_max_instances=16,
        detection_min_confidence=0.5,
        backbone=args.backbone,
        compute_dtype="bfloat16",
        batch_size=8,
        epochs=args.epochs,
        learning_rate=1e-3,
        checkpoints_dir="/tmp/int8_shapes_ckpt",
        log_per_steps=10,
    )
    train_ds = SyntheticShapesDataset()
    train_ds.load_shapes(args.n_train, args.img, args.img, seed=1)
    train_ds.prepare()
    val_ds = SyntheticShapesDataset()
    val_ds.load_shapes(args.n_val, args.img, args.img, seed=2)
    val_ds.prepare()

    t0 = time.time()
    state = train_model(cfg, train_ds, val_ds, resume=False)
    print(f"trained in {time.time() - t0:.0f}s", flush=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    pred = Predictor(cfg, variables)
    stats_bf16 = evaluate_dataset(pred, val_ds, cfg, use_masks=True, verbose=False)
    print("bf16 " + json.dumps(stats_bf16), flush=True)

    # calibration over TRAIN images (never the eval set), batched like serving
    def calib_batches():
        ids = list(range(min(args.calib, train_ds.num_images)))
        for i in range(0, len(ids), cfg.batch_size):
            chunk = ids[i : i + cfg.batch_size]
            if len(chunk) < cfg.batch_size:
                chunk = list(chunk) + [chunk[-1]] * (cfg.batch_size - len(chunk))
            ims, metas = [], []
            for iid in chunk:
                m, meta = process_input(train_ds.load_image(iid), cfg, image_id=0)
                ims.append(m)
                metas.append(meta)
            yield jnp.asarray(np.stack(ims)), jnp.asarray(np.stack(metas))

    qcfg, qvars = quantize_for_inference(cfg, variables, calib_batches())
    qpred = Predictor(qcfg, qvars)
    stats_int8 = evaluate_dataset(qpred, val_ds, qcfg, use_masks=True, verbose=False)
    print("int8 " + json.dumps(stats_int8), flush=True)

    summary = {
        "bbox_ap_bf16": stats_bf16["bbox"]["AP"],
        "bbox_ap_int8": stats_int8["bbox"]["AP"],
        "segm_ap_bf16": stats_bf16["segm"]["AP"],
        "segm_ap_int8": stats_int8["segm"]["AP"],
    }
    summary["bbox_ap_drop"] = round(summary["bbox_ap_bf16"] - summary["bbox_ap_int8"], 4)
    summary["segm_ap_drop"] = round(summary["segm_ap_bf16"] - summary["segm_ap_int8"], 4)
    print("INT8_SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
