"""End-to-end demo/validation: train on synthetic shapes, evaluate AP.

Exercises the full user path (DataLoader -> train_model -> orbax checkpoint
-> Predictor -> COCO-style eval). Run on TPU or CPU.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.data.synthetic import SyntheticShapesDataset
from maskrcnn_tf2_tpu.eval.coco_eval import evaluate_dataset
from maskrcnn_tf2_tpu.predictor import Predictor
from maskrcnn_tf2_tpu.train.loop import train_model
from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--n_train", type=int, default=256)
    p.add_argument("--n_val", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--img", type=int, default=128)
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--ckpt", default="/tmp/shapes_ckpt")
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
        batch_size=args.batch_size,
        epochs=args.epochs,
        learning_rate=1e-3,
        checkpoints_dir=args.ckpt,
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
    print(f"trained in {time.time() - t0:.0f}s")

    pred = Predictor(cfg, {"params": state.params, "batch_stats": state.batch_stats})
    stats = evaluate_dataset(pred, val_ds, cfg, use_masks=True)
    print("FINAL_METRICS " + json.dumps(stats))


if __name__ == "__main__":
    main()
