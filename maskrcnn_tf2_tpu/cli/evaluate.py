"""Evaluation CLI: COCO-style bbox+segm AP over a dataset.

Equivalent of the reference's evaluate flow (samples/coco/coco.py:472-521 +
the mAP-sweep notebook).

Usage:
  python -m maskrcnn_tf2_tpu.cli.evaluate --dataset_path /data/coco \
      --backbone resnet50 [--limit 500] [--minitrain]
"""

from __future__ import annotations

import argparse
import json

import jax

from maskrcnn_tf2_tpu.config import coco_config
from maskrcnn_tf2_tpu.data.coco import CocoDataset
from maskrcnn_tf2_tpu.eval.coco_eval import evaluate_dataset
from maskrcnn_tf2_tpu.predictor import Predictor
from maskrcnn_tf2_tpu.train import checkpoint as ckpt_lib
from maskrcnn_tf2_tpu.train.train_step import create_train_state

MINITRAIN_CLASSES = ["person", "bicycle", "car", "motorcycle"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--subset", default="val")
    p.add_argument("--year", default="2017")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--minitrain", action="store_true")
    p.add_argument("--checkpoints_dir", default="logs")
    p.add_argument("--out", default=None, help="write metrics JSON here")
    args = p.parse_args(argv)

    class_names = MINITRAIN_CLASSES if args.minitrain else None
    cfg = coco_config(
        backbone=args.backbone,
        num_classes=(1 + len(class_names)) if class_names else 81,
        image_shape=(args.img_size, args.img_size, 3),
        image_min_dim=args.img_size,
        image_max_dim=args.img_size,
        batch_size=args.batch_size,
        checkpoints_dir=args.checkpoints_dir,
    )
    ds = CocoDataset()
    ds.load_coco(args.dataset_path, args.subset, args.year, class_names=class_names)
    ds.prepare()

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    manager = ckpt_lib.make_manager(cfg)
    state, epoch, _ = ckpt_lib.restore(manager, state)
    if epoch == 0:
        print("WARNING: no checkpoint found — evaluating random weights")

    pred = Predictor(cfg, {"params": state.params, "batch_stats": state.batch_stats})
    stats = evaluate_dataset(pred, ds, cfg, limit=args.limit)
    print(json.dumps(stats, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(stats, f)


if __name__ == "__main__":
    main()
