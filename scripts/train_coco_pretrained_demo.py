"""Pretrained-init convergence proof on an on-disk COCO-format dataset.

The last unexercised link of the AP-parity chain this environment permits
(no egress -> no real COCO/ImageNet): exercises the reference's full
transfer-learning flow (samples/coco/coco.py:472-521 + resnet_models.py:292-297)
end to end:

  1. PRETRAIN a backbone on synthetic shapes (seed A) and export it through
     the npz interchange (`save_backbone_npz` — the same path ImageNet
     weights arrive by via the torchvision/timm converters);
  2. export a DIFFERENT shapes set (seed B) to on-disk COCO format
     (JPEGs + instances JSON) and load it back with CocoDataset;
  3. train twice at equal epochs: `--weights <npz>` vs random init;
  4. evaluate BOTH runs with BOTH evaluators (CocoEvalLite and the numpy
     mAP oracle) and print a comparison.

Expected: pretrained init converges faster / reaches higher AP at equal
epochs, and the two evaluators agree on the ordering.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.data.coco import CocoDataset
from maskrcnn_tf2_tpu.data.synthetic import SyntheticShapesDataset
from maskrcnn_tf2_tpu.data.synthetic_coco import export_coco_format
from maskrcnn_tf2_tpu.eval.coco_eval import evaluate_dataset
from maskrcnn_tf2_tpu.models.backbones.pretrained import save_backbone_npz
from maskrcnn_tf2_tpu.predictor import Predictor
from maskrcnn_tf2_tpu.train.loop import train_model
from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache


def make_config(args, epochs, ckpt, weights=None):
    return MaskRCNNConfig(
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
        backbone_init_weights=weights,
        compute_dtype="bfloat16",
        batch_size=args.batch_size,
        epochs=epochs,
        learning_rate=1e-3,
        checkpoints_dir=ckpt,
        log_per_steps=20,
    )


def numpy_map50(pred, dataset, limit=None):
    """Mean AP@0.5 (bbox+mask oracle, eval/metrics.py port of
    evaluating.py:36-128) over the dataset."""
    from maskrcnn_tf2_tpu.data.transforms import extract_bboxes
    from maskrcnn_tf2_tpu.eval.metrics import compute_ap

    n = len(dataset) if limit is None else min(limit, len(dataset))
    aps = []
    for i in range(n):
        img = dataset.load_image(i)
        gt_masks, gt_ids = dataset.load_mask(i)
        if gt_ids.size == 0:
            continue
        gt_boxes = extract_bboxes(gt_masks)
        r = pred.detect([img])[0]
        ap, _, _, _ = compute_ap(
            gt_boxes, gt_ids, gt_masks,
            r["rois"], r["class_ids"], r["scores"], r["masks"],
        )
        aps.append(ap)
    return float(np.mean(aps)) if aps else 0.0


def run_training(cfg, train_ds, val_ds, tag):
    t0 = time.time()
    state = train_model(cfg, train_ds, val_ds, resume=False)
    wall = time.time() - t0
    pred = Predictor(cfg, {"params": state.params, "batch_stats": state.batch_stats})
    stats = evaluate_dataset(pred, val_ds, cfg, use_masks=True, verbose=False)
    m50 = numpy_map50(pred, val_ds)
    out = {
        "tag": tag,
        "wall_s": round(wall, 1),
        "cocoeval_bbox_AP": stats["bbox"]["AP"],
        "cocoeval_bbox_AP50": stats["bbox"]["AP50"],
        "cocoeval_segm_AP": stats["segm"]["AP"],
        "numpy_mAP50_bbox": round(m50, 4),
    }
    print("RESULT " + json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrain_epochs", type=int, default=8)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--n_train", type=int, default=256)
    p.add_argument("--n_val", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--img", type=int, default=128)
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--workdir", default="/tmp/coco_pretrained_demo")
    p.add_argument("--skip_pretrain", action="store_true",
                   help="reuse an existing backbone npz in workdir")
    args = p.parse_args()

    enable_cache()
    os.makedirs(args.workdir, exist_ok=True)
    npz = os.path.join(args.workdir, "pretrained_backbone.npz")

    # ---- phase 1: pretrain on shapes (seed A), export the backbone ----
    if not (args.skip_pretrain and os.path.exists(npz)):
        pre_train = SyntheticShapesDataset()
        pre_train.load_shapes(args.n_train, args.img, args.img, seed=11)
        pre_train.prepare()
        pre_val = SyntheticShapesDataset()
        pre_val.load_shapes(args.n_val, args.img, args.img, seed=12)
        pre_val.prepare()
        cfg = make_config(
            args, args.pretrain_epochs, os.path.join(args.workdir, "ckpt_pre")
        )
        print(f"[pretrain] {args.pretrain_epochs} epochs on shapes(seed=11)")
        state = train_model(cfg, pre_train, pre_val, resume=False)
        save_backbone_npz(
            {"params": state.params, "batch_stats": state.batch_stats}, npz
        )
        print(f"[pretrain] backbone exported -> {npz}")

    # ---- phase 2: COCO-format dataset (seed B) on disk ----
    coco_root = os.path.join(args.workdir, "coco")
    if not os.path.exists(os.path.join(coco_root, "annotations")):
        for subset, n, seed in (
            ("train", args.n_train, 21),
            ("val", args.n_val, 22),
        ):
            src = SyntheticShapesDataset()
            src.load_shapes(n, args.img, args.img, seed=seed)
            src.prepare()
            export_coco_format(src, coco_root, subset=subset)
        print(f"[data] COCO-format dataset at {coco_root}")

    train_ds = CocoDataset()
    train_ds.load_coco(coco_root, "train")
    train_ds.prepare()
    val_ds = CocoDataset()
    val_ds.load_coco(coco_root, "val")
    val_ds.prepare()

    # ---- phase 3: equal-epoch comparison ----
    results = []
    for tag, weights in (("pretrained", npz), ("random", None)):
        cfg = make_config(
            args, args.epochs, os.path.join(args.workdir, f"ckpt_{tag}"),
            weights=weights,
        )
        print(f"[{tag}] training {args.epochs} epochs on the COCO-format set")
        results.append(run_training(cfg, train_ds, val_ds, tag))

    pre, rnd = results
    print(json.dumps({
        "comparison": {
            "bbox_AP_pretrained": pre["cocoeval_bbox_AP"],
            "bbox_AP_random": rnd["cocoeval_bbox_AP"],
            "pretrained_wins": pre["cocoeval_bbox_AP"] > rnd["cocoeval_bbox_AP"],
            "evaluators_agree": (
                (pre["numpy_mAP50_bbox"] > rnd["numpy_mAP50_bbox"])
                == (pre["cocoeval_bbox_AP50"] > rnd["cocoeval_bbox_AP50"])
            ),
        }
    }))


if __name__ == "__main__":
    main()
