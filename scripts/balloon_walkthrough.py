"""Balloon walkthrough: the end-user notebook flow, end to end.

The reference's primary user docs are six notebooks driving the balloon
sample (``/root/reference/notebooks/``: train -> infer -> optimize/deploy on
a VIA-annotated dataset, ``samples/balloon/balloon.py``). This script is
that flow as one copy-paste-runnable artifact:

  1. dataset     — a balloon-style VIA dataset (generated fixture here; drop
                   in the real balloon dataset root to train on it),
                   loaded through ``BalloonDataset`` (data/balloon.py)
  2. train       — ``train_model`` with checkpoints + plateau LR
  3. evaluate    — BOTH evaluators: the numpy VOC-mAP port
                   (eval/metrics.py, reference evaluating.py:94-128) and
                   CocoEvalLite (eval/coco_eval.py, pycocotools-exact)
  4. engine      — AOT-compile + serialize the inference executable
                   (export/engine.py, the TRT-engine-build analog), reload,
                   verify against the live predictor
  5. detect      — ``Predictor.detect`` with overlay PNGs written to disk

Run (CPU smoke, ~5 min):     python scripts/balloon_walkthrough.py --smoke
Run (TPU, real training):    python scripts/balloon_walkthrough.py \
                                 --dataset /path/to/balloon --epochs 20
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache


# ---------------------------------------------------------------------------
# 1. Dataset — balloon-style VIA fixture (ellipse "balloons" on noise)
# ---------------------------------------------------------------------------

def make_via_fixture(root: str, split: str, n: int, size: int, seed: int) -> None:
    """Generate a learnable VIA-annotated dataset in the exact on-disk layout
    the reference's balloon sample consumes (samples/balloon/balloon.py:29-63:
    ``{root}/{split}/via_region_data.json`` + images)."""
    import cv2

    rng = np.random.RandomState(seed)
    sub = os.path.join(root, split)
    os.makedirs(sub, exist_ok=True)
    ann = {}
    for i in range(n):
        img = rng.randint(0, 60, (size, size, 3), np.uint8)  # dark noise bg
        regions = {}
        for j in range(rng.randint(1, 4)):
            cy, cx = rng.randint(size // 5, 4 * size // 5, 2)
            ry, rx = rng.randint(size // 12, size // 5, 2)
            color = (int(rng.randint(150, 255)), int(rng.randint(100, 200)), int(rng.randint(150, 255)))
            cv2.ellipse(img, (cx, cy), (rx, ry), 0, 0, 360, color, -1)
            theta = np.linspace(0, 2 * np.pi, 16, endpoint=False)
            xs = np.clip(cx + rx * np.cos(theta), 0, size - 1).astype(int)
            ys = np.clip(cy + ry * np.sin(theta), 0, size - 1).astype(int)
            regions[str(j)] = {
                "shape_attributes": {
                    "name": "polygon",
                    "all_points_x": xs.tolist(),
                    "all_points_y": ys.tolist(),
                },
                "region_attributes": {"class": "balloon"},
            }
        name = f"balloon_{split}_{i}.jpg"
        cv2.imwrite(os.path.join(sub, name), img)
        ann[f"{name}{os.path.getsize(os.path.join(sub, name))}"] = {
            "filename": name,
            "regions": regions,
        }
    with open(os.path.join(sub, "via_region_data.json"), "w") as f:
        json.dump(ann, f)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default=None,
                   help="balloon dataset root (train/ + val/ VIA dirs); "
                   "generated fixture if omitted")
    p.add_argument("--smoke", action="store_true",
                   help="tiny config for a fast CPU run")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--img", type=int, default=None)
    p.add_argument("--backbone", default=None)
    p.add_argument("--out", default="/tmp/balloon_walkthrough")
    args = p.parse_args()

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # The axon site hook re-pins the TPU at interpreter start; the env
        # var alone does not stick (see CLAUDE.md) — honor it explicitly.
        import jax

        jax.config.update("jax_platforms", "cpu")
    enable_cache()
    os.makedirs(args.out, exist_ok=True)
    img = args.img or (64 if args.smoke else 256)
    epochs = args.epochs or (2 if args.smoke else 12)
    backbone = args.backbone or ("mobilenet" if args.smoke else "resnet50")

    # ---- 1. dataset ----
    from maskrcnn_tf2_tpu.data.balloon import BalloonDataset

    root = args.dataset
    if root is None:
        root = os.path.join(args.out, "data")
        make_via_fixture(root, "train", 48 if args.smoke else 192, img, seed=1)
        make_via_fixture(root, "val", 8 if args.smoke else 24, img, seed=2)
        print(f"[1/5] generated VIA fixture at {root}")
    train_ds, val_ds = BalloonDataset(), BalloonDataset()
    train_ds.load_balloon(root, "train")
    train_ds.prepare()
    val_ds.load_balloon(root, "val")
    val_ds.prepare()
    print(f"[1/5] dataset: {len(train_ds)} train / {len(val_ds)} val, "
          f"classes={train_ds.class_names}")

    # The balloon config mirrors the reference's BALLOON_CONFIG overrides
    # (samples/balloon/balloon.py:5-6: 2 classes over the COCO base).
    tiny = dict(
        top_down_pyramid_size=64, fpn_cls_fc_layers_size=128,
        mask_conv_channels=64, pre_nms_limit=256,
        post_nms_rois_training=64, post_nms_rois_inference=64,
        train_rois_per_image=32,
    ) if args.smoke else {}
    cfg = MaskRCNNConfig(
        image_shape=(img, img, 3), image_min_dim=img, image_max_dim=img,
        rpn_anchor_scales=(8, 16, 32, 64, 128) if img <= 256 else (32, 64, 128, 256, 512),
        num_classes=2,  # background + balloon
        max_gt_instances=8, detection_max_instances=16,
        detection_min_confidence=0.5, backbone=backbone,
        compute_dtype="float32" if args.smoke else "bfloat16",
        batch_size=2 if args.smoke else 8, epochs=epochs,
        learning_rate=1e-3, checkpoints_dir=os.path.join(args.out, "ckpt"),
        log_per_steps=10, **tiny,
    )

    # ---- 2. train ----
    from maskrcnn_tf2_tpu.train.loop import train_model

    t0 = time.time()
    state = train_model(cfg, train_ds, val_ds, resume=False)
    print(f"[2/5] trained {epochs} epochs in {time.time() - t0:.0f}s")

    # ---- 3. evaluate, both evaluators ----
    from maskrcnn_tf2_tpu.data.transforms import extract_bboxes
    from maskrcnn_tf2_tpu.eval.coco_eval import evaluate_dataset
    from maskrcnn_tf2_tpu.eval.metrics import compute_ap
    from maskrcnn_tf2_tpu.predictor import Predictor

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pred = Predictor(cfg, variables)

    # 3a. numpy VOC mAP@0.5 (the reference's evaluating.py flow)
    aps = []
    for i in range(len(val_ds)):
        image = val_ds.load_image(i)
        gt_masks, gt_ids = val_ds.load_mask(i)
        gt_boxes = extract_bboxes(gt_masks)
        r = pred.detect([image])[0]
        ap, _, _, _ = compute_ap(
            gt_boxes, gt_ids, gt_masks, r["rois"], r["class_ids"],
            r["scores"], r["masks"],
        )
        aps.append(ap)
    print(f"[3/5] numpy mAP@0.5 (evaluating.py port): {np.mean(aps):.3f}")

    # 3b. CocoEvalLite (pycocotools-exact COCO metrics)
    stats = evaluate_dataset(pred, val_ds, cfg, use_masks=True, verbose=False)
    print(f"[3/5] CocoEvalLite: bbox AP={stats['bbox']['AP']:.3f} "
          f"segm AP={stats['segm']['AP']:.3f}")

    # ---- 4. AOT engine (TRT-engine-build analog) ----
    from maskrcnn_tf2_tpu.export.engine import build_engine, load_engine
    from maskrcnn_tf2_tpu.export.inference import process_input

    engine_path = os.path.join(args.out, "balloon.engine")
    build_engine(cfg, variables, engine_path, batch_size=1)
    eng = load_engine(engine_path)
    image = val_ds.load_image(0)
    molded, meta = process_input(image, cfg, image_id=0)
    det_eng, _ = eng(molded[None].astype(np.uint8), meta[None].astype(np.float32))
    n_eng = int((det_eng[0, :, 4] > 0).sum())
    print(f"[4/5] engine built -> {engine_path} "
          f"({os.path.getsize(engine_path) // 1024} KiB), "
          f"reloaded, {n_eng} detections on val[0]")

    # ---- 5. detect + overlays ----
    import cv2

    n_total = 0
    for i in range(min(4, len(val_ds))):
        image = val_ds.load_image(i)
        r = pred.detect([image])[0]
        n_total += len(r["class_ids"])
        overlay = image.copy()
        for k, (y1, x1, y2, x2) in enumerate(r["rois"]):
            cv2.rectangle(overlay, (x1, y1), (x2, y2), (255, 0, 0), 1)
            m = r["masks"][:, :, k]
            overlay[m] = (0.5 * overlay[m] + 0.5 * np.array([0, 255, 0])).astype(np.uint8)
        cv2.imwrite(
            os.path.join(args.out, f"det_{i}.png"),
            cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR),
        )
    print(f"[5/5] detect: {n_total} instances over 4 val images, overlays in {args.out}")

    print("WALKTHROUGH_OK " + json.dumps({
        "map50_numpy": float(np.mean(aps)),
        "bbox_ap": stats["bbox"]["AP"],
        "segm_ap": stats["segm"]["AP"],
        "engine_detections": n_eng,
    }))


if __name__ == "__main__":
    main()
