"""Dataset abstraction + VIA-JSON adapter + per-image GT assembly.

Re-designs the reference's ``SegmentationDataset`` (preprocess.py:16-269) as
a minimal host-side registry: subclasses register images and implement
``load_image``/``load_mask``; ``load_image_gt`` assembles one training sample
(resized image, meta vector, normalized GT boxes, class ids, masks) in numpy.
Everything heavier (normalization, augmentation, RPN targets) runs on device.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Tuple

import cv2
import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.data import transforms
from maskrcnn_tf2_tpu.ops.anchors import norm_boxes_np
from maskrcnn_tf2_tpu.ops.image import compose_image_meta


class SegmentationDataset:
    """Base dataset: a registry of images + classes.

    Class 0 is always background. ``source`` tags classes per origin dataset
    so multi-dataset training can mask inactive classes in the loss
    (the reference's ``active_class_ids`` contract).
    """

    def __init__(self):
        self._image_info: List[Dict] = []
        self.class_info: List[Dict] = [
            {"source": "", "id": 0, "name": "background"}
        ]
        self.source_class_ids: Dict[str, List[int]] = {}

    # -- registration -------------------------------------------------
    def add_class(self, source: str, class_id: int, class_name: str):
        for info in self.class_info:
            if info["source"] == source and info["id"] == class_id:
                return
        self.class_info.append(
            {"source": source, "id": class_id, "name": class_name}
        )

    def add_image(self, source: str, image_id, path: Optional[str], **kwargs):
        info = {"id": image_id, "source": source, "path": path}
        info.update(kwargs)
        self._image_info.append(info)

    def prepare(self):
        """Build contiguous internal class ids (reference coco.py:182-216)."""
        self.num_classes = len(self.class_info)
        self.class_ids = np.arange(self.num_classes)
        self.class_names = [c["name"] for c in self.class_info]
        self.num_images = len(self._image_info)
        self.class_from_source = {
            f"{c['source']}.{c['id']}": i for i, c in enumerate(self.class_info)
        }
        sources = {c["source"] for c in self.class_info if c["source"]}
        self.source_class_ids = {
            s: [0]
            + [
                i
                for i, c in enumerate(self.class_info)
                if i > 0 and c["source"] == s
            ]
            for s in sources
        }

    # -- access -------------------------------------------------------
    @property
    def image_info(self):
        return self._image_info

    def __len__(self):
        return len(self._image_info)

    def image_reference(self, idx: int):
        return self._image_info[idx].get("path")

    def load_image(self, idx: int) -> np.ndarray:
        """RGB uint8 [H, W, 3] (reference reads BGR via cv2 then flips)."""
        path = self._image_info[idx]["path"]
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def load_mask(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (masks [H, W, N] bool, class_ids [N] int32)."""
        raise NotImplementedError

    def active_class_ids(self, idx: int) -> np.ndarray:
        source = self._image_info[idx]["source"]
        active = np.zeros((self.num_classes,), np.float32)
        active[self.source_class_ids.get(source, list(range(self.num_classes)))] = 1.0
        return active


class VIADataset(SegmentationDataset):
    """VGG-Image-Annotator JSON datasets (reference SegmentationDataset
    polygon parsing, preprocess.py:145-165, and BalloonDataset,
    samples/balloon/balloon.py:9-50)."""

    def load_via(
        self,
        dataset_dir: str,
        annotations_json: str,
        class_dict: Dict[str, int],
        source: str = "via",
    ):
        for name, cid in class_dict.items():
            if cid != 0:
                self.add_class(source, cid, name)
        with open(os.path.join(dataset_dir, annotations_json)) as f:
            annotations = json.load(f)
        if isinstance(annotations, dict):
            annotations = list(annotations.values())
        for ann in annotations:
            if not ann.get("regions"):
                continue
            regions = ann["regions"]
            if isinstance(regions, dict):
                regions = list(regions.values())
            polygons = [r["shape_attributes"] for r in regions]
            classes = [
                r.get("region_attributes", {}).get("class", None) for r in regions
            ]
            path = os.path.join(dataset_dir, ann["filename"])
            img = cv2.imread(path)
            if img is None:
                continue
            h, w = img.shape[:2]
            self.add_image(
                source,
                image_id=ann["filename"],
                path=path,
                width=w,
                height=h,
                polygons=polygons,
                region_classes=classes,
                class_dict=class_dict,
            )

    def load_mask(self, idx: int):
        info = self._image_info[idx]
        n = len(info["polygons"])
        masks = np.zeros((info["height"], info["width"], n), dtype=bool)
        class_ids = np.ones((n,), np.int32)
        for i, poly in enumerate(info["polygons"]):
            pts = np.stack(
                [poly["all_points_x"], poly["all_points_y"]], axis=1
            ).astype(np.int32)
            canvas = np.zeros((info["height"], info["width"]), np.uint8)
            cv2.fillPoly(canvas, [pts], 1)
            masks[:, :, i] = canvas.astype(bool)
            cls_name = info["region_classes"][i]
            if cls_name is not None and cls_name in info["class_dict"]:
                class_ids[i] = info["class_dict"][cls_name]
        return masks, class_ids


# ---------------------------------------------------------------------------
# Per-sample GT assembly
# ---------------------------------------------------------------------------

def load_image_gt(
    dataset: SegmentationDataset,
    config: MaskRCNNConfig,
    idx: int,
    augment_fn: Optional[Callable] = None,
):
    """Assemble one fixed-shape training sample (host numpy).

    Mirrors the reference ``SegmentationDataset.__getitem__`` pipeline
    (preprocess.py:192-266) minus normalization (done on device):
    load -> resize_image/resize_mask -> optional augmentation -> drop empty
    masks -> boxes from masks -> meta. GT boxes are returned **normalized**.

    Returns dict with: image (uint8 [H,W,3]), image_meta [M],
    gt_class_ids [G], gt_boxes [G,4], gt_masks [G,mh,mw] uint8; or None if
    the image has no instances (reference skips these, preprocess.py:337-339).
    """
    image = dataset.load_image(idx)
    masks, class_ids = dataset.load_mask(idx)
    original_shape = image.shape

    image, window, scale, padding, crop = transforms.resize_image(
        image,
        min_dim=config.image_min_dim,
        max_dim=config.image_max_dim,
        min_scale=config.image_min_scale,
        mode=config.image_resize_mode,
    )
    masks = transforms.resize_mask(masks, scale, padding, crop)

    if augment_fn is not None:
        image, masks = augment_fn(image, masks)

    # Drop instances whose mask vanished (cropping/augment).
    keep = np.where(masks.any(axis=(0, 1)))[0]
    masks = masks[:, :, keep]
    class_ids = np.asarray(class_ids)[keep]
    if class_ids.size == 0:
        return None

    # Subsample if too many instances (reference preprocess.py:402-407).
    g = config.max_gt_instances
    if class_ids.shape[0] > g:
        sel = np.random.choice(class_ids.shape[0], g, replace=False)
        masks = masks[:, :, sel]
        class_ids = class_ids[sel]

    boxes_pix = transforms.extract_bboxes(masks).astype(np.float32)
    boxes = norm_boxes_np(boxes_pix, image.shape[:2])

    if config.use_mini_masks:
        masks_out = transforms.minimize_mask(
            boxes_pix, masks, tuple(config.mini_mask_shape)
        )
    else:
        masks_out = masks
    masks_out = np.transpose(masks_out, (2, 0, 1)).astype(np.uint8)  # [N, h, w]

    n = class_ids.shape[0]
    mh, mw = masks_out.shape[1:]
    gt_class_ids = np.zeros((g,), np.int32)
    gt_boxes = np.zeros((g, 4), np.float32)
    gt_masks = np.zeros((g, mh, mw), np.uint8)
    gt_class_ids[:n] = class_ids
    gt_boxes[:n] = boxes
    gt_masks[:n] = masks_out

    meta = compose_image_meta(
        idx,
        original_shape,
        image.shape,
        window,
        scale,
        dataset.active_class_ids(idx),
    )
    return {
        "image": image.astype(np.uint8),
        "image_meta": meta,
        "gt_class_ids": gt_class_ids,
        "gt_boxes": gt_boxes,
        "gt_masks": gt_masks,
        "window": np.asarray(window, np.float32),
        "original_shape": np.asarray(original_shape, np.int32),
    }
