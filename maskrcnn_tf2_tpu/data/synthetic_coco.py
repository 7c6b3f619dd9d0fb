"""Export any SegmentationDataset to an on-disk COCO-format dataset.

Produces exactly the layout the reference's COCO pipeline consumes
(samples/coco/coco.py:218-270): ``{root}/{subset}{year}/*.jpg`` images plus
``{root}/annotations/instances_{subset}{year}.json`` with per-instance
RLE segmentations. Zero-egress substitute for real COCO: lets the full
CocoDataset -> DataLoader -> train -> CocoEvalLite chain run end-to-end
(the masks round-trip exactly through the RLE codec; only the JPEG pixels
are lossy).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import cv2
import numpy as np

from maskrcnn_tf2_tpu.data.coco import mask_to_rle
from maskrcnn_tf2_tpu.data.dataset import SegmentationDataset


def export_coco_format(
    dataset: SegmentationDataset,
    root: str,
    subset: str = "train",
    year: str = "2017",
    jpeg_quality: int = 95,
    max_images: Optional[int] = None,
) -> str:
    """Render ``dataset`` to ``root`` in COCO instances layout.

    Returns the annotations JSON path. Class ids are the dataset's internal
    contiguous ids (background 0 excluded), so a model trained directly on
    ``dataset`` and one trained on the exported copy share class numbering.
    """
    img_dir = os.path.join(root, f"{subset}{year}")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    categories = [
        {"id": int(cid), "name": name, "supercategory": "shape"}
        for cid, name in enumerate(dataset.class_names)
        if cid != 0
    ]

    images, annotations = [], []
    ann_id = 1
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    for idx in range(n):
        img = dataset.load_image(idx)
        h, w = img.shape[:2]
        file_name = f"{subset}_{idx:06d}.jpg"
        cv2.imwrite(
            os.path.join(img_dir, file_name),
            cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality],
        )
        image_id = idx + 1  # COCO ids are 1-based
        images.append(
            {"id": image_id, "file_name": file_name, "width": w, "height": h}
        )
        masks, class_ids = dataset.load_mask(idx)
        for i in range(masks.shape[-1]):
            m = masks[..., i].astype(bool)
            ys, xs = np.nonzero(m)
            if ys.size == 0:
                continue
            y1, x1 = int(ys.min()), int(xs.min())
            y2, x2 = int(ys.max()) + 1, int(xs.max()) + 1
            cid = int(class_ids[i])
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": image_id,
                    "category_id": abs(cid),
                    "segmentation": mask_to_rle(m),
                    "area": int(m.sum()),
                    "bbox": [x1, y1, x2 - x1, y2 - y1],  # COCO xywh
                    "iscrowd": 1 if cid < 0 else 0,
                }
            )
            ann_id += 1

    ann_path = os.path.join(ann_dir, f"instances_{subset}{year}.json")
    with open(ann_path, "w") as f:
        json.dump(
            {
                "info": {"description": "synthetic COCO-format export"},
                "images": images,
                "annotations": annotations,
                "categories": categories,
            },
            f,
        )
    return ann_path
