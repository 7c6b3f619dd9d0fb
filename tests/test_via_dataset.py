"""VIA-JSON dataset adapter (balloon-style) on a generated fixture."""

import json
import os

import cv2
import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.data.balloon import BalloonDataset
from maskrcnn_tf2_tpu.data.dataset import load_image_gt


def make_via_fixture(root):
    sub = os.path.join(root, "train")
    os.makedirs(sub, exist_ok=True)
    ann = {}
    for i in range(3):
        img = np.random.randint(0, 255, (96, 120, 3), np.uint8)
        name = f"img{i}.jpg"
        cv2.imwrite(os.path.join(sub, name), img)
        # triangle + quad polygons (VIA dict-style regions)
        ann[f"{name}12345"] = {
            "filename": name,
            "regions": {
                "0": {
                    "shape_attributes": {
                        "name": "polygon",
                        "all_points_x": [10, 50, 30],
                        "all_points_y": [10, 15, 60],
                    },
                    "region_attributes": {},
                },
                "1": {
                    "shape_attributes": {
                        "name": "polygon",
                        "all_points_x": [70, 110, 110, 70],
                        "all_points_y": [20, 20, 70, 70],
                    },
                    "region_attributes": {"class": "balloon"},
                },
            },
        }
    with open(os.path.join(sub, "via_region_data.json"), "w") as f:
        json.dump(ann, f)
    return root


def test_via_balloon_dataset(tmp_path):
    root = make_via_fixture(str(tmp_path))
    ds = BalloonDataset()
    ds.load_balloon(root, "train")
    ds.prepare()
    assert len(ds) == 3
    assert ds.num_classes == 2  # background + balloon

    masks, class_ids = ds.load_mask(0)
    assert masks.shape[:2] == (96, 120)
    assert masks.shape[2] == 2
    assert (class_ids == 1).all()
    # quad region covers its bbox area
    assert masks[30, 90, 1]
    assert not masks[30, 90, 0]

    cfg = MaskRCNNConfig(
        image_shape=(128, 128, 3),
        image_min_dim=64,
        image_max_dim=128,
        rpn_anchor_scales=(8, 16, 32, 64, 128),
        max_gt_instances=4,
    )
    sample = load_image_gt(ds, cfg, 0)
    assert sample["image"].shape == (128, 128, 3)
    assert (sample["gt_class_ids"] > 0).sum() == 2
