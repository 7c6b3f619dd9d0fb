"""COCO dataset adapter — self-contained (no pycocotools dependency).

Re-implements the capabilities of the reference ``CocoDataset``
(samples/coco/coco.py:118-442): instances-JSON loading, class registry with
contiguous internal ids, polygon + RLE segmentation -> binary masks, and the
crowd -> negative-class-id convention. The RLE codec implements the public
COCO mask-RLE spec (column-major runs; compressed counts are base-48 varints)
in numpy.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

from maskrcnn_tf2_tpu.data.dataset import SegmentationDataset


# ---------------------------------------------------------------------------
# COCO RLE codec (public spec)
# ---------------------------------------------------------------------------

def _decode_rle_counts(s: str) -> List[int]:
    """Decode COCO compressed RLE counts string -> run lengths."""
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            i += 1
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def rle_to_mask(rle: Dict, h: int, w: int) -> np.ndarray:
    """RLE dict ({'counts': str|list, 'size': [h, w]}) -> bool mask [h, w].

    Uses the native C codec (native/rle.py — the framework's equivalent of
    the reference's pycocotools-C dependency) when buildable; the numpy path
    below is the always-available fallback and the test oracle."""
    counts = rle["counts"]
    from maskrcnn_tf2_tpu.native import rle as _native_rle

    native = _native_rle.get()
    if native is not None:
        buf = native.decode_mask(counts, h, w)
        return (
            np.frombuffer(buf, np.uint8).reshape(w, h).T.astype(bool)
        )
    if isinstance(counts, str):
        counts = _decode_rle_counts(counts)
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    vals = np.zeros(total, dtype=np.uint8)
    # runs alternate 0-runs and 1-runs, column-major
    ends = np.cumsum(counts)
    starts = ends - counts
    for j in range(1, len(counts), 2):
        vals[starts[j] : ends[j]] = 1
    if total < h * w:
        vals = np.pad(vals, (0, h * w - total))
    return vals[: h * w].reshape(w, h).T.astype(bool)


def mask_to_rle(mask: np.ndarray) -> Dict:
    """bool mask [h, w] -> uncompressed RLE dict (for eval/export)."""
    h, w = mask.shape
    flat = np.asfortranarray(mask).reshape(-1, order="F").astype(np.uint8)
    # run-length encode starting with a 0-run
    change = np.nonzero(np.diff(flat))[0] + 1
    idx = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(idx)
    if flat[0] == 1:
        runs = np.concatenate([[0], runs])
    return {"counts": runs.tolist(), "size": [h, w]}


def annotation_to_mask(ann: Dict, h: int, w: int) -> np.ndarray:
    """COCO segmentation (polygons or RLE) -> bool mask [h, w]."""
    seg = ann["segmentation"]
    if isinstance(seg, list):  # polygon(s)
        canvas = np.zeros((h, w), np.uint8)
        for poly in seg:
            pts = np.asarray(poly, np.float64).reshape(-1, 2)
            cv2.fillPoly(canvas, [np.round(pts).astype(np.int32)], 1)
        return canvas.astype(bool)
    if isinstance(seg, dict):
        return rle_to_mask(seg, h, w)
    raise ValueError(f"unsupported segmentation type: {type(seg)}")


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------

class CocoDataset(SegmentationDataset):
    """COCO instances dataset. ``load_coco`` mirrors the reference's loader
    (coco.py:218-270): optional class filter, optional image cap."""

    def load_coco(
        self,
        dataset_dir: str,
        subset: str,
        year: str = "2017",
        class_ids: Optional[Sequence[int]] = None,
        class_names: Optional[Sequence[str]] = None,
        max_images: Optional[int] = None,
        annotations_path: Optional[str] = None,
        images_dir: Optional[str] = None,
    ):
        ann_path = annotations_path or os.path.join(
            dataset_dir, "annotations", f"instances_{subset}{year}.json"
        )
        img_dir = images_dir or os.path.join(dataset_dir, f"{subset}{year}")
        with open(ann_path) as f:
            coco = json.load(f)

        cats = {c["id"]: c for c in coco["categories"]}
        if class_names:
            name_to_id = {c["name"]: c["id"] for c in coco["categories"]}
            class_ids = [name_to_id[n] for n in class_names]
        if class_ids:
            use_cats = [cid for cid in sorted(cats) if cid in set(class_ids)]
        else:
            use_cats = sorted(cats)
        for cid in use_cats:
            self.add_class("coco", cid, cats[cid]["name"])

        anns_by_image = defaultdict(list)
        for ann in coco["annotations"]:
            if ann["category_id"] in set(use_cats):
                anns_by_image[ann["image_id"]].append(ann)

        images = coco["images"]
        if class_ids:
            images = [im for im in images if anns_by_image.get(im["id"])]
        if max_images:
            images = images[:max_images]
        for im in images:
            self.add_image(
                "coco",
                image_id=im["id"],
                path=os.path.join(img_dir, im["file_name"]),
                width=im["width"],
                height=im["height"],
                annotations=anns_by_image.get(im["id"], []),
            )

    def load_mask(self, idx: int):
        info = self._image_info[idx]
        h, w = info["height"], info["width"]
        masks, class_ids = [], []
        for ann in info["annotations"]:
            key = f"coco.{ann['category_id']}"
            cls = self.class_from_source.get(key)
            if cls is None:
                continue
            m = annotation_to_mask(ann, h, w)
            if not m.any():
                continue
            if ann.get("iscrowd", 0):
                cls = -cls  # crowd convention (reference coco.py:402-417)
            masks.append(m)
            class_ids.append(cls)
        if not masks:
            return np.zeros((h, w, 0), bool), np.zeros((0,), np.int32)
        return np.stack(masks, axis=-1), np.asarray(class_ids, np.int32)


COCO_URLS = {
    # (images_zip, annotations_zip) per subset/year — the reference's
    # auto_download sources (samples/coco/coco.py:271-341)
    ("train", "2017"): (
        "http://images.cocodataset.org/zips/train2017.zip",
        "http://images.cocodataset.org/annotations/annotations_trainval2017.zip",
    ),
    ("val", "2017"): (
        "http://images.cocodataset.org/zips/val2017.zip",
        "http://images.cocodataset.org/annotations/annotations_trainval2017.zip",
    ),
}


def auto_download(dataset_dir: str, subset: str, year: str = "2017"):
    """Download + unzip COCO images/annotations if absent (reference
    coco.py:271-341). Requires network egress."""
    import urllib.request
    import zipfile

    os.makedirs(dataset_dir, exist_ok=True)
    img_dir = os.path.join(dataset_dir, f"{subset}{year}")
    ann_file = os.path.join(
        dataset_dir, "annotations", f"instances_{subset}{year}.json"
    )
    urls = COCO_URLS.get((subset, year))
    if urls is None:
        raise ValueError(f"no download source for {subset}{year}")
    for target, url in [(img_dir, urls[0]), (ann_file, urls[1])]:
        if os.path.exists(target):
            continue
        zip_path = os.path.join(dataset_dir, os.path.basename(url))
        print(f"downloading {url} ...")
        try:
            urllib.request.urlretrieve(url, zip_path)
        except OSError as e:
            raise RuntimeError(
                f"COCO auto-download failed ({e}); this environment may have "
                "no network egress — stage the dataset manually"
            ) from e
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(dataset_dir)
        os.remove(zip_path)


# 80 COCO thing classes + background — mirrors COCO_CONFIG's class dict
# (samples/coco/coco.py:30-115).
COCO_CLASS_NAMES = [
    "background", "person", "bicycle", "car", "motorcycle", "airplane", "bus",
    "train", "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]
