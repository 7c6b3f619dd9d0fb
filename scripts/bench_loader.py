"""Input-pipeline throughput measurement (SURVEY §2.10 / VERDICT item 7).

Synthesizes a JPEG-on-disk dataset (the real-data decode cost the threaded
loader must absorb on this box's ONE cpu core), then measures:

  1. cold loader img/s — cv2 JPEG decode + resize + mini-mask per image
     (the reference's per-worker cost, preprocess.py:192-266);
  2. cached loader img/s — the pre-decoded npz sample cache
     (config.sample_cache_dir) after a warming pass;

and prints one JSON line. Run:  python scripts/bench_loader.py [n_images]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.data.dataset import SegmentationDataset
from maskrcnn_tf2_tpu.data.loader import DataLoader


class JpegBlobDataset(SegmentationDataset):
    """Random photographic-entropy JPEGs with 2-8 blob instances each."""

    def load_jpegs(self, root: str, count: int, h: int = 480, w: int = 640):
        self.add_class("blobs", 1, "blob")
        rng = np.random.RandomState(0)
        for i in range(count):
            img = (rng.rand(h, w, 3) * 55 + rng.rand(1, 1, 3) * 180).astype(np.uint8)
            # low-frequency content so JPEG size is realistic (~100-200 KB)
            img = cv2.GaussianBlur(img, (0, 0), 3)
            blobs = []
            for _ in range(rng.randint(2, 9)):
                cy, cx = rng.randint(40, h - 40), rng.randint(40, w - 40)
                r = rng.randint(15, 60)
                cv2.circle(img, (cx, cy), r, tuple(int(c) for c in rng.randint(0, 255, 3)), -1)
                blobs.append((cy, cx, r))
            path = os.path.join(root, f"{i}.jpg")
            cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
            self.add_image("blobs", image_id=i, path=path, height=h, width=w, blobs=blobs)

    def load_mask(self, idx: int):
        info = self._image_info[idx]
        h, w = info["height"], info["width"]
        blobs = info["blobs"]
        masks = np.zeros((h, w, len(blobs)), bool)
        for j, (cy, cx, r) in enumerate(blobs):
            m = np.zeros((h, w), np.uint8)
            cv2.circle(m, (cx, cy), r, 1, -1)
            masks[:, :, j] = m.astype(bool)
        return masks, np.ones(len(blobs), np.int32)


def measure(loader: DataLoader, passes: int = 1) -> float:
    n = 0
    t0 = time.perf_counter()
    for _ in range(passes):
        for batch in loader.epoch():
            n += batch["images"].shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def main():
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    root = tempfile.mkdtemp(prefix="loader_bench_")
    try:
        ds = JpegBlobDataset()
        ds.load_jpegs(root, count)
        ds.prepare()
        base = dict(
            image_shape=(512, 512, 3),
            image_min_dim=512,
            image_max_dim=512,
            batch_size=8,
            num_classes=2,
            max_gt_instances=16,
        )
        cold_cfg = MaskRCNNConfig(**base)
        cold = measure(DataLoader(ds, cold_cfg, shuffle=False))

        cache_dir = os.path.join(root, "cache")
        cached_cfg = MaskRCNNConfig(**base, sample_cache_dir=cache_dir)
        warm_loader = DataLoader(ds, cached_cfg, shuffle=False)
        for _ in warm_loader.epoch():  # warming pass writes the cache
            pass
        cached = measure(DataLoader(ds, cached_cfg, shuffle=False), passes=2)

        print(
            json.dumps(
                {
                    "metric": "loader_throughput_512px",
                    "jpeg_decode_img_per_s": round(cold, 2),
                    "cached_npz_img_per_s": round(cached, 2),
                    "unit": "img/s/host",
                    "n_images": count,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
