"""Synthetic shapes dataset — self-contained training/eval data.

Draws random circles/squares/triangles on noise backgrounds; classes are
shape types. Serves the role of the reference's balloon toy dataset for
tests and demos without any download, and exercises exactly the same
dataset contract (load_image / load_mask with per-instance masks).
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np

from maskrcnn_tf2_tpu.data.dataset import SegmentationDataset

SHAPE_CLASSES = {"background": 0, "circle": 1, "square": 2, "triangle": 3}


class SyntheticShapesDataset(SegmentationDataset):
    def load_shapes(
        self,
        count: int,
        height: int = 128,
        width: int = 128,
        max_shapes: int = 4,
        seed: int = 0,
    ):
        for name, cid in SHAPE_CLASSES.items():
            if cid:
                self.add_class("shapes", cid, name)
        rng = np.random.RandomState(seed)
        for i in range(count):
            n = rng.randint(1, max_shapes + 1)
            shapes = []
            for _ in range(n):
                kind = rng.randint(1, 4)
                size = rng.randint(height // 8, height // 4)
                cy = rng.randint(size, height - size)
                cx = rng.randint(size, width - size)
                color = tuple(int(c) for c in rng.randint(60, 255, 3))
                shapes.append((kind, cy, cx, size, color))
            self.add_image(
                "shapes",
                image_id=i,
                path=None,
                height=height,
                width=width,
                shapes=shapes,
                bg_seed=int(rng.randint(0, 2**31 - 1)),
            )

    def _draw(self, canvas, kind, cy, cx, size, color):
        if kind == 1:
            cv2.circle(canvas, (cx, cy), size, color, -1)
        elif kind == 2:
            cv2.rectangle(canvas, (cx - size, cy - size), (cx + size, cy + size), color, -1)
        else:
            pts = np.array(
                [[cx, cy - size], [cx - size, cy + size], [cx + size, cy + size]],
                np.int32,
            )
            cv2.fillPoly(canvas, [pts], color)
        return canvas

    def load_image(self, idx: int) -> np.ndarray:
        info = self._image_info[idx]
        rng = np.random.RandomState(info["bg_seed"])
        img = rng.randint(0, 50, (info["height"], info["width"], 3)).astype(np.uint8)
        for kind, cy, cx, size, color in info["shapes"]:
            img = self._draw(img, kind, cy, cx, size, color)
        return img

    def load_mask(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        info = self._image_info[idx]
        h, w = info["height"], info["width"]
        n = len(info["shapes"])
        masks = np.zeros((h, w, n), bool)
        class_ids = np.zeros((n,), np.int32)
        occupied = np.zeros((h, w), bool)
        # draw in reverse so later shapes occlude earlier ones, like rendering
        for i in reversed(range(n)):
            kind, cy, cx, size, _ = info["shapes"][i]
            canvas = np.zeros((h, w), np.uint8)
            self._draw(canvas, kind, cy, cx, size, 1)
            m = canvas.astype(bool) & ~occupied
            occupied |= m
            masks[:, :, i] = m
            class_ids[i] = kind
        keep = masks.any(axis=(0, 1))
        return masks[:, :, keep], class_ids[keep]
