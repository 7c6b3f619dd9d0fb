"""COCO-format export round-trip: SyntheticShapesDataset -> on-disk COCO
layout -> CocoDataset. Proves the CocoDataset adapter against a real
instances JSON + JPEG directory (reference coco.py:218-270 semantics)
without network egress."""

import numpy as np

from maskrcnn_tf2_tpu.data.coco import CocoDataset
from maskrcnn_tf2_tpu.data.synthetic import SyntheticShapesDataset
from maskrcnn_tf2_tpu.data.synthetic_coco import export_coco_format


def _export(tmp_path, n=5):
    src = SyntheticShapesDataset()
    src.load_shapes(n, 64, 64, seed=7)
    src.prepare()
    export_coco_format(src, str(tmp_path), subset="train")
    dst = CocoDataset()
    dst.load_coco(str(tmp_path), "train")
    dst.prepare()
    return src, dst


def test_roundtrip_masks_exact(tmp_path):
    src, dst = _export(tmp_path)
    assert len(dst) == len(src)
    assert dst.class_names == src.class_names
    for i in range(len(src)):
        m_src, ids_src = src.load_mask(i)
        m_dst, ids_dst = dst.load_mask(i)
        # RLE is lossless; same annotation order as the source instances
        np.testing.assert_array_equal(ids_dst, ids_src)
        np.testing.assert_array_equal(m_dst, m_src)


def test_roundtrip_images_close(tmp_path):
    src, dst = _export(tmp_path, n=2)
    a = src.load_image(0).astype(np.float32)
    b = dst.load_image(0).astype(np.float32)
    assert a.shape == b.shape
    # JPEG q95 on flat-color shapes: small error
    assert np.abs(a - b).mean() < 8.0


def test_crowd_round_trips_to_negative_id(tmp_path):
    class CrowdShapes(SyntheticShapesDataset):
        def load_mask(self, idx):
            masks, ids = super().load_mask(idx)
            if ids.size:
                ids = ids.copy()
                ids[0] = -ids[0]  # mark first instance as crowd
            return masks, ids

    src = CrowdShapes()
    src.load_shapes(2, 64, 64, seed=3)
    src.prepare()
    export_coco_format(src, str(tmp_path), subset="val")
    dst = CocoDataset()
    dst.load_coco(str(tmp_path), "val")
    dst.prepare()
    _, ids_src = src.load_mask(0)
    _, ids_dst = dst.load_mask(0)
    np.testing.assert_array_equal(ids_dst, ids_src)
    assert (ids_dst < 0).any()
