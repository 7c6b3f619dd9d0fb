"""Balloon toy dataset — VIA-JSON adapter preset.

Mirror of the reference's ``BalloonDataset`` (samples/balloon/balloon.py:9-50,
duplicated at samples/guns/balloon.py): a single-class VIA dataset with
``CLASS_DICT = {'background': 0, 'balloon': 1}``. Any VIA-annotated dataset
works the same way via ``VIADataset.load_via`` with its own class dict.
"""

from __future__ import annotations

from maskrcnn_tf2_tpu.config import DEFAULT_CLASS_DICT
from maskrcnn_tf2_tpu.data.dataset import VIADataset


class BalloonDataset(VIADataset):
    def load_balloon(self, dataset_dir: str, subset: str = "train",
                     annotations_json: str = "via_region_data.json"):
        import os

        self.load_via(
            os.path.join(dataset_dir, subset),
            annotations_json,
            DEFAULT_CLASS_DICT,
            source="balloon",
        )
