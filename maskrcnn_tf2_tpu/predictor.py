"""High-level inference API: the ``model.detect()`` of this framework.

The reference's inference flow is notebook glue (process_input -> inference
graph -> reformat_detections, SURVEY §3.2); here it is a first-class
batched, jit-cached predictor.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.export.inference import process_input, unmold_detections
from maskrcnn_tf2_tpu.models import MaskRCNN
from maskrcnn_tf2_tpu.ops.image import parse_image_meta


class Predictor:
    """Batched fixed-shape inference with host unmolding."""

    def __init__(self, config: MaskRCNNConfig, variables):
        from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache

        enable_cache()
        self.config = config
        self.model = MaskRCNN(config)
        self.variables = variables

        @jax.jit
        def _infer(variables, images, meta):
            out = self.model.apply(variables, images, meta, train=False)
            return out["detections"], out["mrcnn_masks"]

        self._infer = _infer

    def detect(self, images: List[np.ndarray]) -> List[Dict[str, np.ndarray]]:
        """Run detection on a list of RGB uint8 images of any sizes."""
        molded, metas, originals = [], [], []
        for i, img in enumerate(images):
            m, meta = process_input(img, self.config, image_id=i)
            molded.append(m)
            metas.append(meta)
            originals.append(img.shape)
        batch_images = jnp.asarray(np.stack(molded))
        batch_meta = jnp.asarray(np.stack(metas))
        detections, masks = self._infer(self.variables, batch_images, batch_meta)
        detections = np.asarray(detections)
        masks = np.asarray(masks)

        results = []
        for i in range(len(images)):
            meta = metas[i]
            window = meta[7:11]
            results.append(
                unmold_detections(
                    detections[i],
                    masks[i],
                    originals[i],
                    self.config.image_shape,
                    window,
                )
            )
        return results
