"""Inference I/O: host preprocessing + detection unmolding.

The host twins of the device graph: ``process_input`` mirrors the
reference's ``inference_utils.process_input`` (inference_utils.py:10-42) and
``unmold_detections`` mirrors ``reformat_detections`` + ``unmold_mask``
(utils.py:872-935, 938-955) — translate padded fixed-shape device outputs
back to original-image pixel space.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.data import transforms
from maskrcnn_tf2_tpu.ops.image import compose_image_meta


def process_input(
    image: np.ndarray, config: MaskRCNNConfig, image_id: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """RGB uint8 image -> (molded_image raw 0..255, meta vector).

    Normalization happens on device inside the model; this only resizes/pads
    and builds the meta contract. The molded image keeps the INPUT dtype
    (uint8 stays uint8): the uint8->float cast is free inside the jitted
    graph, and shipping uint8 quarters the host->device transfer — the
    dominant serving cost on bandwidth-limited links (measured 1.32 s of a
    1.78 s detect() batch at R101@1024 b8 through the dev tunnel; the same
    4x applies to PCIe ingress in production).
    """
    original_shape = image.shape
    molded, window, scale, _, _ = transforms.resize_image(
        image,
        min_dim=config.image_min_dim,
        max_dim=config.image_max_dim,
        min_scale=config.image_min_scale,
        mode=config.image_resize_mode,
    )
    meta = compose_image_meta(
        image_id,
        original_shape,
        molded.shape,
        window,
        scale,
        np.ones(config.num_classes, np.float32),
    )
    return molded, meta


def unmold_detections(
    detections: np.ndarray,
    masks: np.ndarray,
    original_shape,
    image_shape,
    window,
) -> Dict[str, np.ndarray]:
    """One image's padded device outputs -> original-image-space results.

    Args:
      detections: [D, 6] (y1, x1, y2, x2, class_id, score) normalized.
      masks: [D, mh, mw, C] per-class sigmoid masks, or [D, mh, mw] masks
        already gathered to each detection's class on device (the Predictor
        path — an exact indexing op that shrinks the device->host fetch by
        the class count).
      original_shape: (H0, W0, 3) pre-resize image shape.
      image_shape: (H, W, 3) network input shape.
      window: (y1, x1, y2, x2) pixel window of real image inside padding.

    Returns dict: rois [N, 4] pixel (y1, x1, y2, x2), class_ids [N],
    scores [N], masks [H0, W0, N] bool.
    """
    zero_ix = np.where(detections[:, 4] == 0)[0]
    n = zero_ix[0] if zero_ix.shape[0] > 0 else detections.shape[0]

    boxes = detections[:n, :4].copy()
    class_ids = detections[:n, 4].astype(np.int32)
    scores = detections[:n, 5]
    if masks.ndim == 4:
        masks_specific = masks[np.arange(n), :, :, class_ids]  # [N, mh, mw]
    else:
        masks_specific = masks[:n]

    # Translate normalized coords in the padded image to original pixels.
    wy1, wx1, wy2, wx2 = _norm_window(window, image_shape)
    wh = wy2 - wy1
    ww = wx2 - wx1
    shift = np.array([wy1, wx1, wy1, wx1])
    scale_arr = np.array([wh, ww, wh, ww])
    boxes = (boxes - shift) / np.maximum(scale_arr, 1e-10)
    boxes = _denorm_boxes(boxes, original_shape[:2])

    # Drop zero-area boxes (reference utils.py:903-913).
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    keep = np.where(areas > 0)[0]
    boxes = boxes[keep]
    class_ids = class_ids[keep]
    scores = scores[keep]
    masks_specific = masks_specific[keep]

    full_masks = np.zeros(tuple(original_shape[:2]) + (len(keep),), dtype=bool)
    for i in range(len(keep)):
        full_masks[:, :, i] = transforms.unmold_mask(
            masks_specific[i], boxes[i], original_shape
        )
    return {
        "rois": boxes.astype(np.int32),
        "class_ids": class_ids,
        "scores": scores,
        "masks": full_masks,
    }


def _norm_window(window, image_shape):
    h, w = image_shape[0], image_shape[1]
    wy1, wx1, wy2, wx2 = window
    return (
        wy1 / (h - 1),
        wx1 / (w - 1),
        (wy2 - 1) / (h - 1),
        (wx2 - 1) / (w - 1),
    )


def _denorm_boxes(boxes, shape):
    h, w = shape
    scale = np.array([h - 1, w - 1, h - 1, w - 1])
    shift = np.array([0, 0, 1, 1])
    return np.around(boxes * scale + shift).astype(np.int32)
