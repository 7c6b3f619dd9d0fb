"""Region Proposal Network head.

Re-design of the reference RPN (``RPNLayer`` mrcnn_layers.py:147-199,
``rpn_graph`` :1052-1093, ``build_rpn_model`` :1096-1121): a single
weight-shared head applied to every pyramid level (the sharing that the
reference achieves with a nested Keras submodel falls out of calling one Flax
module in a loop), producing per-anchor (logits, probs, deltas) concatenated
over levels along the anchor axis — ordering matches
``ops.anchors.generate_pyramid_anchors`` (row-major per level, ratios
fastest).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class RPNHead(nn.Module):
    anchors_per_location: int = 3
    conv_channels: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[Array]) -> Tuple[Array, Array, Array]:
        d = self.dtype
        shared_conv = nn.Conv(
            self.conv_channels, (3, 3), padding="SAME", dtype=d, name="rpn_conv_shared"
        )
        logits_conv = nn.Conv(
            2 * self.anchors_per_location, (1, 1), dtype=d, name="rpn_class_raw"
        )
        bbox_conv = nn.Conv(
            4 * self.anchors_per_location, (1, 1), dtype=d, name="rpn_bbox_pred"
        )

        logits_all, bbox_all = [], []
        for f in features:
            b = f.shape[0]
            shared = nn.relu(shared_conv(f.astype(d)))
            # [B, H, W, 2k] -> [B, H*W*k, 2]: row-major spatial, ratio fastest —
            # must line up with anchor generation ordering.
            logits = logits_conv(shared).reshape(b, -1, 2)
            bbox = bbox_conv(shared).reshape(b, -1, 4)
            logits_all.append(logits)
            bbox_all.append(bbox)

        rpn_logits = jnp.concatenate(logits_all, axis=1).astype(jnp.float32)
        rpn_probs = nn.softmax(rpn_logits, axis=-1)
        rpn_bbox = jnp.concatenate(bbox_all, axis=1).astype(jnp.float32)
        return rpn_logits, rpn_probs, rpn_bbox
