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


class _Conv1x1Params(nn.Module):
    """Parameter holder matching ``nn.Conv(features, (1, 1))``'s tree exactly
    (``kernel`` [1, 1, in, out] lecun-normal, ``bias`` [out] zeros) so the two
    RPN prediction convs keep their checkpoint paths while their *application*
    is fused into one pass over the shared feature (see ``RPNHead``)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self) -> Tuple[Array, Array]:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class RPNHead(nn.Module):
    anchors_per_location: int = 3
    conv_channels: int = 512
    dtype: Any = jnp.bfloat16
    quant: str = "off"  # config.quant_mode: shared 3x3 conv only (preds are
    # folded 1x1s over the shared feature and stay bf16)

    @nn.compact
    def __call__(self, features: List[Array], mode: str = "dense"):
        """``mode='dense'`` -> ``(logits [B,A,2] f32, probs, bbox [B,A,4])``.

        ``mode='slim'`` -> ``(rank [B,A] f32, p5 [B,A,5] bf16)`` — the
        inference-only funnel form: per anchor one fused row
        ``(fg_logit - bg_logit, dy, dx, dh, dw)``. The logit *difference* is
        a strictly monotone transform of the softmax fg prob (sigmoid), and
        proposal generation only ever uses scores for ORDERING (top-k + greedy
        NMS), so ranking by the raw difference is equivalent. Interleaving
        (diff | 4 deltas) per anchor makes the [B,H,W,5k] -> [B,H*W*k,5]
        level flatten a FREE row-major reshape and lets ONE top-k gather
        fetch score + deltas together — this removes the dense [B,A,2] f32
        softmax, the dense [B,A,4] f32 delta materialization, and the
        channel-split slice copies of the dense path (~5 ms/batch at b32
        R101@1024 on v5e). Both modes create identical parameters.
        """
        d = self.dtype
        k = self.anchors_per_location
        if self.quant in ("calib", "int8"):
            # One running amax shared across pyramid levels — the head is
            # weight-shared, so its quantized twin shares the input scale
            # too (per-tensor symmetric; levels have comparable FPN ranges).
            q_amax = self.variable(
                "quant", "rpn_conv_shared_x_amax", lambda: jnp.zeros((), jnp.float32)
            )
        if self.quant == "int8":
            from maskrcnn_tf2_tpu.models.quant import Int8Conv

            _int8_shared = Int8Conv(
                self.conv_channels, (3, 3), use_bias=True, dtype=d,
                name="rpn_conv_shared",
            )

            def shared_conv(f):
                return _int8_shared(f, q_amax.value)

        else:
            _shared = nn.Conv(
                self.conv_channels, (3, 3), padding="SAME", dtype=d,
                name="rpn_conv_shared",
            )

            def shared_conv(f):
                if self.quant == "calib":
                    q_amax.value = jnp.maximum(
                        q_amax.value, jnp.max(jnp.abs(f.astype(jnp.float32)))
                    )
                return _shared(f)
        # The class and bbox heads are 1x1 convs over the SAME 512-wide shared
        # feature — applied separately, each re-reads it from HBM (~1 GB at
        # P2/b16: the two reads were ~3.4 ms/batch on v5e). Concatenating the
        # kernels along the output axis makes them ONE conv (one read), then
        # the outputs split; numerics are identical.
        kc, bc = _Conv1x1Params(2 * k, self.conv_channels, name="rpn_class_raw")()
        kb, bb = _Conv1x1Params(4 * k, self.conv_channels, name="rpn_bbox_pred")()

        if mode == "slim":
            # [C, k, 5] with last dim (fg-bg diff, 4 deltas), anchor-major.
            wc = kc[0, 0].reshape(-1, k, 2)
            wb5 = kb[0, 0].reshape(-1, k, 4)
            wdiff = (wc[..., 1] - wc[..., 0])[..., None]  # [C, k, 1]
            w = jnp.concatenate([wdiff, wb5], axis=-1).reshape(-1, 5 * k)
            bc2 = bc.reshape(k, 2)
            bias = jnp.concatenate(
                [(bc2[:, 1] - bc2[:, 0])[:, None], bb.reshape(k, 4)], axis=-1
            ).reshape(5 * k)
            w = w.astype(d)
            bias = bias.astype(d)
            rank_all, p5_all = [], []
            for f in features:
                b = f.shape[0]
                shared = nn.relu(shared_conv(f.astype(d)))
                pred = jnp.tensordot(shared, w, axes=[[3], [0]]) + bias
                p5 = pred.reshape(b, -1, 5)  # free: anchor-major rows
                rank_all.append(p5[..., 0])
                p5_all.append(p5)
            rank = jnp.concatenate(rank_all, axis=1).astype(jnp.float32)
            return rank, jnp.concatenate(p5_all, axis=1)

        w = jnp.concatenate([kc[0, 0], kb[0, 0]], axis=-1).astype(d)  # [C, 6k]
        bias = jnp.concatenate([bc, bb]).astype(d)  # [6k]

        logits_all, bbox_all = [], []
        for f in features:
            b = f.shape[0]
            shared = nn.relu(shared_conv(f.astype(d)))
            pred = jnp.tensordot(shared, w, axes=[[3], [0]]) + bias  # [B,H,W,6k]
            # [B, H, W, 2k] -> [B, H*W*k, 2]: row-major spatial, ratio fastest —
            # must line up with anchor generation ordering.
            logits = pred[..., : 2 * k].reshape(b, -1, 2)
            bbox = pred[..., 2 * k :].reshape(b, -1, 4)
            logits_all.append(logits)
            bbox_all.append(bbox)

        rpn_logits = jnp.concatenate(logits_all, axis=1).astype(jnp.float32)
        rpn_probs = nn.softmax(rpn_logits, axis=-1)
        rpn_bbox = jnp.concatenate(bbox_all, axis=1).astype(jnp.float32)
        return rpn_logits, rpn_probs, rpn_bbox
