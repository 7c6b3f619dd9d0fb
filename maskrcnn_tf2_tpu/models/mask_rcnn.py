"""Mask R-CNN: single-forward model assembly.

Replaces the reference's **four** graph copies — training graph
(model.py:416-537), inference graph (model.py:539-578), and the subclassed
twins (SMaskRCNN, model.py:239-395) — with ONE Flax module and one parameter
pytree. The ``train`` switch selects target sampling + head training outputs
vs. proposal refinement + detection outputs; the training->inference
per-layer weight transfer (inference_utils.py:173-189) therefore does not
exist in this framework.

Anchors are a host-side constant folded into the jitted graph
(``ops.anchors.get_anchors``); the per-image python loops of the reference
(``batch_slice``) are vmapped fixed-shape ops from ``maskrcnn_tf2_tpu.ops``.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.models.backbones.factory import get_backbone
from maskrcnn_tf2_tpu.models.fpn import FPN
from maskrcnn_tf2_tpu.models.heads import FPNClassifierHead, FPNMaskHead
from maskrcnn_tf2_tpu.models.rpn import RPNHead
from maskrcnn_tf2_tpu.ops.anchors import get_anchors
from maskrcnn_tf2_tpu.ops.detection import refine_detections
from maskrcnn_tf2_tpu.ops.image import parse_image_meta
from maskrcnn_tf2_tpu.ops.proposal import generate_proposals
from maskrcnn_tf2_tpu.ops.roi_align import pyramid_roi_align
from maskrcnn_tf2_tpu.ops.targets import detection_targets

Array = jnp.ndarray


def _dtype_of(config: MaskRCNNConfig):
    return jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32


def _rpn_slim_enabled() -> bool:
    """Trace-time gate for the slim RPN inference funnel (models/rpn.py).

    Default: on TPU only, so every CPU oracle test exercises the dense path
    bit-unchanged (same pattern as ops.proposal approx_topk and the Pallas
    kernel gates). Env override MASKRCNN_TPU_RPN=slim|dense forces either
    (tests force ``slim`` on CPU to pin slim-vs-dense equivalence)."""
    import os

    from maskrcnn_tf2_tpu.utils.platform import on_tpu

    env = os.environ.get("MASKRCNN_TPU_RPN", "").lower()
    if env == "slim":
        return True
    if env == "dense":
        return False
    return on_tpu()


class MaskRCNN(nn.Module):
    """The flagship detector. ``__call__(images, image_meta, gt..., train)``.

    RNG streams: ``'sampling'`` is required when ``train=True`` (detection
    target subsampling); params/batch_stats are ordinary Flax collections.
    """

    config: MaskRCNNConfig

    def setup(self):
        cfg = self.config
        d = _dtype_of(cfg)
        # Sync-BN (config.sync_bn): batch statistics psum'd over the DP mesh
        # axis inside every BatchNorm — requires running under shard_map on
        # the "data" axis (the default train loop). Per-shard BN at 1
        # img/shard is statistically broken; this is the multi-chip answer
        # to the reference's single-GPU train_bn (config.py:152-156).
        bn_axis = cfg.mesh_data_axis if cfg.sync_bn else None
        self.backbone = get_backbone(
            cfg.backbone,
            dtype=d,
            leaky_relu=cfg.resnet_leaky_relu,
            bn_axis=bn_axis,
            quant=cfg.quant_mode,
        )
        self.fpn = FPN(
            out_channels=cfg.top_down_pyramid_size, dtype=d, quant=cfg.quant_mode
        )
        self.rpn = RPNHead(
            anchors_per_location=cfg.anchors_per_location,
            conv_channels=512,
            dtype=d,
            quant=cfg.quant_mode,
        )
        self.classifier = FPNClassifierHead(
            num_classes=cfg.num_classes,
            pool_size=cfg.pool_size,
            fc_size=cfg.fpn_cls_fc_layers_size,
            leaky_relu=cfg.cls_head_leaky_relu,
            dtype=d,
            bn_axis=bn_axis,
            quant=cfg.quant_mode if cfg.quant_classifier else "off",
        )
        self.mask_head = FPNMaskHead(
            num_classes=cfg.num_classes,
            conv_channels=cfg.mask_conv_channels,
            leaky_relu=cfg.mask_head_leaky_relu,
            dtype=d,
            bn_axis=bn_axis,
            quant=cfg.quant_mode if cfg.quant_mask_head else "off",
        )

    # ------------------------------------------------------------------
    def backbone_fpn_rpn(self, images: Array, train: bool):
        cfg = self.config
        train_bn_backbone = train and cfg.train_bn and cfg.train_bn_backbone
        train_bn = train and cfg.train_bn
        # Fused on-device normalization (host pipeline ships raw 0..255;
        # replaces the reference's albumentations Normalize on CPU).
        from maskrcnn_tf2_tpu.ops.image import maxmin_normalize_image, normalize_image

        if cfg.normalization == "maxmin":
            images = maxmin_normalize_image(images)
        else:
            images = normalize_image(images, cfg.pixel_mean, cfg.pixel_std)
        endpoints = self.backbone(images, train_bn=train_bn_backbone)
        if cfg.frozen_backbone:
            endpoints = jax.tree.map(jax.lax.stop_gradient, endpoints)
        rpn_feats, mrcnn_feats = self.fpn(endpoints)
        rpn_logits, rpn_probs, rpn_bbox = self.rpn(rpn_feats)
        if cfg.frozen_rpn_model:
            rpn_logits, rpn_probs, rpn_bbox = jax.tree.map(
                jax.lax.stop_gradient, (rpn_logits, rpn_probs, rpn_bbox)
            )
        return rpn_feats, mrcnn_feats, rpn_logits, rpn_probs, rpn_bbox, train_bn

    def _proposals(self, rpn_probs, rpn_bbox, train: bool):
        cfg = self.config
        anchors = jnp.asarray(get_anchors(cfg))
        return generate_proposals(
            rpn_probs,
            rpn_bbox,
            anchors,
            rpn_bbox_std=cfg.rpn_bbox_std_dev,
            pre_nms_limit=cfg.pre_nms_limit,
            proposal_count=cfg.post_nms_rois(train),
            nms_threshold=cfg.rpn_nms_threshold,
            approx_topk=cfg.proposal_approx_topk,
        )

    # ------------------------------------------------------------------
    def __call__(
        self,
        images: Array,
        image_meta: Array,
        gt_class_ids: Optional[Array] = None,
        gt_boxes: Optional[Array] = None,
        gt_masks: Optional[Array] = None,
        input_rois: Optional[Array] = None,
        train: bool = False,
    ) -> Dict[str, Array]:
        cfg = self.config
        (
            rpn_feats, mrcnn_feats, rpn_logits, rpn_probs, rpn_bbox, train_bn
        ) = self.backbone_fpn_rpn(images, train)

        out: Dict[str, Array] = {
            "rpn_logits": rpn_logits,
            "rpn_probs": rpn_probs,
            "rpn_bbox": rpn_bbox,
        }

        if train:
            assert gt_class_ids is not None and gt_boxes is not None and gt_masks is not None
            if cfg.use_rpn_rois:
                proposals, _ = self._proposals(rpn_probs, rpn_bbox, train=True)
            else:
                # Train heads on externally supplied ROIs (model.py:488-497).
                assert input_rois is not None
                proposals = input_rois
            if cfg.tune_rpn_model_only:
                # Heads are not trained; skip sampling + head compute entirely
                # (reference keeps only RPN losses, model.py:86-124).
                return out

            b = images.shape[0]
            rngs = jax.random.split(self.make_rng("sampling"), b)
            targets = jax.vmap(
                lambda r, p, ci, bx, mk: detection_targets(
                    r,
                    p,
                    ci,
                    bx,
                    mk,
                    train_rois_per_image=cfg.train_rois_per_image,
                    roi_positive_ratio=cfg.roi_positive_ratio,
                    bbox_std=cfg.bbox_std_dev,
                    mask_shape=cfg.mask_shape,
                    use_mini_masks=cfg.use_mini_masks,
                )
            )(rngs, proposals, gt_class_ids, gt_boxes, gt_masks)

            pooled = pyramid_roi_align(
                mrcnn_feats, targets.rois, cfg.pool_size, cfg.image_shape,
                training=True,
            )
            logits, probs, deltas = self.classifier(pooled, train_bn=train_bn)
            # EXACT slimming (see config.mask_train_slim): the loss consumes
            # only positive slots' GT-class channel, so (a) the final 1x1
            # conv computes just that column (always exact — no BN follows
            # it), and (b) when the head BNs run on moving averages (the
            # reference COCO CLI's own default, coco.py:555 store_true) the
            # head runs only on the leading int(T * positive_ratio) slots —
            # detection_targets packs positives first. (b) must stay off
            # under train_bn: batch statistics are computed across the ROI
            # axis, so dropping slots would change them.
            mask_rois = targets.rois
            mask_class_ids = None
            if cfg.mask_train_slim:
                mask_class_ids = targets.class_ids
                if not train_bn:
                    k = max(int(cfg.train_rois_per_image * cfg.roi_positive_ratio), 1)
                    mask_rois = targets.rois[:, :k]
                    mask_class_ids = targets.class_ids[:, :k]
            mask_pooled = pyramid_roi_align(
                mrcnn_feats, mask_rois, cfg.mask_pool_size, cfg.image_shape,
                training=True,
            )
            masks = self.mask_head(
                mask_pooled, train_bn=train_bn, class_ids=mask_class_ids
            )
            if cfg.frozen_cls_head:
                logits, probs, deltas = jax.tree.map(
                    jax.lax.stop_gradient, (logits, probs, deltas)
                )
            if cfg.frozen_mask_head:
                masks = jax.lax.stop_gradient(masks)

            out.update(
                {
                    "rois": targets.rois,
                    "target_class_ids": targets.class_ids,
                    "target_deltas": targets.deltas,
                    "target_masks": targets.masks,
                    "target_positive_mask": targets.positive_mask,
                    "target_valid_mask": targets.valid_mask,
                    "mrcnn_class_logits": logits,
                    "mrcnn_probs": probs,
                    "mrcnn_deltas": deltas,
                    "mrcnn_masks": masks,
                }
            )
            return out

        # ---------------- inference ----------------
        if cfg.rpn_slim_inference and _rpn_slim_enabled():
            # Slim funnel: one fused (rank, deltas) row per anchor — see
            # models/rpn.py mode='slim'. The dense rpn_logits/probs/bbox in
            # `out` stay available; XLA dead-code-eliminates them when the
            # caller only fetches detections/masks (Predictor, export, bench).
            rank, p5 = self.rpn(rpn_feats, mode="slim")
            from maskrcnn_tf2_tpu.ops.proposal import generate_proposals_slim

            proposals, prop_valid = generate_proposals_slim(
                rank,
                p5,
                jnp.asarray(get_anchors(cfg)),
                rpn_bbox_std=cfg.rpn_bbox_std_dev,
                pre_nms_limit=cfg.pre_nms_limit,
                proposal_count=cfg.post_nms_rois(False),
                nms_threshold=cfg.rpn_nms_threshold,
                approx_topk=cfg.proposal_approx_topk,
            )
        else:
            proposals, prop_valid = self._proposals(rpn_probs, rpn_bbox, train=False)
        # deferred-unsort ROIAlign: the classifier is per-ROI (order
        # invariant), so on the TPU grouped-kernel path the head runs on the
        # kernel's segment-sorted padded layout and only the small per-ROI
        # outputs are unsorted (saves the [B*N, P, P, C] feature gather)
        from maskrcnn_tf2_tpu.ops.roi_align import pyramid_roi_align_deferred

        pooled, unsort = pyramid_roi_align_deferred(
            mrcnn_feats, proposals, cfg.pool_size, cfg.image_shape
        )
        logits, probs, deltas = self.classifier(pooled, train_bn=False)
        if unsort is not None:
            probs = jnp.take_along_axis(probs, unsort[:, :, None], axis=1)
            deltas = jnp.take_along_axis(
                deltas, unsort[:, :, None, None], axis=1
            )

        meta = parse_image_meta(image_meta)
        from maskrcnn_tf2_tpu.ops.image import norm_window

        windows = norm_window(meta["window"], cfg.image_shape)
        detections = refine_detections(
            proposals,
            probs,
            deltas,
            windows,
            bbox_std=cfg.bbox_std_dev,
            min_confidence=cfg.detection_min_confidence,
            nms_threshold=cfg.detection_nms_threshold,
            max_instances=cfg.detection_max_instances,
        )

        det_boxes = detections[..., :4]  # DetectedBoxesExtraction (:535-550)
        mask_pooled = pyramid_roi_align(
            mrcnn_feats, det_boxes, cfg.mask_pool_size, cfg.image_shape
        )
        masks = self.mask_head(mask_pooled, train_bn=False)

        out.update(
            {
                "rpn_rois": proposals,
                "rpn_rois_valid": prop_valid,
                "mrcnn_probs": probs,
                "mrcnn_deltas": deltas,
                "detections": detections,
                "mrcnn_masks": masks,
            }
        )
        return out
