"""The five Mask R-CNN losses + L2 regularization, as pure functions.

Re-implements the semantics of ``src/layers/losses.py`` (each loss there
exists twice — Keras class + functional twin, losses.py:5-256 / 259-423;
here exactly once). All losses are computed in float32 regardless of the
compute dtype; empty-selection guards use masked means instead of the
reference's ``K.switch(size > 0, ...)``.

The dense-target layout difference vs the reference: RPN bbox targets arrive
as per-anchor ``[B, A, 4]`` (matching ``ops.targets.rpn_targets``) rather
than the reference's compact per-image ``[256, 4]`` packing
(``batch_pack_graph``, losses.py:40-96) — the positive-anchor smooth-L1 mean
is identical.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray
_EPS = 1e-7


def smooth_l1(diff: Array) -> Array:
    """Elementwise smooth-L1 (reference losses.py:60-66)."""
    diff = jnp.abs(diff)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def _masked_mean(values: Array, mask: Array) -> Array:
    """Mean of ``values`` where ``mask``; 0 if mask is empty (K.switch guard)."""
    mask = mask.astype(jnp.float32)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def rpn_class_loss(rpn_logits: Array, rpn_match: Array) -> Array:
    """Objectness CE over non-neutral anchors (reference losses.py:5-37).

    rpn_logits: [B, A, 2]; rpn_match: [B, A] in {-1, 0, 1}.
    """
    anchor_class = (rpn_match == 1).astype(jnp.float32)
    logp = jax.nn.log_softmax(rpn_logits.astype(jnp.float32), axis=-1)
    # arithmetic select over the 2 classes — a take_along_axis here lowers to
    # ~500k scalar gathers on TPU (profiled at ~7 ms/step)
    ce = -(anchor_class * logp[..., 1] + (1.0 - anchor_class) * logp[..., 0])
    return _masked_mean(ce, rpn_match != 0)


def rpn_bbox_loss(rpn_deltas_pred: Array, target_deltas: Array, rpn_match: Array) -> Array:
    """Smooth-L1 over positive anchors (reference losses.py:40-96).

    rpn_deltas_pred/target_deltas: [B, A, 4]; rpn_match: [B, A].
    """
    loss = jnp.sum(
        smooth_l1(rpn_deltas_pred.astype(jnp.float32) - target_deltas.astype(jnp.float32)),
        axis=-1,
    ) / 4.0
    return _masked_mean(loss, rpn_match == 1)


def mrcnn_class_loss(
    logits: Array, target_class_ids: Array, active_class_ids: Array
) -> Array:
    """Sparse CE masked by the dataset's active classes
    (reference losses.py:99-136): predictions whose argmax class is inactive
    in the image's source dataset are erased from the loss; mean over active
    predictions with an epsilon guard.

    logits: [B, T, C]; target_class_ids: [B, T]; active_class_ids: [B, C].
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target_class_ids[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]  # [B, T]
    pred_class = jnp.argmax(logits, axis=-1)  # [B, T]
    pred_active = jnp.take_along_axis(
        active_class_ids.astype(jnp.float32), pred_class, axis=1
    )  # [B, T]
    return jnp.sum(ce * pred_active) / (jnp.sum(pred_active) + _EPS)


def mrcnn_bbox_loss(
    deltas_pred: Array, target_deltas: Array, target_class_ids: Array
) -> Array:
    """Smooth-L1 at the GT class channel for positive ROIs
    (reference losses.py:139-187).

    deltas_pred: [B, T, C, 4]; target_deltas: [B, T, 4]; target_class_ids: [B, T].
    """
    cls = target_class_ids.astype(jnp.int32)
    # one-hot contraction instead of take_along_axis: per-ROI class-channel
    # gathers lower to scalar gathers on TPU (profiled hot); the matmul is
    # exact (0/1 weights) and rides the MXU.
    onehot = jax.nn.one_hot(cls, deltas_pred.shape[2], dtype=jnp.float32)
    picked = jnp.einsum(
        "btcf,btc->btf", deltas_pred.astype(jnp.float32), onehot,
        precision="highest",
    )  # [B, T, 4]
    loss = jnp.mean(smooth_l1(picked - target_deltas.astype(jnp.float32)), axis=-1)
    return _masked_mean(loss, cls > 0)


def mrcnn_mask_loss(masks_pred: Array, target_masks: Array, target_class_ids: Array) -> Array:
    """Binary CE on the GT-class mask channel for positive ROIs
    (reference losses.py:190-235).

    masks_pred: [B, K, H, W, C] sigmoid probs, or [B, K, H, W] when the head
    already gathered the GT-class channel (config.mask_train_slim).
    target_masks: [B, T, H, W] with T >= K. K may be the positive-slot
    capacity only — exact because the sampler packs positives into the
    leading slots and non-positive slots are zero-weighted here anyway.
    """
    k = masks_pred.shape[1]
    cls = target_class_ids[:, :k].astype(jnp.int32)
    target_masks = target_masks[:, :k]
    if masks_pred.ndim == 4:
        picked = masks_pred.astype(jnp.float32)
    else:
        # one-hot contraction over the class axis (see mrcnn_bbox_loss): the
        # [B, T, H, W] channel gather was ~21 ms/step on v5e; the einsum is
        # exact.
        onehot = jax.nn.one_hot(cls, masks_pred.shape[-1], dtype=jnp.float32)
        picked = jnp.einsum(
            "bthwc,btc->bthw", masks_pred.astype(jnp.float32), onehot,
            precision="highest",
        )  # [B, K, H, W]
    picked = jnp.clip(picked, _EPS, 1.0 - _EPS)
    target = target_masks.astype(jnp.float32)
    bce = -(target * jnp.log(picked) + (1.0 - target) * jnp.log(1.0 - picked))
    bce = jnp.mean(bce, axis=(-1, -2))  # [B, K]
    return _masked_mean(bce, cls > 0)


def l2_reg_loss(
    params,
    weight_decay: float,
    include_batchnorm: bool = False,
    skip_prefixes: Tuple[str, ...] = (),
    bn_module_paths=None,
) -> Array:
    """Size-normalized L2 over kernels (reference L2RegLoss, losses.py:238-256):
    ``weight_decay * mean(square(w))`` summed over weight tensors, skipping
    BatchNorm scale/bias unless ``include_batchnorm``, all biases, and any
    top-level module in ``skip_prefixes`` (frozen submodels are not
    regularized — Keras only regularizes trainable weights).

    ``bn_module_paths``: the exact set of BatchNorm module paths, derived
    from the ``batch_stats`` collection (see ``batchnorm_module_paths``) —
    a module is a BatchNorm iff it owns running mean/var, which is precise
    where name matching ("bn" in the path) would silently unregularize any
    module whose name merely contains "bn". Callers without batch_stats may
    pass None to fall back to name matching.
    """
    total = jnp.float32(0.0)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        if keys and keys[0] in skip_prefixes:
            continue
        if bn_module_paths is not None:
            is_bn = keys[:-1] in bn_module_paths
        else:
            is_bn = any(("bn" in k.lower()) or k == "BatchNorm" for k in keys)
        if not include_batchnorm and is_bn:
            continue
        if keys and keys[-1] in ("bias",):
            continue
        total = total + jnp.mean(jnp.square(leaf.astype(jnp.float32)))
    return weight_decay * total


def batchnorm_module_paths(batch_stats) -> frozenset:
    """Module paths owning BatchNorm running stats — the precise BN set for
    ``l2_reg_loss`` (a path appears in batch_stats iff the module is a
    ``nn.BatchNorm``)."""
    return frozenset(
        tuple(str(getattr(p, "key", p)) for p in path[:-1])
        for path, _ in jax.tree_util.tree_leaves_with_path(batch_stats)
    )


def compute_losses(
    outputs: Dict[str, Array],
    rpn_match: Array,
    rpn_target_deltas: Array,
    active_class_ids: Array,
    config,
) -> Tuple[Array, Dict[str, Array]]:
    """Weighted total of the 5 losses with the reference's mode switches
    (model.py:86-124): ``use_rpn_rois=False`` drops RPN losses;
    ``tune_rpn_model_only`` keeps only RPN losses.
    """
    w = config.loss_weights
    losses: Dict[str, Array] = {}
    if config.use_rpn_rois or config.tune_rpn_model_only:
        losses["rpn_class_loss"] = w[0] * rpn_class_loss(outputs["rpn_logits"], rpn_match)
        losses["rpn_bbox_loss"] = w[1] * rpn_bbox_loss(
            outputs["rpn_bbox"], rpn_target_deltas, rpn_match
        )
    if not config.tune_rpn_model_only:
        losses["mrcnn_class_loss"] = w[2] * mrcnn_class_loss(
            outputs["mrcnn_class_logits"], outputs["target_class_ids"], active_class_ids
        )
        losses["mrcnn_bbox_loss"] = w[3] * mrcnn_bbox_loss(
            outputs["mrcnn_deltas"], outputs["target_deltas"], outputs["target_class_ids"]
        )
        losses["mrcnn_mask_loss"] = w[4] * mrcnn_mask_loss(
            outputs["mrcnn_masks"], outputs["target_masks"], outputs["target_class_ids"]
        )
    total = sum(losses.values())
    losses["loss_sum"] = total
    return total, losses
