"""Reference-EXECUTED oracles (VERDICT r3 'What's missing' #1).

Every other oracle in this suite is a numpy re-implementation ported by the
same author. These tests instead run the reference's OWN code/binaries —
TF 2.21 is importable in this image, and `/root/reference/src/layers/losses.py`
plus `common/utils.py` (with an import-time skimage stub; the functions
exercised never touch skimage) import cleanly — against our jax ops on
random data:

  * the five functional loss graphs (reference losses.py:259-423)
  * ``tf.image.non_max_suppression`` — the exact primitive behind
    ProposalLayer (mrcnn_layers.py:245-246) and DetectionLayer's per-class
    NMS (mrcnn_layers.py:440-468; our class-offset NMS is proven equal to a
    per-class loop in test_nms.py, so primitive parity closes that chain)
  * ``tf.image.crop_and_resize`` — the PyramidROIAlign / mask-target core
    (mrcnn_layers.py:617-641, :927-954)
  * ``tf.nn.top_k`` — the proposal pre-NMS top-k (mrcnn_layers.py:245-246)
  * ``apply_box_deltas_graph`` / ``clip_boxes_graph`` /
    ``box_refinement_graph`` (reference utils.py:830-869, 775-798)

This converts "trust the port" into "measured against the reference's own
binaries". Genuine semantic divergences are documented inline at the
assertion that pins them.
"""

import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

# The reference src tree: losses.py imports only tf; common/utils.py needs a
# skimage module object at import time (its graph functions never call it).
if "skimage" not in sys.modules:
    _sk = types.ModuleType("skimage")
    _sk.transform = types.ModuleType("skimage.transform")
    sys.modules["skimage"] = _sk
    sys.modules["skimage.transform"] = _sk.transform
if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

from common import utils as ref_utils  # noqa: E402
from layers import losses as ref_losses  # noqa: E402

from maskrcnn_tf2_tpu import losses as our_losses  # noqa: E402
from maskrcnn_tf2_tpu.ops import boxes as our_boxes  # noqa: E402
from maskrcnn_tf2_tpu.ops.image import (  # noqa: E402
    crop_and_resize,
    crop_and_resize_separable,
)
from maskrcnn_tf2_tpu.ops.nms import non_max_suppression  # noqa: E402


# ---------------------------------------------------------------------------
# The five loss graphs (reference losses.py:259-423)
# ---------------------------------------------------------------------------


def _rpn_batch(rng, b=3, a=96):
    match = rng.choice([-1, 0, 1], size=(b, a), p=[0.3, 0.5, 0.2]).astype(np.float32)
    logits = rng.randn(b, a, 2).astype(np.float32)
    pred = (rng.randn(b, a, 4) * 0.4).astype(np.float32)
    # dense per-anchor targets, zero off the positives (ops.targets layout)
    dense_tgt = np.zeros((b, a, 4), np.float32)
    dense_tgt[match == 1] = (rng.randn(int((match == 1).sum()), 4) * 0.3).astype(
        np.float32
    )
    return match, logits, pred, dense_tgt


def test_rpn_class_loss_vs_reference(rng):
    match, logits, _, _ = _rpn_batch(rng)
    ref = float(
        ref_losses.rpn_class_loss_graph(
            tf.constant(match[..., None]), tf.constant(logits)
        )
    )
    ours = float(our_losses.rpn_class_loss(logits, match))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_rpn_bbox_loss_vs_reference(rng):
    match, _, pred, dense_tgt = _rpn_batch(rng)
    b, a = match.shape
    # reference layout: targets packed per image in anchor order
    # (losses.py:294-328 batch_pack_graph), padded to any length >= counts
    max_pos = int((match == 1).sum(axis=1).max())
    packed = np.zeros((b, max_pos, 4), np.float32)
    for i in range(b):
        pos = np.where(match[i] == 1)[0]
        packed[i, : len(pos)] = dense_tgt[i, pos]
    ref = float(
        ref_losses.rpn_bbox_loss_graph(
            tf.constant(packed),
            tf.constant(match[..., None]),
            tf.constant(pred),
            {"images_per_gpu": b},
        )
    )
    ours = float(our_losses.rpn_bbox_loss(pred, dense_tgt, match))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_mrcnn_class_loss_vs_reference(rng):
    b, t, c = 2, 24, 7
    logits = rng.randn(b, t, c).astype(np.float32)
    target = rng.randint(0, c, size=(b, t)).astype(np.int32)
    # active-class mask with some inactive classes (multi-source datasets)
    active = (rng.rand(b, c) > 0.2).astype(np.float32)
    active[:, 0] = 1.0  # background always active
    ref = float(
        ref_losses.mrcnn_class_loss_graph(
            tf.constant(target), tf.constant(logits), tf.constant(active),
            {"batch_size": b},
        )
    )
    ours = float(our_losses.mrcnn_class_loss(logits, target, active))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_mrcnn_bbox_loss_vs_reference(rng):
    b, t, c = 2, 24, 7
    target_ids = rng.randint(0, c, size=(b, t)).astype(np.int32)
    target_ids[:, t // 2 :] = 0  # zero-padded tail (negative/padding slots)
    target_bbox = (rng.randn(b, t, 4) * 0.3).astype(np.float32)
    pred_bbox = (rng.randn(b, t, c, 4) * 0.3).astype(np.float32)
    ref = float(
        ref_losses.mrcnn_bbox_loss_graph(
            tf.constant(target_bbox), tf.constant(target_ids),
            tf.constant(pred_bbox), {"num_classes": c},
        )
    )
    ours = float(our_losses.mrcnn_bbox_loss(pred_bbox, target_bbox, target_ids))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_mrcnn_mask_loss_vs_reference(rng):
    b, t, hw, c = 2, 12, 14, 5
    target_ids = rng.randint(0, c, size=(b, t)).astype(np.int32)
    target_ids[:, t // 2 :] = 0
    target_masks = (rng.rand(b, t, hw, hw) > 0.5).astype(np.float32)
    pred_masks = rng.uniform(0.02, 0.98, size=(b, t, hw, hw, c)).astype(np.float32)
    ref = float(
        ref_losses.mrcnn_mask_loss_graph(
            tf.constant(target_masks), tf.constant(target_ids), tf.constant(pred_masks)
        )
    )
    ours = float(our_losses.mrcnn_mask_loss(pred_masks, target_masks, target_ids))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_mask_and_bbox_losses_zero_when_no_positives(rng):
    """K.switch empty-guard parity (losses.py:381-386, 416-422)."""
    b, t, c = 2, 8, 4
    target_ids = np.zeros((b, t), np.int32)
    pred_bbox = rng.randn(b, t, c, 4).astype(np.float32)
    target_bbox = rng.randn(b, t, 4).astype(np.float32)
    ref = float(
        ref_losses.mrcnn_bbox_loss_graph(
            tf.constant(target_bbox), tf.constant(target_ids),
            tf.constant(pred_bbox), {"num_classes": c},
        )
    )
    ours = float(our_losses.mrcnn_bbox_loss(pred_bbox, target_bbox, target_ids))
    assert ref == 0.0 and ours == 0.0


# ---------------------------------------------------------------------------
# tf.image.non_max_suppression — the ProposalLayer/DetectionLayer primitive
# ---------------------------------------------------------------------------


def _random_boxes(rng, n):
    y1x1 = rng.rand(n, 2) * 0.7
    hw = rng.rand(n, 2) * 0.3 + 0.02
    return np.concatenate(
        [y1x1, y1x1 + hw], axis=1
    ).astype(np.float32)[:, [0, 1, 2, 3]]


@pytest.mark.parametrize("seed,thresh", [(0, 0.7), (1, 0.5), (2, 0.3), (3, 0.9)])
def test_nms_vs_tf_image_non_max_suppression(seed, thresh):
    rng = np.random.RandomState(seed)
    n, k = 200, 40
    boxes = _random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)  # distinct w.p. 1 (tie-free)
    ref_idx = tf.image.non_max_suppression(
        tf.constant(boxes), tf.constant(scores), max_output_size=k,
        iou_threshold=thresh,
    ).numpy()
    idx, valid = non_max_suppression(boxes, scores, k, thresh)
    ours_idx = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(ours_idx, ref_idx)


def test_nms_vs_tf_with_validity_padding():
    """Padded (invalid) rows must behave exactly like absent rows —
    the fixed-shape contract the TPU funnel relies on."""
    rng = np.random.RandomState(7)
    n, real, k = 128, 77, 30
    boxes = _random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    valid = np.arange(n) < real
    ref_idx = tf.image.non_max_suppression(
        tf.constant(boxes[:real]), tf.constant(scores[:real]),
        max_output_size=k, iou_threshold=0.5,
    ).numpy()
    idx, ov = non_max_suppression(boxes, scores, k, 0.5, valid=valid)
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(ov)], ref_idx)


# ---------------------------------------------------------------------------
# tf.image.crop_and_resize — the PyramidROIAlign / mask-target core
# ---------------------------------------------------------------------------


def _crop_case(rng, k=3, h=21, w=17, c=4, r=24):
    images = rng.randn(k, h, w, c).astype(np.float32)
    y1x1 = rng.rand(r, 2) * 0.8 - 0.1  # some boxes poke out of [0, 1]
    hw = rng.rand(r, 2) * 0.6 + 0.05
    boxes = np.concatenate([y1x1, y1x1 + hw], axis=1).astype(np.float32)
    box_idx = rng.randint(0, k, size=(r,)).astype(np.int32)
    return images, boxes, box_idx


@pytest.mark.parametrize("crop", [(7, 7), (14, 14), (5, 9), (1, 1)])
def test_crop_and_resize_vs_tf(rng, crop):
    images, boxes, box_idx = _crop_case(rng)
    ref = tf.image.crop_and_resize(
        tf.constant(images), tf.constant(boxes), tf.constant(box_idx), crop
    ).numpy()
    ours = np.asarray(crop_and_resize(images, boxes, box_idx, crop))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_crop_and_resize_separable_vs_tf(rng):
    """The matmul reformulation (mask-target path, ops/image.py) equals
    tf.image.crop_and_resize on single-channel masks."""
    images, boxes, box_idx = _crop_case(rng, c=1)
    ref = tf.image.crop_and_resize(
        tf.constant(images), tf.constant(boxes), tf.constant(box_idx), (28, 28)
    ).numpy()[..., 0]
    ours = np.asarray(
        crop_and_resize_separable(images[..., 0], boxes, box_idx, (28, 28))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# tf.nn.top_k — the proposal pre-NMS top-k (mrcnn_layers.py:245-246)
# ---------------------------------------------------------------------------


def test_pre_nms_top_k_vs_tf_nn_top_k(rng):
    from maskrcnn_tf2_tpu.ops.proposal import _pre_nms_top_k

    scores = rng.rand(6000).astype(np.float32)
    k = 1000
    ref_v, ref_i = (x.numpy() for x in tf.nn.top_k(tf.constant(scores), k=k))
    our_v, our_i = (np.asarray(x) for x in _pre_nms_top_k(scores, k, False))
    np.testing.assert_allclose(our_v, ref_v, rtol=1e-6)
    np.testing.assert_array_equal(our_i, ref_i)


# ---------------------------------------------------------------------------
# Box-geometry graphs (reference utils.py:775-869)
# ---------------------------------------------------------------------------


def test_apply_box_deltas_vs_reference_graph(rng):
    boxes = _random_boxes(rng, 64)
    deltas = (rng.randn(64, 4) * 0.2).astype(np.float32)
    ref = ref_utils.apply_box_deltas_graph(
        tf.constant(boxes), tf.constant(deltas)
    ).numpy()
    ours = np.asarray(our_boxes.apply_box_deltas(boxes, deltas))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_clip_boxes_vs_reference_graph(rng):
    boxes = (rng.rand(64, 4) * 1.6 - 0.3).astype(np.float32)
    window = np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    ref = ref_utils.clip_boxes_graph(tf.constant(boxes), tf.constant(window)).numpy()
    ours = np.asarray(our_boxes.clip_boxes(boxes, window))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_encode_boxes_vs_reference_box_refinement_graph(rng):
    """GENUINE SEMANTIC DIVERGENCE (documented per VERDICT r3 next #2):
    the reference's ``box_refinement_graph`` biases the log-size encoding
    with ``eps=1e-3`` INSIDE the log (utils.py:795-796:
    ``log(gt_h / (h + 1e-3))``) while its decoder ``apply_box_deltas_graph``
    has no matching eps — an encode/decode inconsistency that systematically
    shrinks predictions for small boxes (~2% at normalized h=0.05). Ours is
    the unbiased ``log(gt_h / h)``, a self-consistent inverse of the decoder
    (pinned by test_boxes.py::test_encode_apply_inverse). This test proves
    the divergence is EXACTLY that eps term and nothing else."""
    boxes = _random_boxes(rng, 48)
    gt = _random_boxes(rng, 48)
    ref = ref_utils.box_refinement_graph(tf.constant(boxes), tf.constant(gt)).numpy()
    ours = np.asarray(our_boxes.encode_boxes(boxes, gt))
    # dy, dx: exact parity
    np.testing.assert_allclose(ours[:, :2], ref[:, :2], rtol=1e-5, atol=1e-6)
    # dh, dw: ours differs from the reference by exactly log(1 + eps/size)
    h = boxes[:, 2] - boxes[:, 0]
    w = boxes[:, 3] - boxes[:, 1]
    np.testing.assert_allclose(
        ours[:, 2], ref[:, 2] + np.log1p(1e-3 / h), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        ours[:, 3], ref[:, 3] + np.log1p(1e-3 / w), rtol=1e-4, atol=1e-5
    )


def test_norm_denorm_boxes_vs_reference(rng):
    shape = (480, 640)
    px = np.stack(
        [
            rng.rand(32) * 479, rng.rand(32) * 639,
            rng.rand(32) * 479, rng.rand(32) * 639,
        ],
        axis=1,
    ).astype(np.float32)
    ref_norm = ref_utils.norm_boxes(px, shape)
    our_norm = np.asarray(our_boxes.norm_boxes(px, shape))
    np.testing.assert_allclose(our_norm, ref_norm, rtol=1e-5, atol=1e-6)
    # denorm: the reference rounds to int pixel boxes (utils.py:708-722)
    ref_out = ref_utils.denorm_boxes(ref_norm, shape)
    our_out = np.asarray(our_boxes.denorm_boxes(our_norm.astype(np.float32), shape))
    np.testing.assert_allclose(np.round(our_out), ref_out, atol=0.5)


# ---------------------------------------------------------------------------
# EXECUTED layer graphs: detection_targets_graph + DetectionLayer.refine
# (mrcnn_layers imports with auto-attr stubs for the absent backbone
# packages — the executed functions never touch them)
# ---------------------------------------------------------------------------


def _import_mrcnn_layers():
    class _Auto:
        def __init__(self, name="auto"):
            self._n = name

        def __getattr__(self, a):
            if a.startswith("__"):
                raise AttributeError(a)
            return _Auto(f"{self._n}.{a}")

        def __call__(self, *a, **k):
            return _Auto(self._n + "()")

    def automod(name):
        m = types.ModuleType(name)
        m.__getattr__ = lambda attr: _Auto(f"{name}.{attr}")
        return m

    for name in [
        "efficientnet", "efficientnet.keras",
        "classification_models", "classification_models.models",
        "classification_models.models._common_blocks",
        "classification_models.weights",
    ]:
        sys.modules.setdefault(name, automod(name))
    sys.modules["keras_applications"] = automod("keras_applications")
    cm = sys.modules["classification_models"]
    cm.get_submodules_from_kwargs = lambda kw: (None, None, None, None)
    cb = sys.modules["classification_models.models._common_blocks"]
    cb.ChannelSE = object
    cb.GroupConv2D = object
    sys.modules["classification_models.weights"].load_model_weights = (
        lambda *a, **k: None
    )
    from layers import mrcnn_layers as m

    return m


ref_layers = _import_mrcnn_layers()


def test_overlaps_graph_vs_reference(rng):
    b1 = _random_boxes(rng, 20)
    b2 = _random_boxes(rng, 12)
    from maskrcnn_tf2_tpu.ops.boxes import overlaps as our_overlaps

    ref = ref_layers.overlaps_graph(tf.constant(b1), tf.constant(b2)).numpy()
    ours = np.asarray(our_overlaps(b1, b2))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def _targets_case(rng):
    """A subsampling-free case: #positives <= capacity and #negative
    candidates <= the exact count the reference draws, so both samplers
    keep ALL candidates and the selected SETS are deterministic."""
    size = 32
    # 3 real GTs + 1 crowd, padded to 6
    gt_boxes = np.zeros((6, 4), np.float32)
    gt_boxes[0] = [0.10, 0.10, 0.35, 0.40]
    gt_boxes[1] = [0.50, 0.50, 0.85, 0.80]
    gt_boxes[2] = [0.15, 0.60, 0.40, 0.90]
    gt_boxes[3] = [0.55, 0.05, 0.95, 0.45]  # crowd
    gt_class_ids = np.array([1, 2, 3, -1, 0, 0], np.int32)
    gt_masks = np.zeros((6, size, size), np.float32)
    for g in range(3):
        y1, x1, y2, x2 = (gt_boxes[g] * (size - 1)).astype(int)
        gt_masks[g, y1 : y2 + 1, x1 : x2 + 1] = 1.0

    props = np.zeros((20, 4), np.float32)
    # 3 positives: near-copies of the real GTs (IoU >= 0.5)
    props[0] = gt_boxes[0] + [0.02, 0.01, 0.02, 0.01]
    props[1] = gt_boxes[1] + [-0.02, 0.02, -0.02, 0.02]
    props[2] = gt_boxes[2] + [0.01, -0.02, 0.01, -0.02]
    # 6 negatives: valid, low IoU with GTs, no crowd overlap
    for i, (y, x) in enumerate([(0.02, 0.02), (0.40, 0.30), (0.75, 0.30),
                                 (0.02, 0.70), (0.45, 0.02), (0.88, 0.55)]):
        props[3 + i] = [y, x, y + 0.08, x + 0.08]
    # 3 crowd-overlapping (inside the crowd box, low IoU with real GTs):
    # vetoed from the negative pool by BOTH implementations (the (0.75,0.30)
    # 'negative' above also lands in the crowd box, so 5 negatives survive)
    props[9] = [0.60, 0.10, 0.72, 0.25]
    props[10] = [0.78, 0.28, 0.92, 0.42]
    return props, gt_class_ids, gt_boxes, gt_masks


def test_detection_targets_vs_reference_graph(rng):
    """Run the reference's detection_targets_graph (crowd veto, 1:3
    sampling, argmax assignment, delta encoding, mask crop+round) against
    ops/targets.py::detection_targets on a subsampling-free case; compare
    the selected ROI SETS (both shuffle internal order) + per-ROI classes,
    deltas, and mask targets."""
    from maskrcnn_tf2_tpu.ops.targets import detection_targets

    props, gt_ids, gt_boxes, gt_masks = _targets_case(rng)
    t, ratio, std = 12, 0.33, (0.1, 0.1, 0.2, 0.2)
    cfg = {
        "train_rois_per_image": t,
        "roi_positive_ratio": ratio,
        "bbox_std_dev": np.asarray(std, np.float32),
        "mask_shape": (28, 28),
        "use_mini_masks": False,
    }
    r_rois, r_ids, r_deltas, r_masks = (
        x.numpy()
        for x in ref_layers.detection_targets_graph(
            tf.constant(props),
            tf.constant(gt_ids.astype(np.float32)),
            tf.constant(gt_boxes),
            tf.constant(np.transpose(gt_masks, (1, 2, 0)) > 0.5),  # [H, W, G]
            cfg,
        )
    )

    import jax
    import jax.numpy as jnp

    out = detection_targets(
        jax.random.PRNGKey(3),
        jnp.asarray(props),
        jnp.asarray(gt_ids),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_masks),
        train_rois_per_image=t,
        roi_positive_ratio=ratio,
        bbox_std=std,
        mask_shape=(28, 28),
    )
    o_rois = np.asarray(out.rois)
    o_ids = np.asarray(out.class_ids)
    o_deltas = np.asarray(out.deltas)
    o_masks = np.asarray(out.masks)

    def rows(rois, ids):
        keep = np.any(np.abs(rois) > 0, axis=1)
        order = np.lexsort(rois[keep].T)
        return rois[keep][order], ids[keep][order], np.where(keep)[0][order]

    # positive + negative ROI sets are identical
    r_r, r_i, r_ix = rows(r_rois, r_ids)
    o_r, o_i, o_ix = rows(o_rois, o_ids)
    np.testing.assert_allclose(o_r, r_r, atol=1e-6)
    np.testing.assert_array_equal(o_i.astype(int), r_i.astype(int))
    assert (o_i > 0).sum() == 3 and (o_i == 0).sum() == 5

    # per-positive deltas: equal once the reference's documented eps-in-log
    # encode bias (utils.py:795-796) is accounted for
    for k in range(len(o_ix)):
        if o_i[k] <= 0:
            continue
        ours_d = o_deltas[o_ix[k]]
        refs_d = r_deltas[r_ix[k]]
        h = o_r[k][2] - o_r[k][0]
        w = o_r[k][3] - o_r[k][1]
        adj = np.array([0, 0, np.log1p(1e-3 / h) / std[2], np.log1p(1e-3 / w) / std[3]])
        np.testing.assert_allclose(ours_d, refs_d + adj, rtol=1e-4, atol=1e-4)
        # mask targets: same crop+round semantics (tolerate bilinear 0.5
        # borderline flips on box-edge samples)
        mismatch = np.mean(o_masks[o_ix[k]] != r_masks[r_ix[k]])
        assert mismatch <= 0.02, mismatch


def test_refine_detections_vs_reference_layer(rng):
    """Execute the reference DetectionLayer's per-image refine_detections
    (class pick, delta apply, window clip, confidence filter, per-class NMS,
    top-k — mrcnn_layers.py:369-501) against ops/detection.py's batched
    class-offset implementation on random data."""
    from maskrcnn_tf2_tpu.ops.detection import refine_detections

    n, c = 24, 5
    rois = _random_boxes(rng, n)
    logits = rng.randn(n, c).astype(np.float32) * 2
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    deltas = (rng.randn(n, c, 4) * 0.1).astype(np.float32)
    window = np.array([0.05, 0.05, 0.95, 0.95], np.float32)
    std = np.array([0.1, 0.1, 0.2, 0.2], np.float32)

    layer = ref_layers.DetectionLayer(
        proposals=n,
        detection_min_confidence=0.3,
        detection_max_instances=10,
        detection_nms_threshold=0.4,
        bbox_std_dev=std,
        images_per_gpu=1,
        batch_size=1,
    )
    ref = layer.refine_detections(
        tf.constant(rois), tf.constant(probs), tf.constant(deltas),
        tf.constant(window),
    ).numpy()

    ours = np.asarray(
        refine_detections(
            rois[None], probs[None], deltas[None], window[None],
            bbox_std=tuple(std), min_confidence=0.3, nms_threshold=0.4,
            max_instances=10,
        )
    )[0]
    r_keep = ref[ref[:, 5] > 0]
    o_keep = ours[ours[:, 5] > 0]
    assert len(r_keep) == len(o_keep)
    np.testing.assert_allclose(o_keep, r_keep, rtol=1e-4, atol=1e-5)
