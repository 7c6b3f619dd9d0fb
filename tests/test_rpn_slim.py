"""Slim RPN inference funnel (models/rpn.py mode='slim') vs the dense path.

The slim form must be order-equivalent (rank = fg-bg logit diff is a
monotone transform of softmax fg prob) and value-equivalent on deltas, so a
full inference pass with MASKRCNN_TPU_RPN=slim must reproduce the dense
path's detections. Runs on CPU (conftest) in float32 so the comparison is
tight; on TPU the slim path is the default (config.rpn_slim_inference).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.models import MaskRCNN
from maskrcnn_tf2_tpu.models.rpn import RPNHead
from maskrcnn_tf2_tpu.ops.image import compose_image_meta


def test_rpn_head_slim_matches_dense():
    head = RPNHead(anchors_per_location=3, conv_channels=64, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32)),
        jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32)),
    ]
    variables = head.init(jax.random.PRNGKey(0), feats)
    logits, probs, bbox = head.apply(variables, feats)
    rank, p5 = head.apply(variables, feats, mode="slim")

    # rank == fg - bg logit (same params, different contraction order -> tol)
    np.testing.assert_allclose(
        np.asarray(rank),
        np.asarray(logits[..., 1] - logits[..., 0]),
        rtol=1e-5, atol=1e-5,
    )
    # delta columns are the SAME dot products, just packed per anchor
    np.testing.assert_allclose(
        np.asarray(p5[..., 1:5]), np.asarray(bbox), rtol=1e-5, atol=1e-5
    )
    # rank ordering == softmax fg prob ordering (monotone)
    r = np.asarray(rank).reshape(-1)
    p = np.asarray(probs[..., 1]).reshape(-1)
    assert (np.argsort(-r) == np.argsort(-p)).mean() > 0.999


@pytest.mark.parametrize("size", [128])
def test_full_inference_slim_matches_dense(monkeypatch, size):
    cfg = MaskRCNNConfig(
        image_shape=(size, size, 3),
        num_classes=4,
        backbone="resnet18",
        compute_dtype="float32",
        image_min_dim=size,
        image_max_dim=size,
        pre_nms_limit=512,
        post_nms_rois_inference=64,
        detection_max_instances=16,
    )
    model = MaskRCNN(cfg)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(2, size, size, 3).astype(np.float32) * 255)
    meta = jnp.tile(
        jnp.asarray(
            compose_image_meta(
                0, (size, size, 3), (size, size, 3), (0, 0, size, size), 1.0,
                np.ones(cfg.num_classes),
            )
        ),
        (2, 1),
    )
    variables = jax.jit(
        lambda r: model.init({"params": r}, images, meta, train=False)
    )(jax.random.PRNGKey(0))

    def run():
        out = jax.jit(
            lambda im, me: model.apply(variables, im, me, train=False)
        )(images, meta)
        return np.asarray(out["detections"]), np.asarray(out["mrcnn_masks"])

    monkeypatch.setenv("MASKRCNN_TPU_RPN", "dense")
    det_dense, masks_dense = run()
    monkeypatch.setenv("MASKRCNN_TPU_RPN", "slim")
    det_slim, masks_slim = run()

    np.testing.assert_allclose(det_slim, det_dense, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(masks_slim, masks_dense, rtol=1e-4, atol=1e-4)
