"""RPNHead: the fused single-pass prediction conv must be numerically
identical to applying the two reference 1x1 convs (rpn_graph,
mrcnn_layers.py:1052-1093) separately with the same parameters."""

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tf2_tpu.models.rpn import RPNHead


def test_fused_pred_conv_matches_separate_convs():
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32)),
        jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32)),
    ]
    head = RPNHead(anchors_per_location=3, conv_channels=32, dtype=jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), feats)
    logits, probs, bbox = head.apply(variables, feats)

    p = variables["params"]
    kc = np.asarray(p["rpn_class_raw"]["kernel"])  # [1,1,C,2k]
    bc = np.asarray(p["rpn_class_raw"]["bias"])
    kb = np.asarray(p["rpn_bbox_pred"]["kernel"])
    bb = np.asarray(p["rpn_bbox_pred"]["bias"])
    ks = np.asarray(p["rpn_conv_shared"]["kernel"])  # [3,3,C,C']
    bs = np.asarray(p["rpn_conv_shared"]["bias"])

    logits_ref, bbox_ref = [], []
    for f in feats:
        shared = jax.lax.conv_general_dilated(
            f, jnp.asarray(ks), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bs
        shared = jnp.maximum(shared, 0.0)
        lg = jnp.tensordot(shared, jnp.asarray(kc[0, 0]), axes=[[3], [0]]) + bc
        bx = jnp.tensordot(shared, jnp.asarray(kb[0, 0]), axes=[[3], [0]]) + bb
        logits_ref.append(lg.reshape(2, -1, 2))
        bbox_ref.append(bx.reshape(2, -1, 4))
    logits_ref = jnp.concatenate(logits_ref, axis=1)
    bbox_ref = jnp.concatenate(bbox_ref, axis=1)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bbox), np.asarray(bbox_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(probs), np.asarray(jax.nn.softmax(logits_ref, axis=-1)),
        rtol=1e-5, atol=1e-5,
    )
    # param tree unchanged: both pred convs keep their nn.Conv-style leaves
    assert kc.shape == (1, 1, 32, 6) and kb.shape == (1, 1, 32, 12)


def test_fc_on_pooled_matches_flatten_dense():
    """_FCOnPooled (dot_general over (P,P,C), no big-tensor flatten) must be
    param-compatible with nn.Dense on the flattened input and numerically
    identical in f32."""
    import flax.linen as nn

    from maskrcnn_tf2_tpu.models.heads import _FCOnPooled

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 5, 7, 7, 12).astype(np.float32))
    mod = _FCOnPooled(32, dtype=jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    assert v["params"]["kernel"].shape == (7 * 7 * 12, 32)
    out = mod.apply(v, x)

    dense = nn.Dense(32, dtype=jnp.float32)
    ref = dense.apply(v, x.reshape(2 * 5, -1)).reshape(2, 5, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
