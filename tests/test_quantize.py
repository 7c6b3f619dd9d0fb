"""Int8 post-training quantization (config.quant_mode, export/quantize.py).

The TPU-native analog of the reference's TRT deployment notch
(inference_optimize.py); numerics are pinned on CPU against a numpy
quantize-dequantize oracle, plus end-to-end calibrate -> int8 forward.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.models.backbones.resnet import ResNet, RESNET_VARIANTS
from maskrcnn_tf2_tpu.models.quant import Int8Conv as _Int8Conv

def _dq(v):
    """Dequantize an (s8, scale) endpoint tuple (resnet.py _qc_on s8 C
    edges) to f32; pass arrays through."""
    if isinstance(v, tuple):
        xq, s = v
        return np.asarray(xq, np.float32) * np.asarray(s)
    return np.asarray(v)


CFG = MaskRCNNConfig(
    image_shape=(96, 96, 3),
    image_min_dim=96,
    image_max_dim=96,
    rpn_anchor_scales=(8, 16, 32, 64, 96),
    pre_nms_limit=256,
    post_nms_rois_training=64,
    post_nms_rois_inference=64,
    train_rois_per_image=32,
    max_gt_instances=6,
    num_classes=4,
    detection_max_instances=10,
    detection_min_confidence=0.0,
    backbone="resnet18",
    top_down_pyramid_size=64,
    fpn_cls_fc_layers_size=128,
    mask_conv_channels=64,
    compute_dtype="float32",
    batch_size=1,
)


def test_int8_conv_matches_oracle():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 8, 8, 16).astype(np.float32) * 3.0
    m = _Int8Conv(features=24, kernel=(3, 3), dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.float32(1.0))
    w = np.asarray(variables["params"]["kernel"])
    amax = np.abs(x).max()

    got = np.asarray(m.apply(variables, jnp.asarray(x), jnp.float32(amax)))

    # numpy oracle: symmetric per-tensor x / per-out-channel w quantization
    sx = max(amax, 1e-6) / 127.0
    xq = np.clip(np.round(x / sx), -127, 127).astype(np.int8)
    sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
    wq = np.round(w / sw).astype(np.int8)
    xp = np.pad(xq.astype(np.int32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((2, 8, 8, 24), np.int32)
    for dy in range(3):
        for dx in range(3):
            ref += np.einsum(
                "bhwc,cf->bhwf",
                xp[:, dy : dy + 8, dx : dx + 8, :],
                wq[dy, dx].astype(np.int32),
                dtype=np.int64,
            ).astype(np.int32)
    want = ref.astype(np.float32) * (sx * sw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_conv_bias_and_groups():
    """The FPN/RPN path uses bias=True; ResNeXt uses grouped convs."""
    rs = np.random.RandomState(3)
    x = rs.randn(1, 6, 6, 8).astype(np.float32)
    m = _Int8Conv(features=8, kernel=(1, 1), groups=4, use_bias=True,
                  dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.float32(1.0))
    w = np.asarray(variables["params"]["kernel"])  # [1,1,2,8]
    bias = rs.randn(8).astype(np.float32)
    variables = {"params": {"kernel": w, "bias": bias}}
    amax = np.abs(x).max()
    got = np.asarray(m.apply(variables, jnp.asarray(x), jnp.float32(amax)))

    sx = max(amax, 1e-6) / 127.0
    xq = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
    sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
    wq = np.round(w / sw).astype(np.int32)
    ref = np.zeros((1, 6, 6, 8), np.int32)
    for g in range(4):  # feature_group_count=4: out group g reads in group g
        ref[..., 2 * g : 2 * g + 2] = np.einsum(
            "bhwc,cf->bhwf",
            xq[..., 2 * g : 2 * g + 2],
            wq[0, 0, :, 2 * g : 2 * g + 2],
        )
    want = ref.astype(np.float32) * (sx * sw) + bias
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_backbone_calib_then_int8_close_to_float():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 64, 64, 3).astype(np.float32))
    kw = RESNET_VARIANTS["resnet18"]

    net = ResNet(dtype=jnp.float32, **kw)
    variables = net.init(jax.random.PRNGKey(0), x, train_bn=False)
    ref = net.apply(variables, x, train_bn=False)

    calib_net = ResNet(dtype=jnp.float32, quant="calib", **kw)
    out, mut = calib_net.apply(variables, x, train_bn=False, mutable=["quant"])
    # calib-mode forward math is unchanged
    np.testing.assert_allclose(
        np.asarray(out["C5"]), np.asarray(ref["C5"]), rtol=1e-6
    )
    quant = mut["quant"]
    leaves = jax.tree_util.tree_leaves(quant)
    assert len(leaves) > 10 and all(float(v) > 0 for v in leaves)

    int8_net = ResNet(dtype=jnp.float32, quant="int8", **kw)
    q = int8_net.apply({**variables, "quant": quant}, x, train_bn=False)
    for k in ("C2", "C5"):
        # bare-backbone int8 callers may get the (s8, scale) edge form
        b = _dq(q[k])
        a = np.asarray(ref[k])
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
        assert rel < 0.15, (k, rel)
        assert np.isfinite(b).all()


def test_quantize_for_inference_end_to_end():
    from maskrcnn_tf2_tpu.export.quantize import quantize_for_inference
    from maskrcnn_tf2_tpu.models import MaskRCNN

    rs = np.random.RandomState(2)
    model = MaskRCNN(CFG)
    images = jnp.asarray(rs.rand(1, 96, 96, 3).astype(np.float32) * 255.0)
    meta = jnp.zeros((1, CFG.meta_size), jnp.float32)
    meta = meta.at[0, 4:7].set(jnp.asarray([96.0, 96.0, 3.0]))
    meta = meta.at[0, 7:11].set(jnp.asarray([0.0, 0.0, 96.0, 96.0]))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images,
        meta,
        train=False,
    )
    variables = {k: v for k, v in variables.items()}

    qcfg, qvars = quantize_for_inference(CFG, variables, [(images, meta)])
    assert qcfg.quant_mode == "int8"
    # backbone block convs + 8 FPN convs + the RPN shared conv all calibrated
    assert "backbone" in qvars["quant"] and "fpn" in qvars["quant"]
    assert "rpn_conv_shared_x_amax" in qvars["quant"]["rpn"]
    assert len(qvars["quant"]["fpn"]) == 8
    qmodel = MaskRCNN(qcfg)
    out = qmodel.apply(qvars, images, meta, train=False)
    assert np.isfinite(np.asarray(out["detections"])).all()
    assert out["detections"].shape == (1, CFG.detection_max_instances, 6)


def test_int8_dense_matches_oracle():
    from maskrcnn_tf2_tpu.models.quant import Int8Dense

    rs = np.random.RandomState(5)
    x = rs.randn(7, 48).astype(np.float32) * 2.0
    m = Int8Dense(features=32, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.float32(1.0))
    w = np.asarray(variables["params"]["kernel"])
    bias = rs.randn(32).astype(np.float32)
    variables = {"params": {"kernel": w, "bias": bias}}
    amax = np.abs(x).max()
    got = np.asarray(m.apply(variables, jnp.asarray(x), jnp.float32(amax)))

    sx = max(amax, 1e-6) / 127.0
    xq = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
    sw = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    wq = np.round(w / sw).astype(np.int32)
    want = (xq @ wq).astype(np.float32) * (sx * sw) + bias
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_fc_on_pooled_matches_flat_dense():
    """Int8FCOnPooled contracting (P, P, C) directly == Int8Dense on the
    flattened rows (same kernel layout, so checkpoints interchange)."""
    from maskrcnn_tf2_tpu.models.quant import Int8Dense, Int8FCOnPooled

    rs = np.random.RandomState(6)
    x = rs.randn(2, 3, 5, 5, 8).astype(np.float32)
    m = Int8FCOnPooled(features=16, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.float32(1.0))
    amax = np.float32(np.abs(x).max())
    got = np.asarray(m.apply(variables, jnp.asarray(x), jnp.float32(amax)))

    flat = Int8Dense(features=16, dtype=jnp.float32)
    want = np.asarray(
        flat.apply(variables, jnp.asarray(x.reshape(2 * 3, -1)), jnp.float32(amax))
    )
    np.testing.assert_allclose(got.reshape(6, 16), want, rtol=1e-5, atol=1e-5)


def test_quant_classifier_end_to_end():
    """quant_classifier=True: calib records both FC amaxes, int8 forward is
    finite and param-compatible (same variables dict)."""
    import dataclasses as _dc

    from maskrcnn_tf2_tpu.export.quantize import quantize_for_inference
    from maskrcnn_tf2_tpu.models import MaskRCNN

    cfg = _dc.replace(CFG, quant_classifier=True)
    rs = np.random.RandomState(7)
    model = MaskRCNN(cfg)
    images = jnp.asarray(rs.rand(1, 96, 96, 3).astype(np.float32) * 255.0)
    meta = jnp.zeros((1, cfg.meta_size), jnp.float32)
    meta = meta.at[0, 4:7].set(jnp.asarray([96.0, 96.0, 3.0]))
    meta = meta.at[0, 7:11].set(jnp.asarray([0.0, 0.0, 96.0, 96.0]))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images,
        meta,
        train=False,
    )
    qcfg, qvars = quantize_for_inference(cfg, dict(variables), [(images, meta)])
    clf = qvars["quant"]["classifier"]
    assert float(clf["mrcnn_class_conv1_x_amax"]) > 0
    assert float(clf["mrcnn_class_conv2_x_amax"]) > 0
    out = MaskRCNN(qcfg).apply(qvars, images, meta, train=False)
    assert np.isfinite(np.asarray(out["detections"])).all()


def test_train_step_rejects_quant():
    from maskrcnn_tf2_tpu.train.train_step import make_train_step

    with pytest.raises(ValueError, match="inference-only"):
        make_train_step(dataclasses.replace(CFG, quant_mode="int8"))


def test_int8_conv_depthwise_matches_oracle():
    """Depthwise conv (feature_group_count == channels — the MobileNet/
    EfficientNet dw site): kernel [kh, kw, 1, C], per-out-channel scales."""
    rs = np.random.RandomState(8)
    c = 8
    x = rs.randn(1, 6, 6, c).astype(np.float32) * 2.0
    m = _Int8Conv(features=c, kernel=(3, 3), groups=c, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.float32(1.0))
    w = np.asarray(variables["params"]["kernel"])  # [3,3,1,c]
    assert w.shape == (3, 3, 1, c)
    amax = np.abs(x).max()
    got = np.asarray(m.apply(variables, jnp.asarray(x), jnp.float32(amax)))

    sx = max(amax, 1e-6) / 127.0
    xq = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
    sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
    wq = np.round(w / sw).astype(np.int32)
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((1, 6, 6, c), np.int32)
    for dy in range(3):
        for dx in range(3):
            ref += xp[:, dy : dy + 6, dx : dx + 6, :] * wq[dy, dx, 0][None, None, None, :]
    want = ref.astype(np.float32) * (sx * sw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("backbone", ["mobilenetv2", "efficientnetb0"])
def test_nonresnet_backbone_calib_then_int8_close_to_float(backbone):
    """VERDICT r3 next #3: int8 PTQ for the depthwise/MBConv families (the
    reference ships TRT engines for EVERY backbone, README.md:460-503)."""
    from maskrcnn_tf2_tpu.models.backbones.factory import get_backbone

    rs = np.random.RandomState(9)
    x = jnp.asarray(rs.randn(1, 64, 64, 3).astype(np.float32))

    net = get_backbone(backbone, dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train_bn=False)
    ref = net.apply(variables, x, train_bn=False)

    calib_net = get_backbone(backbone, dtype=jnp.float32, quant="calib")
    out, mut = calib_net.apply(variables, x, train_bn=False, mutable=["quant"])
    # calib-mode forward math is unchanged
    np.testing.assert_allclose(
        np.asarray(out["C5"]), np.asarray(ref["C5"]), rtol=1e-6
    )
    quant = mut["quant"]
    leaves = jax.tree_util.tree_leaves(quant)
    assert len(leaves) > 10 and all(float(v) > 0 for v in leaves)

    int8_net = get_backbone(backbone, dtype=jnp.float32, quant="int8")
    q = int8_net.apply({**variables, "quant": quant}, x, train_bn=False)
    for k in ("C2", "C5"):
        a, b = np.asarray(ref[k]), np.asarray(q[k])
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
        assert rel < 0.15, (k, rel)
        assert np.isfinite(b).all()


def test_mobilenet_quantize_for_inference_end_to_end():
    """Full-detector calibrate -> int8 forward on a non-ResNet backbone."""
    from maskrcnn_tf2_tpu.export.quantize import quantize_for_inference
    from maskrcnn_tf2_tpu.models import MaskRCNN

    cfg = dataclasses.replace(CFG, backbone="mobilenetv2")
    rs = np.random.RandomState(10)
    model = MaskRCNN(cfg)
    images = jnp.asarray(rs.rand(1, 96, 96, 3).astype(np.float32) * 255.0)
    meta = jnp.zeros((1, cfg.meta_size), jnp.float32)
    meta = meta.at[0, 4:7].set(jnp.asarray([96.0, 96.0, 3.0]))
    meta = meta.at[0, 7:11].set(jnp.asarray([0.0, 0.0, 96.0, 96.0]))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images,
        meta,
        train=False,
    )
    qcfg, qvars = quantize_for_inference(cfg, dict(variables), [(images, meta)])
    assert "backbone" in qvars["quant"]
    qmodel = MaskRCNN(qcfg)
    out = qmodel.apply(qvars, images, meta, train=False)
    assert np.isfinite(np.asarray(out["detections"])).all()
    assert out["detections"].shape == (1, CFG.detection_max_instances, 6)


def test_quantized_residual_stream_ab(monkeypatch):
    """The producer-side s8 residual stream (MASKRCNN_TPU_INT8_QRES,
    VERDICT r3 next #4): intra-stage edges carry (s8, scale). Both A/B
    settings must produce close-to-float outputs from ONE calibration
    artifact, and the qres path must actually emit block out_amax scales."""
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(1, 64, 64, 3).astype(np.float32))
    kw = RESNET_VARIANTS["resnet50"]

    net = ResNet(dtype=jnp.float32, **kw)
    variables = net.init(jax.random.PRNGKey(0), x, train_bn=False)
    ref = np.asarray(net.apply(variables, x, train_bn=False)["C5"])

    calib_net = ResNet(dtype=jnp.float32, quant="calib", **kw)
    _, mut = calib_net.apply(variables, x, train_bn=False, mutable=["quant"])
    quant = mut["quant"]
    # calib records block-output scales regardless of the A/B setting
    assert float(quant["stage3_block2"]["out_amax"]) > 0

    int8_net = ResNet(dtype=jnp.float32, quant="int8", **kw)
    outs = {}
    for setting in ("1", "0"):
        monkeypatch.setenv("MASKRCNN_TPU_INT8_QRES", setting)
        q = _dq(
            int8_net.apply({**variables, "quant": quant}, x, train_bn=False)["C5"]
        )
        rel = np.linalg.norm(ref - q) / (np.linalg.norm(ref) + 1e-9)
        assert rel < 0.15 and np.isfinite(q).all(), (setting, rel)
        outs[setting] = q
    # the two paths are different graphs (s8 vs bf16 edges) but agree closely
    rel_ab = np.linalg.norm(outs["1"] - outs["0"]) / (np.linalg.norm(outs["0"]) + 1e-9)
    assert rel_ab < 0.08, rel_ab

    # A calibration artifact from BEFORE the qres path (no out_amax entries)
    # must still apply in int8 mode with qres default-on: blocks without a
    # recorded scale silently keep the bf16 edge (ADVICE r4) — bitwise the
    # QRES=0 graph — instead of dying in flax with a missing-variable error.
    def strip_out_amax(node):
        if isinstance(node, dict) or hasattr(node, "items"):
            return {
                k: strip_out_amax(v) for k, v in node.items() if k != "out_amax"
            }
        return node

    monkeypatch.setenv("MASKRCNN_TPU_INT8_QRES", "1")
    legacy = np.asarray(
        int8_net.apply(
            {**variables, "quant": strip_out_amax(quant)}, x, train_bn=False
        )["C5"]
    )
    np.testing.assert_array_equal(legacy, outs["0"])

    # s8 C endpoints (MASKRCNN_TPU_INT8_QC): default-on under qres the C5
    # edge is an (s8, scale) tuple; QC=0 restores the bf16 endpoint while
    # keeping the intra-stage s8 stream
    monkeypatch.setenv("MASKRCNN_TPU_INT8_QC", "0")
    c5_noqc = int8_net.apply({**variables, "quant": quant}, x, train_bn=False)["C5"]
    assert not isinstance(c5_noqc, tuple)
    monkeypatch.delenv("MASKRCNN_TPU_INT8_QC")
    c5_qc = int8_net.apply({**variables, "quant": quant}, x, train_bn=False)["C5"]
    assert isinstance(c5_qc, tuple) and c5_qc[0].dtype == jnp.int8


def test_int8_engine_build_load_roundtrip(tmp_path):
    """The combined TRT-analog flow: calibrate -> int8 config -> AOT engine
    build -> reload -> serve. Pins that the quantized graph (incl. the
    quantized residual stream) survives executable serialization and that
    the engine output matches the live int8 predictor graph."""
    from maskrcnn_tf2_tpu.export.engine import build_engine, load_engine
    from maskrcnn_tf2_tpu.export.quantize import quantize_for_inference
    from maskrcnn_tf2_tpu.models import MaskRCNN

    cfg = dataclasses.replace(CFG, backbone="resnet18")
    rs = np.random.RandomState(12)
    model = MaskRCNN(cfg)
    images = jnp.asarray(rs.rand(1, 96, 96, 3).astype(np.float32) * 255.0)
    meta = jnp.zeros((1, cfg.meta_size), jnp.float32)
    meta = meta.at[0, 4:7].set(jnp.asarray([96.0, 96.0, 3.0]))
    meta = meta.at[0, 7:11].set(jnp.asarray([0.0, 0.0, 96.0, 96.0]))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images,
        meta,
        train=False,
    )
    qcfg, qvars = quantize_for_inference(cfg, dict(variables), [(images, meta)])

    path = str(tmp_path / "int8.engine")
    build_engine(qcfg, qvars, path, batch_size=1)
    eng = load_engine(path)

    img_u8 = rs.randint(0, 256, size=(1, 96, 96, 3), dtype=np.uint8)
    det_eng, masks_eng = eng(jnp.asarray(img_u8), meta)

    qmodel = MaskRCNN(qcfg)

    @jax.jit
    def live(images, meta):
        return qmodel.apply(qvars, images, meta, train=False)["detections"]

    det_live = np.asarray(live(jnp.asarray(img_u8, jnp.float32), meta))
    # int8 graphs round() activations; a tie flipping under a different
    # compilation perturbs downstream values slightly — compare with a
    # tolerance that catches real breakage, not fusion-order jitter
    np.testing.assert_allclose(
        det_eng[..., 4], det_live[..., 4], atol=0
    )  # classes exact
    np.testing.assert_allclose(det_eng, det_live, rtol=0.05, atol=0.02)
    assert np.isfinite(masks_eng).all()
