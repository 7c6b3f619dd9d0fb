"""Converter + config-knob tests for pretrained backbone import.

No real checkpoints exist in this zero-egress environment, so each test
builds a synthetic state_dict in the EXACT upstream naming convention
(torchvision mobilenet_v2 / timm efficientnet / timm legacy seresnet) with
tensors reverse-derived from our flax modules, converts it, and asserts
every leaf round-trips. The end-to-end test exercises the reference's
``backbone_init_weights`` knob (config.py:163) through create_train_state.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from maskrcnn_tf2_tpu.models import get_backbone
from maskrcnn_tf2_tpu.models.backbones.pretrained import (
    _flatten,
    backbone_leaf_count,
    convert_timm_efficientnet,
    convert_torch_backbone,
    convert_torch_mobilenet_v2,
    convert_torch_resnet,
    save_backbone_npz,
)


def _init(name, seed=0):
    model = get_backbone(name, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    return jax.jit(
        lambda r: model.init({"params": r}, x, train_bn=False)
    )(jax.random.PRNGKey(seed))


def conv_t(flat, path):
    return torch.from_numpy(np.transpose(np.asarray(flat[path]), (3, 2, 0, 1)).copy())


def dense_as_conv1x1(flat, path):
    k = np.asarray(flat[path])  # [in, out]
    return torch.from_numpy(k.T[:, :, None, None].copy())


def put_bn(sd, prefix, flat, stats, path):
    sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(flat[path + ("scale",)]).copy())
    sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(flat[path + ("bias",)]).copy())
    sd[f"{prefix}.running_mean"] = torch.from_numpy(
        np.asarray(stats[path + ("mean",)]).copy()
    )
    sd[f"{prefix}.running_var"] = torch.from_numpy(
        np.asarray(stats[path + ("var",)]).copy()
    )


def assert_roundtrip(variables, converted):
    for coll in ("params", "batch_stats"):
        orig = _flatten(variables[coll])
        conv = _flatten(converted[coll])
        assert set(conv) == set(orig), (
            sorted(set(orig) - set(conv))[:5],
            sorted(set(conv) - set(orig))[:5],
        )
        for p in orig:
            np.testing.assert_allclose(np.asarray(conv[p]), np.asarray(orig[p]), atol=0)


# ----------------------------------------------------------------------
def test_seresnet18_conversion_roundtrip():
    variables = _init("seresnet18")
    flat = _flatten(variables["params"])
    stats = _flatten(variables["batch_stats"])
    sd = {}
    sd["conv1.weight"] = conv_t(flat, ("stem", "conv", "kernel"))
    put_bn(sd, "bn1", flat, stats, ("stem", "bn"))
    for stage, blocks in enumerate([2, 2, 2, 2], start=1):
        for b in range(blocks):
            ours = f"stage{stage}_block{b + 1}"
            for ci in (1, 2):
                sd[f"layer{stage}.{b}.conv{ci}.weight"] = conv_t(
                    flat, (ours, f"conv{ci}", "conv", "kernel")
                )
                put_bn(sd, f"layer{stage}.{b}.bn{ci}", flat, stats, (ours, f"conv{ci}", "bn"))
            # timm legacy senet exposes SE as 1x1 convs named se_module.fc{1,2}
            for fc in ("fc1", "fc2"):
                sd[f"layer{stage}.{b}.se_module.{fc}.weight"] = dense_as_conv1x1(
                    flat, (ours, "se", fc, "kernel")
                )
                sd[f"layer{stage}.{b}.se_module.{fc}.bias"] = torch.from_numpy(
                    np.asarray(flat[(ours, "se", fc, "bias")]).copy()
                )
            if (ours, "downsample", "conv", "kernel") in flat:
                sd[f"layer{stage}.{b}.downsample.0.weight"] = conv_t(
                    flat, (ours, "downsample", "conv", "kernel")
                )
                put_bn(
                    sd, f"layer{stage}.{b}.downsample.1", flat, stats,
                    (ours, "downsample", "bn"),
                )
    converted = convert_torch_resnet(sd)
    assert_roundtrip(variables, converted)


def fake_torchvision_mobilenet_v2_sd(variables):
    flat = _flatten(variables["params"])
    stats = _flatten(variables["batch_stats"])
    sd = {}
    sd["features.0.0.weight"] = conv_t(flat, ("stem_conv", "kernel"))
    put_bn(sd, "features.0.1", flat, stats, ("stem_bn",))
    for i in range(1, 18):
        blk = f"block{i - 1}"
        if (blk, "expand_conv", "kernel") in flat:
            groups = [("expand", "conv.0.0", "conv.0.1"),
                      ("dw", "conv.1.0", "conv.1.1"),
                      ("project", "conv.2", "conv.3")]
        else:
            groups = [("dw", "conv.0.0", "conv.0.1"),
                      ("project", "conv.1", "conv.2")]
        for ours, ck, bk in groups:
            sd[f"features.{i}.{ck}.weight"] = conv_t(flat, (blk, f"{ours}_conv", "kernel"))
            put_bn(sd, f"features.{i}.{bk}", flat, stats, (blk, f"{ours}_bn"))
    return sd


def test_mobilenet_v2_conversion_roundtrip():
    variables = _init("mobilenetv2")
    sd = fake_torchvision_mobilenet_v2_sd(variables)
    converted = convert_torch_mobilenet_v2(sd)
    assert_roundtrip(variables, converted)
    # the sniffing dispatcher picks the right converter
    assert_roundtrip(variables, convert_torch_backbone(sd))


def test_efficientnet_b0_conversion_roundtrip():
    variables = _init("efficientnetb0")
    flat = _flatten(variables["params"])
    stats = _flatten(variables["batch_stats"])
    sd = {}
    sd["conv_stem.weight"] = conv_t(flat, ("stem_conv", "kernel"))
    put_bn(sd, "bn1", flat, stats, ("stem_bn",))
    # b0 stage repeats (efficientnet.py _BLOCK_ARGS)
    stage_sizes = [1, 2, 2, 3, 3, 4, 1]
    bidx = 0
    for s, reps in enumerate(stage_sizes):
        for b in range(reps):
            blk = f"block{bidx}"
            pre = f"blocks.{s}.{b}"
            if (blk, "expand_conv", "kernel") in flat:
                groups = [("expand", "conv_pw", "bn1"),
                          ("dw", "conv_dw", "bn2"),
                          ("project", "conv_pwl", "bn3")]
            else:
                groups = [("dw", "conv_dw", "bn1"), ("project", "conv_pw", "bn2")]
            for ours, ck, bk in groups:
                sd[f"{pre}.{ck}.weight"] = conv_t(flat, (blk, f"{ours}_conv", "kernel"))
                put_bn(sd, f"{pre}.{bk}", flat, stats, (blk, f"{ours}_bn"))
            for timm_se, ours_se in (("conv_reduce", "se_reduce"), ("conv_expand", "se_expand")):
                sd[f"{pre}.se.{timm_se}.weight"] = dense_as_conv1x1(
                    flat, (blk, ours_se, "kernel")
                )
                sd[f"{pre}.se.{timm_se}.bias"] = torch.from_numpy(
                    np.asarray(flat[(blk, ours_se, "bias")]).copy()
                )
            bidx += 1
    converted = convert_timm_efficientnet(sd)
    assert_roundtrip(variables, converted)
    assert_roundtrip(variables, convert_torch_backbone(sd))


# ----------------------------------------------------------------------
def test_backbone_init_weights_knob_end_to_end(tmp_path):
    """create_train_state consumes config.backbone_init_weights: the model
    starts from the checkpointed backbone (>=90% leaf coverage enforced)."""
    from maskrcnn_tf2_tpu.config import MaskRCNNConfig
    from maskrcnn_tf2_tpu.train.train_step import create_train_state

    # "pretrained" backbone from a different seed, exported to npz
    src_vars = _init("resnet18", seed=123)
    npz = os.path.join(tmp_path, "r18_imagenet.npz")
    save_backbone_npz(src_vars, npz)

    cfg = MaskRCNNConfig(
        image_shape=(128, 128, 3),
        rpn_anchor_scales=(8, 16, 32, 64, 128),
        pre_nms_limit=64,
        post_nms_rois_training=32,
        post_nms_rois_inference=32,
        train_rois_per_image=8,
        max_gt_instances=4,
        num_classes=2,
        backbone="resnet18",
        compute_dtype="float32",
        backbone_init_weights=npz,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    got = _flatten(state.params["backbone"])
    want = _flatten(src_vars["params"])
    matched = sum(
        np.allclose(np.asarray(got[p]), np.asarray(want[p])) for p in want
    )
    assert matched == len(want)
    # batch_stats restored too
    got_bs = _flatten(state.batch_stats["backbone"])
    want_bs = _flatten(src_vars["batch_stats"])
    assert all(
        np.allclose(np.asarray(got_bs[p]), np.asarray(want_bs[p])) for p in want_bs
    )


def test_backbone_init_weights_rejects_wrong_checkpoint(tmp_path):
    """A checkpoint for a different backbone must fail loudly, not silently
    train a random backbone."""
    from maskrcnn_tf2_tpu.config import MaskRCNNConfig
    from maskrcnn_tf2_tpu.models.backbones.pretrained import init_backbone_weights

    src_vars = _init("mobilenetv2")
    npz = os.path.join(tmp_path, "mnv2.npz")
    save_backbone_npz(src_vars, npz)

    r18_vars = _init("resnet18")
    wrapped = {
        "params": {"backbone": r18_vars["params"]},
        "batch_stats": {"backbone": r18_vars["batch_stats"]},
    }
    cfg = MaskRCNNConfig(backbone="resnet18", backbone_init_weights=npz)
    assert backbone_leaf_count(wrapped) > 0
    with pytest.raises(ValueError, match="covered only"):
        init_backbone_weights(wrapped, cfg)


# ----------------------------------------------------------------------
def test_resnext50_conversion_roundtrip():
    """Grouped-conv (cardinality-32) path of the torchvision mapping —
    previously only the SE-ResNet18 test covered _torch_resnet_key."""
    variables = _init("resnext50")
    flat = _flatten(variables["params"])
    stats = _flatten(variables["batch_stats"])
    sd = {}
    sd["conv1.weight"] = conv_t(flat, ("stem", "conv", "kernel"))
    put_bn(sd, "bn1", flat, stats, ("stem", "bn"))
    for stage, blocks in enumerate([3, 4, 6, 3], start=1):
        for b in range(blocks):
            ours = f"stage{stage}_block{b + 1}"
            for ci in (1, 2, 3):
                sd[f"layer{stage}.{b}.conv{ci}.weight"] = conv_t(
                    flat, (ours, f"conv{ci}", "conv", "kernel")
                )
                put_bn(sd, f"layer{stage}.{b}.bn{ci}", flat, stats, (ours, f"conv{ci}", "bn"))
            if (ours, "downsample", "conv", "kernel") in flat:
                sd[f"layer{stage}.{b}.downsample.0.weight"] = conv_t(
                    flat, (ours, "downsample", "conv", "kernel")
                )
                put_bn(
                    sd, f"layer{stage}.{b}.downsample.1", flat, stats,
                    (ours, "downsample", "bn"),
                )
    # grouped conv2 kernels have in/groups channel dim - mapping is shape
    # -agnostic, the roundtrip pins it
    converted = convert_torch_resnet(sd)
    assert_roundtrip(variables, converted)
    assert_roundtrip(variables, convert_torch_backbone(sd))


def test_senet154_deep_stem_conversion_roundtrip():
    """SENet154's 3x 3x3 deep stem (timm legacy_senet154 layer0.conv{1,2,3})
    maps onto our stem{1,2,3} ConvBN trio (reference senet_models.py:270-303);
    the 25th and last backbone family with a tested weight-ingest story."""
    variables = _init("senet154")
    flat = _flatten(variables["params"])
    stats = _flatten(variables["batch_stats"])
    sd = {}
    for i in (1, 2, 3):
        sd[f"layer0.conv{i}.weight"] = conv_t(flat, (f"stem{i}", "conv", "kernel"))
        put_bn(sd, f"layer0.bn{i}", flat, stats, (f"stem{i}", "bn"))
    for stage, blocks in enumerate([3, 8, 36, 3], start=1):
        for b in range(blocks):
            ours = f"stage{stage}_block{b + 1}"
            for ci in (1, 2, 3):
                sd[f"layer{stage}.{b}.conv{ci}.weight"] = conv_t(
                    flat, (ours, f"conv{ci}", "conv", "kernel")
                )
                put_bn(sd, f"layer{stage}.{b}.bn{ci}", flat, stats, (ours, f"conv{ci}", "bn"))
            for fc in ("fc1", "fc2"):
                sd[f"layer{stage}.{b}.se_module.{fc}.weight"] = dense_as_conv1x1(
                    flat, (ours, "se", fc, "kernel")
                )
                sd[f"layer{stage}.{b}.se_module.{fc}.bias"] = torch.from_numpy(
                    np.asarray(flat[(ours, "se", fc, "bias")]).copy()
                )
            if (ours, "downsample", "conv", "kernel") in flat:
                sd[f"layer{stage}.{b}.downsample.0.weight"] = conv_t(
                    flat, (ours, "downsample", "conv", "kernel")
                )
                put_bn(
                    sd, f"layer{stage}.{b}.downsample.1", flat, stats,
                    (ours, "downsample", "bn"),
                )
    converted = convert_torch_resnet(sd)
    assert_roundtrip(variables, converted)


def test_mobilenet_v1_conversion_roundtrip():
    """timm mobilenetv1_100 layout (conv_stem + 13 DepthwiseSeparableConv
    blocks) -> our flat b{1..13}_{dw,pw} naming; the sniffer must NOT route
    the conv_stem prefix to the EfficientNet converter."""
    variables = _init("mobilenet")
    flat = _flatten(variables["params"])
    stats = _flatten(variables["batch_stats"])
    sd = {}
    sd["conv_stem.weight"] = conv_t(flat, ("stem_conv", "kernel"))
    put_bn(sd, "bn1", flat, stats, ("stem_bn",))
    # timm stage grouping by stride: [64], [128,128], [256,256], [512x6],
    # [1024,1024] == our b1..b13 in order
    stage_sizes = [1, 2, 2, 6, 2]
    bidx = 0
    for s, reps in enumerate(stage_sizes):
        for b in range(reps):
            bidx += 1
            pre = f"blocks.{s}.{b}"
            sd[f"{pre}.conv_dw.weight"] = conv_t(flat, (f"b{bidx}_dw_conv", "kernel"))
            put_bn(sd, f"{pre}.bn1", flat, stats, (f"b{bidx}_dw_bn",))
            sd[f"{pre}.conv_pw.weight"] = conv_t(flat, (f"b{bidx}_pw_conv", "kernel"))
            put_bn(sd, f"{pre}.bn2", flat, stats, (f"b{bidx}_pw_bn",))
    from maskrcnn_tf2_tpu.models.backbones.pretrained import (
        convert_timm_mobilenet_v1,
    )

    converted = convert_timm_mobilenet_v1(sd)
    assert_roundtrip(variables, converted)
    assert_roundtrip(variables, convert_torch_backbone(sd))
