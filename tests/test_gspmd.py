"""GSPMD DP x TP: the XLA-partitioned train step (parallel/gspmd.py) must
reproduce the single-device global-batch step exactly (same program, same
rng — the partitioner only changes placement), with the classifier-head FC
leaves actually sharded over the ``model`` axis."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from jit_fast import FAST_COMPILE  # tests/ is on sys.path under pytest

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.ops.image import compose_image_meta
from maskrcnn_tf2_tpu.parallel.gspmd import (
    make_mesh_2d,
    shard_global_batch,
    state_shardings,
)
from maskrcnn_tf2_tpu.train.train_step import create_train_state, make_train_step

CFG = MaskRCNNConfig(
    image_shape=(64, 64, 3),
    image_min_dim=64,
    image_max_dim=64,
    rpn_anchor_scales=(4, 8, 16, 32, 64),
    pre_nms_limit=128,
    post_nms_rois_training=32,
    post_nms_rois_inference=32,
    train_rois_per_image=8,
    max_gt_instances=4,
    num_classes=3,
    # mobilenet + 64-wide FPN: the equivalence + sharding assertions are
    # structural (head-leaf names, partitioner placement), and param volume
    # dominates both compile and run time on the shared-core virtual mesh
    # (same lesson as __graft_entry__._flagship_config(tiny=True))
    backbone="mobilenet",
    top_down_pyramid_size=64,
    fpn_cls_fc_layers_size=128,
    mask_conv_channels=64,
    compute_dtype="float32",
    batch_size=2,
    parallel_mode="gspmd",
    tp_shards=2,
)


def _batch(b=2):
    h, w, _ = CFG.image_shape
    g = CFG.max_gt_instances
    rs = np.random.RandomState(0)
    meta = compose_image_meta(0, (h, w, 3), (h, w, 3), (0, 0, h, w), 1.0, np.ones(3))
    return {
        "images": jnp.asarray(rs.rand(b, h, w, 3).astype(np.float32) * 255),
        "image_meta": jnp.tile(jnp.asarray(meta), (b, 1)),
        "gt_class_ids": jnp.zeros((b, g), jnp.int32).at[:, :2].set(1),
        "gt_boxes": jnp.concatenate(
            [
                jnp.tile(jnp.asarray([[0.1, 0.1, 0.5, 0.5], [0.5, 0.5, 0.9, 0.9]]), (b, 1, 1)),
                jnp.zeros((b, g - 2, 4)),
            ],
            axis=1,
        ),
        "gt_masks": jnp.ones((b, g, h, w), jnp.float32),
    }


def test_tp_rules_map_head_leaves():
    """Sharding-rule unit check on a synthetic TrainState-shaped pytree —
    params, batch_stats, AND optimizer mirrors of the head leaves shard;
    everything else stays replicated."""
    mesh = make_mesh_2d(2, 2)
    head = {
        "mrcnn_class_conv1": {"kernel": jnp.zeros((8, 4)), "bias": jnp.zeros((4,))},
        "mrcnn_class_bn1": {"scale": jnp.zeros((4,)), "bias": jnp.zeros((4,))},
        "mrcnn_class_conv2": {"kernel": jnp.zeros((4, 8)), "bias": jnp.zeros((8,))},
    }
    fake = {
        "params": {"classifier": head, "backbone": {"conv": {"kernel": jnp.zeros((3, 3))}}},
        "mu": {"classifier": jax.tree.map(jnp.zeros_like, head)},  # optimizer mirror
        "count": jnp.zeros(()),
    }
    specs = state_shardings(fake, mesh, CFG)
    assert specs["params"]["classifier"]["mrcnn_class_conv1"]["kernel"].spec == P(None, "model")
    assert specs["params"]["classifier"]["mrcnn_class_conv1"]["bias"].spec == P("model")
    assert specs["params"]["classifier"]["mrcnn_class_bn1"]["scale"].spec == P("model")
    assert specs["params"]["classifier"]["mrcnn_class_conv2"]["kernel"].spec == P("model", None)
    # conv2 bias is replicated (added after the TP all-reduce)
    assert specs["params"]["classifier"]["mrcnn_class_conv2"]["bias"].spec == P()
    assert specs["params"]["backbone"]["conv"]["kernel"].spec == P()
    # optimizer mirrors follow the same trailing-key rule
    assert specs["mu"]["classifier"]["mrcnn_class_conv1"]["kernel"].spec == P(None, "model")
    assert specs["count"].spec == P()


def test_gspmd_step_matches_single_device():
    from maskrcnn_tf2_tpu.parallel.gspmd import make_gspmd_train_step

    assert len(jax.devices()) >= 4, "conftest provides 8 virtual CPU devices"
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    batch = _batch()
    rng = jax.random.PRNGKey(7)

    step = make_train_step(CFG)
    single = jax.jit(step, compiler_options=FAST_COMPILE)
    s1, l1 = single(state, batch, rng)

    mesh = make_mesh_2d(2, 2, CFG.mesh_data_axis, CFG.mesh_model_axis)
    jstep, placed = make_gspmd_train_step(
        CFG, mesh, state, compiler_options=FAST_COMPILE
    )
    s2, l2 = jstep(placed, shard_global_batch(batch, mesh, CFG), rng)

    # identical program, partitioned placement: losses agree to reduction
    # -order tolerance
    for k in l1:
        np.testing.assert_allclose(
            np.asarray(l1[k]), np.asarray(l2[k]), rtol=2e-4, atol=2e-5, err_msg=k
        )
    # updated head params stay sharded over the model axis and match the
    # single-device update numerically
    k2 = s2.params["classifier"]["mrcnn_class_conv1"]["kernel"]
    assert k2.sharding.spec == P(None, "model")
    np.testing.assert_allclose(
        np.asarray(s1.params["classifier"]["mrcnn_class_conv1"]["kernel"]),
        np.asarray(k2),
        rtol=2e-4,
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s1.params["classifier"]["mrcnn_class_conv2"]["kernel"]),
        np.asarray(s2.params["classifier"]["mrcnn_class_conv2"]["kernel"]),
        rtol=2e-4,
        atol=2e-5,
    )


def test_no_pallas_scope_gates_kernels(monkeypatch):
    """Inside utils.platform.no_pallas() the NMS/ROIAlign gates must route
    to pure-XLA implementations even on TPU — the GSPMD partitioner has no
    rule for Pallas tpu_custom_calls. Pure-XLA TPU paths stay on."""
    from maskrcnn_tf2_tpu.ops import nms as nms_mod
    from maskrcnn_tf2_tpu.utils import platform

    monkeypatch.setattr(platform, "on_tpu", lambda: True)  # simulate TPU
    monkeypatch.delenv("MASKRCNN_TPU_NMS", raising=False)
    assert nms_mod._use_pallas() is True
    with platform.no_pallas():
        assert nms_mod._use_pallas() is False
        assert platform.pallas_allowed() is False
    assert nms_mod._use_pallas() is True  # scope restores

    # the ROIAlign matmul gate (pure XLA) is NOT affected by the scope
    from maskrcnn_tf2_tpu.ops import roi_align as ra

    monkeypatch.delenv("MASKRCNN_TPU_ROIALIGN", raising=False)
    with platform.no_pallas():
        assert ra._use_matmul() is True
