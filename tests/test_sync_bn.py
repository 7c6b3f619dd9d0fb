"""Sync-BN (config.sync_bn): cross-replica batch statistics under DP.

The reference is single-GPU and normalizes over the whole (global) batch
(model.py train_bn default, config.py:152-156). Under an 8-device DP mesh
with 1 img/shard, per-shard BN normalizes over a single image — broken.
With sync_bn the BatchNorm layers psum their batch statistics over the
``data`` mesh axis, so every shard normalizes with GLOBAL-batch statistics
and the updated running stats are bit-identical across shards.

These tests pin both properties on the virtual 8-device CPU mesh:
  1. per-shard updated batch_stats are identical across all 8 shards;
  2. they equal the single-device full-batch stats (the reference's
     semantics) to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maskrcnn_tf2_tpu.models.backbones.factory import get_backbone
from maskrcnn_tf2_tpu.models.heads import FPNClassifierHead

AXIS = "data"


def _mesh():
    return Mesh(np.asarray(jax.devices()), (AXIS,))


def _per_shard_stats(mesh, apply_fn, variables, *args):
    """Run apply_fn on a sharded batch; gather each shard's updated
    batch_stats stacked on a leading axis of size n_devices."""

    def fn(variables, *args):
        _, mut = apply_fn(variables, *args)
        # leading size-1 axis so out_spec P(AXIS) stacks shards to (n, ...)
        return jax.tree.map(lambda s: s[None], mut["batch_stats"])

    n = len(mesh.devices)
    in_specs = (P(),) + tuple(P(AXIS) for _ in args)
    sharded = shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=P(AXIS),
                        check_rep=False)
    return jax.jit(sharded)(variables, *args)


def _assert_sync(per_shard, single):
    """per_shard: pytree of (n_dev, ...); single: pytree of (...)."""
    flat_ps = jax.tree.leaves(per_shard)
    flat_s = jax.tree.leaves(single)
    assert len(flat_ps) == len(flat_s) and len(flat_ps) > 0
    for ps, s in zip(flat_ps, flat_s):
        ps = np.asarray(ps)
        # identical across shards
        for i in range(1, ps.shape[0]):
            np.testing.assert_array_equal(ps[i], ps[0])
        # equal to the single-device global-batch stats
        np.testing.assert_allclose(ps[0], np.asarray(s), rtol=1e-5, atol=1e-5)


def test_backbone_sync_bn_matches_global_batch():
    mesh = _mesh()
    n = len(mesh.devices)
    x = jnp.asarray(
        np.random.RandomState(0).randn(n, 32, 32, 3).astype(np.float32)
    )

    def make(bn_axis):
        bb = get_backbone("resnet18", dtype=jnp.float32, bn_axis=bn_axis)
        variables = bb.init(jax.random.PRNGKey(0), x, train_bn=False)
        apply = lambda v, xx: bb.apply(
            v, xx, train_bn=True, mutable=["batch_stats"]
        )
        return variables, apply

    # sync path on the mesh (1 img/shard)
    v_sync, apply_sync = make(AXIS)
    per_shard = _per_shard_stats(mesh, apply_sync, v_sync, x)

    # reference semantics: one device, whole batch (params identical by
    # construction: same PRNGKey, same module tree modulo bn_axis)
    v_single, apply_single = make(None)
    _, mut = jax.jit(
        lambda v, xx: apply_single(v, xx)
    )(v_single, x)
    _assert_sync(per_shard, mut["batch_stats"])


def test_classifier_head_sync_bn_matches_global_batch():
    mesh = _mesh()
    n = len(mesh.devices)
    rois = jnp.asarray(
        np.random.RandomState(1).randn(n, 4, 7, 7, 32).astype(np.float32)
    )

    def make(bn_axis):
        head = FPNClassifierHead(
            num_classes=4, pool_size=7, fc_size=64, dtype=jnp.float32,
            bn_axis=bn_axis,
        )
        variables = head.init(jax.random.PRNGKey(0), rois, train_bn=False)
        apply = lambda v, r: head.apply(
            v, r, train_bn=True, mutable=["batch_stats"]
        )
        return variables, apply

    v_sync, apply_sync = make(AXIS)
    per_shard = _per_shard_stats(mesh, apply_sync, v_sync, rois)

    v_single, apply_single = make(None)
    _, mut = jax.jit(lambda v, r: apply_single(v, r))(v_single, rois)
    _assert_sync(per_shard, mut["batch_stats"])


def test_sync_bn_config_threads_axis_into_model():
    """cfg.sync_bn=True must thread the mesh axis into the model's BNs: a
    plain single-device trace (no surrounding shard_map binding the axis)
    must fail with an unbound-axis error."""
    from maskrcnn_tf2_tpu.config import MaskRCNNConfig
    from maskrcnn_tf2_tpu.models import MaskRCNN

    cfg = MaskRCNNConfig(
        image_shape=(64, 64, 3), image_min_dim=64, image_max_dim=64,
        rpn_anchor_scales=(8, 16, 32, 64, 128), pre_nms_limit=64,
        post_nms_rois_training=16, post_nms_rois_inference=16,
        train_rois_per_image=8, max_gt_instances=3, num_classes=2,
        backbone="resnet18", compute_dtype="float32", batch_size=1,
        sync_bn=True,
    )
    model = MaskRCNN(cfg)
    h, w, c = cfg.image_shape
    g = cfg.max_gt_instances
    mh, mw = cfg.mini_mask_shape
    args = (
        jnp.zeros((1, h, w, c), jnp.float32),
        jnp.zeros((1, cfg.meta_size), jnp.float32),
        jnp.zeros((1, g), jnp.int32),
        jnp.zeros((1, g, 4), jnp.float32),
        jnp.zeros((1, g, mh, mw), jnp.float32),
    )
    # init is exempt: flax BatchNorm skips the axis-name psum while
    # is_initializing() — so init works anywhere, apply demands the axis.
    variables = jax.eval_shape(
        lambda r: model.init(
            {"params": r, "sampling": jax.random.fold_in(r, 1)}, *args,
            train=True,
        ),
        jax.random.PRNGKey(0),
    )
    with pytest.raises(Exception, match="(?i)axis|unbound|name"):
        jax.eval_shape(
            lambda v: model.apply(
                v, *args, train=True,
                rngs={"sampling": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            ),
            variables,
        )
