"""Elastic sharded-checkpoint drill (VERDICT r4 next #5).

The classic real-fleet failure: a run saves its state sharded over one
topology and must resume on another (preemption shrank the slice, or the
parallelism recipe changed). Reference capability: filename-parsed resume,
training.py:105-111 — single-GPU, so topology change never arises there;
here it must hold for GSPMD DP x TP states whose classifier-head FC leaves
are physically SHARDED over the model axis.

Drill: run one DP4 x TP2 train step on the 8-device CPU mesh, orbax-save the
(sharded) TrainState, then restore it

  * onto a 2 x 2 mesh,
  * onto a single device (no mesh at all),
  * and back onto DP x TP from the host copy (cross-recipe),

asserting BITWISE param/opt equality with the full (unsharded) original in
every case, and that a continuation step from the restored state produces
the same losses on every topology (resume is placement-invariant).
"""

import dataclasses

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from jit_fast import FAST_COMPILE  # tests/ is on sys.path under pytest

from test_gspmd import CFG as GSPMD_CFG, _batch

from maskrcnn_tf2_tpu.parallel.gspmd import (
    make_gspmd_train_step,
    make_mesh_2d,
    place_state,
    shard_global_batch,
    state_shardings,
)
from maskrcnn_tf2_tpu.train import checkpoint as ckpt_lib
from maskrcnn_tf2_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
)

CFG = dataclasses.replace(GSPMD_CFG, batch_size=4)


def _host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def _assert_bitwise(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_topology_change_restore(tmp_path):
    assert len(jax.devices()) >= 8, "conftest provides 8 virtual CPU devices"
    batch = _batch(b=4)
    rng = jax.random.PRNGKey(7)
    state0 = create_train_state(CFG, jax.random.PRNGKey(0))

    # --- one DP4 x TP2 step, then save the sharded state
    mesh8 = make_mesh_2d(4, 2, CFG.mesh_data_axis, CFG.mesh_model_axis)
    jstep8, placed8 = make_gspmd_train_step(
        CFG, mesh8, state0, compiler_options=FAST_COMPILE
    )
    s8, _ = jstep8(placed8, shard_global_batch(batch, mesh8, CFG), rng)
    # the head FC really is sharded when it hits the checkpointer
    assert (
        s8.params["classifier"]["mrcnn_class_conv1"]["kernel"].sharding.spec
        == P(None, "model")
    )
    manager = ckpt_lib.make_manager(CFG, base=str(tmp_path))
    ckpt_lib.save(manager, s8, epoch=0, metrics={"loss_sum": 1.0})
    manager.wait_until_finished()
    s8_host = _host(s8)

    # continuation losses on the native topology (the yardstick)
    rng2 = jax.random.PRNGKey(8)
    _, l_ref = jstep8(s8, shard_global_batch(batch, mesh8, CFG), rng2)
    l_ref = _host(l_ref)

    # --- restore onto a 2 x 2 mesh (half the devices)
    mesh4 = make_mesh_2d(2, 2, CFG.mesh_data_axis, CFG.mesh_model_axis)
    template4 = place_state(state0, mesh4, CFG)
    r4, start, _ = ckpt_lib.restore(manager, template4)
    assert start == 1
    _assert_bitwise(_host(r4), s8_host)
    specs4 = state_shardings(state0, mesh4, CFG)
    assert (
        r4.params["classifier"]["mrcnn_class_conv1"]["kernel"].sharding
        == specs4.params["classifier"]["mrcnn_class_conv1"]["kernel"]
    )
    jstep4, _ = make_gspmd_train_step(
        CFG, mesh4, state0, compiler_options=FAST_COMPILE
    )
    _, l4 = jstep4(r4, shard_global_batch(batch, mesh4, CFG), rng2)
    for k in l_ref:
        np.testing.assert_allclose(
            np.asarray(l4[k]), l_ref[k], rtol=2e-4, atol=2e-5, err_msg=k
        )

    # --- restore onto a single device (no mesh): fleet shrank to one chip
    r1, start, _ = ckpt_lib.restore(manager, state0)
    assert start == 1
    _assert_bitwise(_host(r1), s8_host)
    single = jax.jit(make_train_step(CFG), compiler_options=FAST_COMPILE)
    _, l1 = single(r1, batch, rng2)
    for k in l_ref:
        np.testing.assert_allclose(
            np.asarray(l1[k]), l_ref[k], rtol=2e-4, atol=2e-5, err_msg=k
        )

    # --- and back up: host-restored state re-placed onto DP x TP resumes
    # identically (cross-recipe round trip)
    placed_again = place_state(
        TrainState(**{k: v for k, v in r1._asdict().items()}), mesh8, CFG
    )
    _, l8b = jstep8(placed_again, shard_global_batch(batch, mesh8, CFG), rng2)
    for k in l_ref:
        np.testing.assert_allclose(
            np.asarray(l8b[k]), l_ref[k], rtol=2e-4, atol=2e-5, err_msg=k
        )
