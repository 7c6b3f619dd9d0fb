"""GSPMD + Pallas: the kernels survive auto-partitioning (VERDICT r4 weak #1).

``parallel/gspmd.py`` used to trace under ``no_pallas()`` because Pallas
``tpu_custom_call``s have no SPMD partitioning rule — a measured +18% step
-time downgrade on TPU. Both kernels are per-image independent, so the
``utils.platform.pallas_spmd`` scope now makes their batched call sites
(ops/proposal.py, ops/detection.py, ops/roi_align.py) ``shard_map`` islands
over the data axis: manual partitioning the GSPMD partitioner composes with.

CPU proxy for the TPU wiring: ``MASKRCNN_TPU_PALLAS=interpret`` forces the
gates onto the Pallas kernels in interpret mode, so the EXACT island
structure — vmapped kernel funnels wrapped in shard_map inside
jit+shardings — is traced, partitioned, and executed on the virtual CPU
mesh, and compared against the identical single-device interpret-mode step.
A lowering assertion pins that the islands are really present (a stale
inner-jit trace cache would otherwise silently skip the wrapper).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from jit_fast import FAST_COMPILE  # tests/ is on sys.path under pytest

from test_gspmd import CFG, _batch

from maskrcnn_tf2_tpu.parallel.gspmd import (
    make_gspmd_train_step,
    make_mesh_2d,
    shard_global_batch,
)
from maskrcnn_tf2_tpu.train.train_step import create_train_state, make_train_step
from maskrcnn_tf2_tpu.utils import platform


def test_spmd_scope_keeps_pallas_gates_on(monkeypatch):
    """Inside pallas_spmd() the gates stay ON (unlike no_pallas()) and the
    batched wrapper becomes a shard_map island bound to the scope's mesh."""
    from maskrcnn_tf2_tpu.ops import nms as nms_mod

    monkeypatch.setattr(platform, "on_tpu", lambda: True)  # simulate TPU
    monkeypatch.delenv("MASKRCNN_TPU_NMS", raising=False)
    mesh = make_mesh_2d(2, 2)
    assert platform.pallas_spmd_info() is None
    assert platform.spmd_shard_batched(np.sin, 1) is np.sin  # identity outside
    with platform.pallas_spmd(mesh, "data"):
        assert platform.pallas_spmd_info() == (mesh, "data")
        assert nms_mod._use_pallas() is True
        assert platform.spmd_shard_batched(jnp.sin, 1) is not jnp.sin
    assert platform.pallas_spmd_info() is None


def test_gspmd_step_keeps_interpret_kernels(monkeypatch):
    """The partitioned train step with Pallas kernels engaged (interpret
    mode) lowers with manual-computation islands and reproduces the
    single-device step exactly."""
    monkeypatch.setenv("MASKRCNN_TPU_PALLAS", "interpret")
    monkeypatch.delenv("MASKRCNN_TPU_NMS", raising=False)
    monkeypatch.delenv("MASKRCNN_TPU_ROIALIGN", raising=False)
    assert len(jax.devices()) >= 4, "conftest provides 8 virtual CPU devices"

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    batch = _batch()
    rng = jax.random.PRNGKey(7)

    single = jax.jit(make_train_step(CFG), compiler_options=FAST_COMPILE)
    s1, l1 = single(state, batch, rng)

    mesh = make_mesh_2d(2, 2, CFG.mesh_data_axis, CFG.mesh_model_axis)
    jstep, placed = make_gspmd_train_step(
        CFG, mesh, state, compiler_options=FAST_COMPILE
    )
    sharded_batch = shard_global_batch(batch, mesh, CFG)

    # the kernel islands must actually be in the partitioned program
    lowered = jstep.lower(placed, sharded_batch, rng).as_text()
    assert "manual_computation" in lowered, (
        "no shard_map island in the GSPMD trace - the pallas_spmd wiring "
        "was skipped (stale inner-jit cache?)"
    )

    s2, l2 = jstep(placed, sharded_batch, rng)
    for k in l1:
        np.testing.assert_allclose(
            np.asarray(l1[k]), np.asarray(l2[k]), rtol=2e-4, atol=2e-5, err_msg=k
        )
    k2 = s2.params["classifier"]["mrcnn_class_conv1"]["kernel"]
    assert k2.sharding.spec == P(None, "model")
    np.testing.assert_allclose(
        np.asarray(s1.params["classifier"]["mrcnn_class_conv1"]["kernel"]),
        np.asarray(k2),
        rtol=2e-4,
        atol=2e-5,
    )


def test_dp_predictor_keeps_interpret_kernels(monkeypatch):
    """The DP serving path (Predictor(data_parallel=True)) jits with
    in_shardings — an auto-partitioned trace that would FAIL to compile on
    >1 chip with naked Pallas custom calls. The pallas_spmd scope inside
    its _infer keeps the kernels as islands; CPU proxy: interpret-mode
    kernels on the virtual mesh, detections equal to the single-device
    predictor's."""
    import numpy as np

    from maskrcnn_tf2_tpu.predictor import Predictor
    from maskrcnn_tf2_tpu.train.train_step import create_train_state

    monkeypatch.setenv("MASKRCNN_TPU_PALLAS", "interpret")
    monkeypatch.delenv("MASKRCNN_TPU_NMS", raising=False)
    monkeypatch.delenv("MASKRCNN_TPU_ROIALIGN", raising=False)

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rs = np.random.RandomState(3)
    imgs = [
        (rs.rand(60, 64, 3) * 255).astype(np.uint8)
        for _ in range(len(jax.devices()))
    ]

    single = Predictor(CFG, variables)
    dp = Predictor(CFG, variables, data_parallel=True)
    assert dp.num_devices == len(jax.devices())
    r1 = single.detect(imgs)
    r2 = dp.detect(imgs)
    assert len(r1) == len(r2) == len(imgs)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(a["rois"], b["rois"], rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(a["class_ids"], b["class_ids"])
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-4, atol=1e-5)
