"""GSPMD (XLA auto-partitioned) train/eval steps: DP x TP over a 2-D mesh.

The explicit path (``train_step.make_data_parallel_train_step``) shard_maps a
per-shard program and hand-places ONE fused gradient all-reduce. This module
is the complementary XLA-native recipe (the jax-ml scaling-book loop: pick a
mesh, annotate shardings, let XLA insert collectives): jit the UNMODIFIED
global-batch train step with ``in_shardings`` over a ``(data, model)`` mesh
and annotate the wide FC classifier-head parameters over the ``model`` axis.
The SPMD partitioner then runs the head's two big matmuls (the reference's
TimeDistributed 1024-wide FCs, mrcnn_layers.py:1124-1198) column- then
row-parallel with an all-reduce over ICI, and the rest of the graph
data-parallel along the batch dim.

Because the traced math is the global-batch program, BatchNorm statistics
are cross-replica by construction — gspmd mode has sync-BN semantics without
``config.sync_bn`` (which is a shard_map-path flag and must stay False here).

No reference equivalent: the reference is single-process single-GPU
(training.py:28-31); SURVEY §2.15 marks TP as the optional beat-the-reference
axis.

Routing guidance (measured, round 5): Pallas tpu_custom_calls have no SPMD
partitioning rule, so this path used to trace under ``no_pallas()`` and pay
+18% step time for the pure-XLA ROIAlign/NMS twins (98.0 -> 115.8 ms/step,
r50@512 b8, round 4). Both kernels are per-image independent, so the
``utils.platform.pallas_spmd`` scope now keeps them as ``shard_map``
islands over the data axis inside the partitioned program — measured
90.3 ms/step vs the plain single-device step's 90.1 (scripts/time_train.py
GSPMD=1 vs default, r50@512 b8, v5e): choosing gspmd for head-memory TP no
longer prices in a kernel downgrade. shard_map DP remains the default
scaling mode (one hand-placed fused all-reduce).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maskrcnn_tf2_tpu.config import MaskRCNNConfig


def make_mesh_2d(
    n_data: int,
    n_model: int,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """``(data, model)`` mesh: model-parallel groups on adjacent devices (the
    head all-reduce rides the shortest ICI hops; DP gradient reduction spans
    the slower outer dim, amortized once per step)."""
    devices = np.asarray(jax.devices()[: n_data * n_model]).reshape(
        n_data, n_model
    )
    return Mesh(devices, (data_axis, model_axis))


# Trailing-path patterns of the classifier head's sharded leaves, mapped to
# the PartitionSpec of the LOGICAL (full-size) array. Matching on trailing
# dict keys makes the same rule cover params, batch_stats, and every
# param-shaped optimizer-state mirror (optax mu/nu trees reuse the key names).
_TP_RULES: Tuple[Tuple[Tuple[str, ...], P], ...] = (
    # FC1: column-parallel — each shard owns fc/k output features
    (("mrcnn_class_conv1", "kernel"), P(None, "model")),
    (("mrcnn_class_conv1", "bias"), P("model")),
    # BN over FC1's sharded features is per-feature, so it shards with them
    (("mrcnn_class_bn1", "scale"), P("model")),
    (("mrcnn_class_bn1", "bias"), P("model")),
    (("mrcnn_class_bn1", "mean"), P("model")),
    (("mrcnn_class_bn1", "var"), P("model")),
    # FC2: row-parallel — consumes the sharded features, partial sums are
    # all-reduced by the partitioner
    (("mrcnn_class_conv2", "kernel"), P("model", None)),
)


def _path_keys(path) -> Tuple[str, ...]:
    keys = []
    for entry in path:
        name = getattr(entry, "key", None)
        if name is None:
            name = getattr(entry, "name", None)
        if name is not None:
            keys.append(str(name))
    return tuple(keys)


def _spec_for(path, leaf, model_axis: str) -> P:
    keys = _path_keys(path)
    for pattern, spec in _TP_RULES:
        k = len(pattern)
        if len(keys) >= k and tuple(keys[-k:]) == pattern:
            if getattr(leaf, "ndim", 0) != len(spec):
                return P()  # e.g. scalar optimizer bookkeeping under the name
            if model_axis != "model":
                spec = P(*[model_axis if s == "model" else s for s in spec])
            return spec
    return P()


def state_shardings(state, mesh: Mesh, config: MaskRCNNConfig):
    """NamedSharding pytree for a TrainState: everything replicated except
    the classifier-head FC leaves (and their optimizer mirrors), sharded
    over the ``model`` axis per _TP_RULES."""
    model_axis = config.mesh_model_axis

    def one(path, leaf):
        return NamedSharding(mesh, _spec_for(path, leaf, model_axis))

    return jax.tree_util.tree_map_with_path(one, state)


def place_state(state, mesh: Mesh, config: MaskRCNNConfig):
    """Device_put a host/replicated TrainState onto the 2-D mesh: the full
    (logical) head arrays are split into per-device slices here — exact
    full-shape initialization is preserved, unlike per-shard re-init."""
    return jax.device_put(state, state_shardings(state, mesh, config))


def make_gspmd_train_step(
    config: MaskRCNNConfig, mesh: Mesh, state, compiler_options=None
):
    """Returns ``(jitted_step, placed_state)``.

    The step function is the plain global-batch ``make_train_step(config)``
    — no axis_name, no explicit collectives; in/out shardings plus the SPMD
    partitioner supply DP (batch over ``data``) and TP (head over ``model``).
    """
    from maskrcnn_tf2_tpu.train.train_step import make_train_step

    assert not config.sync_bn, (
        "gspmd mode computes global-batch BN statistics by construction; "
        "config.sync_bn is the shard_map-path flag and must stay False"
    )
    step = make_train_step(config, axis_name=None)

    def step_kernels(*args):
        # Pallas tpu_custom_calls have no SPMD partitioning rule, but both
        # kernels are per-image independent: the pallas_spmd scope makes
        # their batched call sites shard_map islands over the data axis, so
        # the auto-partitioned program KEEPS them (the old no_pallas()
        # routing paid a measured +18% step, 98.0 -> 115.8 ms r50@512 b8).
        # The scope is active whenever jit TRACES (free at run time).
        from maskrcnn_tf2_tpu.utils.platform import pallas_spmd

        with pallas_spmd(mesh, config.mesh_data_axis):
            return step(*args)

    specs = state_shardings(state, mesh, config)
    batch_sharding = NamedSharding(mesh, P(config.mesh_data_axis))
    repl = NamedSharding(mesh, P())
    jstep = jax.jit(
        step_kernels,
        in_shardings=(specs, batch_sharding, repl),
        out_shardings=(specs, repl),
        compiler_options=compiler_options,
    )
    return jstep, jax.device_put(state, specs)


def make_gspmd_eval_step(
    config: MaskRCNNConfig, mesh: Mesh, state, compiler_options=None
):
    """Validation-loss step, partitioned the same way (state shardings are
    derived from the same rules; the batch shards over ``data``)."""
    from maskrcnn_tf2_tpu.train.train_step import make_eval_step

    step = make_eval_step(config, axis_name=None)

    def step_kernels(*args):
        from maskrcnn_tf2_tpu.utils.platform import pallas_spmd

        with pallas_spmd(mesh, config.mesh_data_axis):
            return step(*args)  # same rationale as make_gspmd_train_step

    specs = state_shardings(state, mesh, config)
    batch_sharding = NamedSharding(mesh, P(config.mesh_data_axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_kernels,
        in_shardings=(specs, batch_sharding, repl),
        out_shardings=repl,
        compiler_options=compiler_options,
    )


def shard_global_batch(batch, mesh: Mesh, config: MaskRCNNConfig):
    """Place a host batch dict sharded along the ``data`` axis (replicated
    over ``model``)."""
    sharding = NamedSharding(mesh, P(config.mesh_data_axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
