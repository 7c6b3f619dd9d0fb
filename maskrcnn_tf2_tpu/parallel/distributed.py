"""Multi-host (multi-process) training wiring: DCN-spanning meshes.

The reference has no distributed backend at all (single-process Keras,
training.py:28-31); this module is where the TPU framework goes beyond it
(SURVEY §2.15/§5.8): ``jax.distributed.initialize`` brings up the JAX
runtime across hosts, the mesh then spans every device of every process
(gradient ``psum`` rides ICI within a slice and DCN across slices — XLA
routes the collectives; nothing NCCL/MPI-like to hand-roll), and each host
feeds only its own shard of the input pipeline
(``jax.make_array_from_process_local_data`` assembles the global batch).

Usage (per host):

    from maskrcnn_tf2_tpu.parallel import distributed as dist
    dist.initialize()                      # env-driven or explicit args
    mesh = dist.make_global_mesh()         # all devices, all processes
    loader = DataLoader(ds, cfg, process_index=jax.process_index(),
                        process_count=jax.process_count())
    global_batch = dist.form_global_batch(local_batch, mesh)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Bring up the multi-process JAX runtime (idempotent).

    Arguments default to the standard JAX env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``)
    or cloud-TPU auto-detection when none are set. Call before any other
    JAX API on every host.
    """
    # NB: must not touch jax.process_count()/jax.devices() here — that would
    # initialize the single-process backend before the distributed runtime.
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        # single-host run or TPU-pod auto-detect; initialize() with no args
        # is only valid on cloud TPU metadata environments.
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes
            if num_processes is not None
            else int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=process_id
            if process_id is not None
            else int(os.environ["JAX_PROCESS_ID"]),
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # idempotence: tolerate double-init only
        if "already" not in str(e).lower():
            raise


def client_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Align all processes via the distributed runtime's native KV barrier.

    Unlike gloo collective-context creation (a hard ~30 s key exchange at
    the FIRST execution of each device clique), this barrier tolerates
    arbitrary skew up to ``timeout_ms`` — use it to align processes before
    the first collective executes, so compile-time desync (minutes for the
    full train step) can never blow gloo's context-init window. No-op when
    the distributed runtime is not initialized (single-process)."""
    from jax._src import distributed as _dist_runtime

    client = getattr(_dist_runtime.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def host_shard(order: np.ndarray, process_index: int, process_count: int) -> np.ndarray:
    """This host's slice of a (shared-seed-shuffled) index order: strided
    ``index::count`` — deterministic, disjoint across hosts, load-balanced.
    Used by ``data.loader.DataLoader`` and asserted by the multihost dryrun."""
    return order[process_index::process_count]


def make_global_mesh(axis_name: str = "data") -> Mesh:
    """Mesh over every device of every process (DP axis spans ICI + DCN)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def form_global_batch(local_batch, mesh: Mesh, axis_name: str = "data"):
    """Assemble a globally-sharded batch from this host's local arrays.

    Each process passes its local shard (leading dim = local batch); the
    result is a global jax.Array of leading dim ``local * process_count``,
    sharded over ``axis_name`` — ready for the shard_map'd train step.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        local_batch,
    )


def replicate_global(tree, mesh: Mesh):
    """Replicate a (host-identical) pytree across all processes' devices."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )
        if not isinstance(x, jax.Array)
        else jax.device_put(x, sharding),
        tree,
    )
