"""Localhost multi-host (multi-process) dryrun.

Validates the distributed wiring without a real multi-host slice: the
launcher spawns N worker processes of this module on one machine, each with
its own set of virtual CPU devices; the workers ``jax.distributed.initialize``
against a localhost coordinator, build a mesh spanning all processes, and

  1. assert per-host input sharding: every dataset index is owned by exactly
     ONE host (verified with a cross-process psum of one-hot ownership — a
     real collective over the process-spanning mesh, not a host-side check);
  2. run a shard_map step over the global mesh and check the all-reduced
     value equals the closed form;
  3. (``--full-model``) run the real data-parallel Mask R-CNN train step with
     the global batch assembled via ``form_global_batch`` and assert a
     finite loss.

Run directly:  ``python -m maskrcnn_tf2_tpu.parallel.multihost_dryrun``
(the launcher path; workers are spawned with ``--process-id``).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def worker(coordinator: str, num_processes: int, process_id: int,
           local_devices: int, full_model: bool) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)

    from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()  # N workers compile identical programs — share them

    from maskrcnn_tf2_tpu.parallel import distributed as dist

    dist.initialize(coordinator, num_processes, process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.devices()) == num_processes * local_devices, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = dist.make_global_mesh()

    # --- (1) per-host input sharding is a partition of the dataset ---
    n_images = 64
    rng = np.random.RandomState(0)  # every host shuffles with the SAME seed
    order = np.arange(n_images)
    rng.shuffle(order)
    mine = dist.host_shard(order, process_id, num_processes)
    ownership = np.zeros((n_images,), np.float32)
    ownership[mine] = 1.0
    # one ownership row per local device (replicated within host)
    local = np.tile(ownership, (local_devices, 1))
    global_counts = dist.form_global_batch({"own": local}, mesh)["own"]

    def count_owners(x):
        return jax.lax.psum(x, "data")  # [1, n_images] per shard -> summed

    counts = jax.jit(
        shard_map(
            count_owners, mesh=mesh, in_specs=P("data"), out_specs=P(),
            check_rep=False,
        )
    )(global_counts)
    counts = np.asarray(jax.device_get(counts))[0]
    # every index owned exactly once across hosts (devices within a host
    # replicate the host's row, hence the factor local_devices)
    np.testing.assert_array_equal(counts, np.full((n_images,), local_devices))

    # --- (2) collective arithmetic over the process-spanning mesh ---
    local_vals = np.full((local_devices, 1), float(process_id + 1), np.float32)
    gv = dist.form_global_batch({"v": local_vals}, mesh)["v"]
    total = jax.jit(
        shard_map(
            lambda x: jax.lax.psum(jnp.sum(x), "data"),
            mesh=mesh, in_specs=P("data"), out_specs=P(), check_rep=False,
        )
    )(gv)
    expect = local_devices * sum(range(1, num_processes + 1))
    assert float(total) == float(expect), (float(total), expect)

    # --- (3) the real DP train step across processes ---
    if full_model:
        from maskrcnn_tf2_tpu.ops.image import compose_image_meta
        from maskrcnn_tf2_tpu.train.train_step import (
            create_train_state,
            make_data_parallel_train_step,
        )
        import __graft_entry__

        cfg = __graft_entry__._flagship_config(tiny=True)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        state = dist.replicate_global(
            jax.tree.map(np.asarray, state), mesh
        )
        b_local = local_devices
        h, w, _ = cfg.image_shape
        g = cfg.max_gt_instances
        meta = compose_image_meta(
            0, (h, w, 3), (h, w, 3), (0, 0, h, w), 1.0, np.ones(cfg.num_classes)
        )
        local_batch = {
            "images": np.random.RandomState(process_id).randn(
                b_local, h, w, 3
            ).astype(np.float32),
            "image_meta": np.tile(np.asarray(meta, np.float32), (b_local, 1)),
            "gt_class_ids": np.ones((b_local, g), np.int32),
            "gt_boxes": np.tile(
                np.asarray([[0.1, 0.1, 0.5, 0.5]] * g, np.float32),
                (b_local, 1, 1),
            ),
            "gt_masks": np.ones((b_local, g, h, w), np.float32),
        }
        batch = dist.form_global_batch(local_batch, mesh)
        step = make_data_parallel_train_step(cfg, mesh)
        _, losses = step(state, batch, jax.random.PRNGKey(1))
        loss = float(jax.device_get(losses["loss_sum"]))
        assert np.isfinite(loss), losses
        if process_id == 0:
            print(f"multihost full-model step OK — loss_sum={loss:.4f}")

    if process_id == 0:
        print(
            f"multihost dryrun OK — {num_processes} processes x "
            f"{local_devices} devices, disjoint input shards, psum verified"
        )


def launch(num_processes: int = 2, local_devices: int = 4,
           full_model: bool = False, timeout: int = 1800) -> None:
    """Spawn the workers and wait; raises on any worker failure."""
    import socket

    with socket.socket() as s:  # pick a free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # device count is set in-process by workers
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "maskrcnn_tf2_tpu.parallel.multihost_dryrun",
                "--coordinator", coordinator,
                "--num-processes", str(num_processes),
                "--process-id", str(i),
                "--local-devices", str(local_devices),
            ]
            + (["--full-model"] if full_model else []),
            env=env,
        )
        for i in range(num_processes)
    ]
    fail = []
    for i, p in enumerate(procs):
        try:
            rc = p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            rc = -9
        if rc != 0:
            fail.append((i, rc))
    if fail:
        raise RuntimeError(f"multihost dryrun workers failed: {fail}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--full-model", action="store_true")
    args = ap.parse_args()
    if args.process_id is None:
        launch(args.num_processes, args.local_devices, args.full_model)
    else:
        worker(
            args.coordinator, args.num_processes, args.process_id,
            args.local_devices, args.full_model,
        )


if __name__ == "__main__":
    main()
