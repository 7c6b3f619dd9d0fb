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


def preempt_worker(coordinator: str, num_processes: int, process_id: int,
                   local_devices: int, workdir: str) -> None:
    """Multi-host preemption drill (VERDICT r3 next #6): SIGTERM ONE host of
    a multi-process train_model run; the flag rides the fused all-reduce
    (train_step.py) + the epoch-boundary allgather (loop.py), so EVERY host
    must break at the same step, the collective preempt save must complete,
    and resume must find it."""
    import os
    import signal

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)

    from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    from maskrcnn_tf2_tpu.parallel import distributed as dist

    dist.initialize(coordinator, num_processes, process_id)
    assert jax.process_count() == num_processes

    # Establish the gloo collective context NOW, while the workers are still
    # aligned: context creation has a 30 s key-value exchange that must not
    # race the multi-minute compile desync inside train_model (observed:
    # 'Gloo context initialization failed: DEADLINE_EXCEEDED' when the first
    # cross-process collective was orbax's directory barrier). Uses the same
    # shard_map-psum path as the train step — multihost_utils' own
    # communicator fails with TCP connect timeouts on this runtime.
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    warm_mesh = dist.make_global_mesh()
    gv = dist.form_global_batch(
        {"v": np.ones((local_devices, 1), np.float32)}, warm_mesh
    )["v"]
    warm = jax.jit(
        shard_map(
            lambda x: jax.lax.psum(jnp.sum(x), "data"),
            mesh=warm_mesh, in_specs=P("data"), out_specs=P(), check_rep=False,
        )
    ).lower(gv).compile()
    # Compile BEFORE the barrier, execute right after it: gloo clique
    # creation (first execution) has a hard ~30 s key-exchange window that
    # compile-time desync must not eat into.
    dist.client_barrier("preempt_drill_warm")
    total = warm(gv)
    assert float(total) == num_processes * local_devices, float(total)
    # Also establish the one-device-per-process clique multihost_utils /
    # orbax barriers use, while still aligned.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("preempt_drill_host_clique")

    import dataclasses

    import __graft_entry__

    from maskrcnn_tf2_tpu.data.synthetic import SyntheticShapesDataset
    from maskrcnn_tf2_tpu.train import checkpoint as ckpt_lib
    from maskrcnn_tf2_tpu.train.loop import train_model

    n_dev = num_processes * local_devices
    cfg = dataclasses.replace(
        __graft_entry__._flagship_config(tiny=True),
        image_min_dim=64,  # the tiny config's image_shape is 64^2; pin the
        image_max_dim=64,  # loader's resize to it (dryrun feeds manually)
        batch_size=n_dev,
        epochs=2,
        checkpoints_dir=workdir,
        log_per_steps=1,
        prefetch_size=1,
    )
    ds = SyntheticShapesDataset()
    ds.load_shapes(4 * n_dev, 64, 64, seed=3)  # 4 global steps per epoch
    ds.prepare()

    fired = {"n": 0}

    def writer(step, metrics):
        # only host 1 is "preempted", mid-epoch (after its 2nd step).
        # Deliver to the MAIN thread: process-wide os.kill lets the kernel
        # pick any thread, and a SIGTERM landing on a gloo IO thread aborts
        # the process (EINTR inside a blocking read -> gloo::EnforceNotMet
        # -> std::terminate, observed). Real TPU runtimes have no gloo
        # threads; what this drill tests is the consensus + collective-save
        # protocol, which is delivery-thread-agnostic.
        import threading

        fired["n"] += 1
        if process_id == 1 and fired["n"] == 2:
            signal.pthread_kill(threading.main_thread().ident, signal.SIGTERM)

    state = train_model(cfg, ds, metric_writer=writer, resume=False)
    assert int(state.step) >= 2

    manager = ckpt_lib.make_manager(cfg)
    pre_manager = ckpt_lib.make_preempt_manager(cfg)
    assert pre_manager.latest_step() == 0, pre_manager.latest_step()
    assert manager.latest_step() is None, manager.latest_step()
    # clean resume from the preempt checkpoint
    src = ckpt_lib.pick_resume_manager(manager, pre_manager)
    assert src is pre_manager
    from maskrcnn_tf2_tpu.train.train_step import create_train_state

    template = create_train_state(cfg, jax.random.PRNGKey(0))
    template = dist.replicate_global(
        jax.tree.map(lambda x: __import__("numpy").asarray(x), template),
        dist.make_global_mesh(),
    )
    restored, start_epoch, _ = ckpt_lib.restore(
        src, template,
        extra_template={"lr": 0.0, "best": 0.0, "bad_epochs": 0.0},
    )
    assert start_epoch == 1, start_epoch
    assert int(jax.device_get(restored.step)) == int(state.step)
    if process_id == 0:
        print(f"multihost preempt drill OK — all {num_processes} hosts "
              f"checkpointed at step {int(state.step)}, resume at epoch 1")


def launch(num_processes: int = 2, local_devices: int = 4,
           full_model: bool = False, timeout: int = 1800,
           preempt_workdir: str | None = None) -> None:
    """Spawn the workers and wait; raises on any worker failure.
    ``preempt_workdir`` switches workers to the preemption drill."""
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
            + (["--full-model"] if full_model else [])
            + (["--preempt-workdir", preempt_workdir] if preempt_workdir else []),
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
    ap.add_argument("--preempt-workdir", default=None)
    args = ap.parse_args()
    if args.process_id is None:
        launch(args.num_processes, args.local_devices, args.full_model,
               preempt_workdir=args.preempt_workdir)
    elif args.preempt_workdir:
        preempt_worker(
            args.coordinator, args.num_processes, args.process_id,
            args.local_devices, args.preempt_workdir,
        )
    else:
        worker(
            args.coordinator, args.num_processes, args.process_id,
            args.local_devices, args.full_model,
        )


if __name__ == "__main__":
    main()
