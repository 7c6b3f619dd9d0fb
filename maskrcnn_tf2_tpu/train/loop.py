"""Training loop driver — the ``train_model`` equivalent (training.py:11-177).

Capabilities mapped from the reference:
  * Keras ``fit`` epochs/steps      -> explicit epoch loop over jitted steps
  * ModelCheckpoint (best-only)     -> orbax CheckpointManager (checkpoint.py)
  * ReduceLROnPlateau (0.98 / 10)   -> host-side plateau tracker scaling the
                                       injected learning-rate hyperparameter
  * TensorBoard scalars             -> metric writer hook (callable) +
                                       optional jax.profiler trace
  * resume from ckpt filename epoch -> orbax step metadata
  * multiprocessing worker queue    -> background-thread device prefetch
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.data.loader import DataLoader, prefetch
from maskrcnn_tf2_tpu.train import checkpoint as ckpt_lib
from maskrcnn_tf2_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)


class PlateauScheduler:
    """ReduceLROnPlateau twin (reference training.py:126-130).

    Its state round-trips through the orbax checkpoint (``state_dict`` /
    ``load_state_dict``) so a resumed run continues the exact LR trajectory
    instead of resetting to ``config.learning_rate``.
    """

    def __init__(self, factor: float, patience: int, base_lr: float):
        self.factor = factor
        self.patience = patience
        self.lr = base_lr
        self.best = float("inf")
        self.bad_epochs = 0

    def update(self, metric: float) -> float:
        if metric < self.best - 1e-7:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr

    def state_dict(self) -> Dict[str, float]:
        return {"lr": self.lr, "best": self.best, "bad_epochs": float(self.bad_epochs)}

    def load_state_dict(self, d: Dict[str, float]):
        self.lr = float(d["lr"])
        self.best = float(d["best"])
        self.bad_epochs = int(d["bad_epochs"])


def _set_lr(state: TrainState, lr: float) -> TrainState:
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state._replace(opt_state=state.opt_state._replace(hyperparams=hp))


def train_model(
    config: MaskRCNNConfig,
    train_dataset,
    val_dataset=None,
    state: Optional[TrainState] = None,
    augment_fn=None,
    metric_writer: Optional[Callable[[int, Dict[str, float]], None]] = None,
    checkpoint_base: Optional[str] = None,
    profile_steps: Optional[tuple] = None,
    resume: bool = True,
    steps_per_epoch: Optional[int] = None,
    rng_seed: int = 0,
) -> TrainState:
    """Train for ``config.epochs`` epochs; returns the final TrainState."""
    from maskrcnn_tf2_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    if config.debug_nans:
        # opt-in NaN sanitizer (aux subsystem; reference has only the
        # check_loss_nan guard, model.py:64-84)
        jax.config.update("jax_debug_nans", True)
    rng = jax.random.PRNGKey(rng_seed)
    if state is None:
        state = create_train_state(config, rng)
    if jax.process_count() > 1:
        # create_train_state's compile can desync hosts by minutes (compile
        # cache races); re-align on the distributed client's KV barrier
        # BEFORE orbax's first collective (gloo clique creation tolerates
        # only ~30 s of skew at first execution).
        from maskrcnn_tf2_tpu.parallel.distributed import client_barrier

        client_barrier("train_model_state_init")

    sched = PlateauScheduler(
        config.reduce_lr_factor, config.reduce_lr_patience, config.learning_rate
    )
    manager = ckpt_lib.make_manager(config, checkpoint_base)
    pre_manager = ckpt_lib.make_preempt_manager(config, checkpoint_base)
    start_epoch = 0
    if resume:
        # Preemption checkpoints live in their own (non-best-ranked) manager;
        # resume from whichever holds the newest step.
        state, start_epoch, extra = ckpt_lib.restore(
            ckpt_lib.pick_resume_manager(manager, pre_manager),
            state,
            extra_template=sched.state_dict(),
        )
        if extra is not None:
            sched.load_state_dict(extra)
            state = _set_lr(state, sched.lr)

    n_proc = jax.process_count()
    train_loader = DataLoader(
        train_dataset,
        config,
        shuffle=True,
        augment_fn=augment_fn,
        process_index=jax.process_index(),
        process_count=n_proc,
    )

    # Data-parallel over every visible device, across ALL processes when the
    # runtime is multi-host (the reference is single-GPU; here DP is the
    # default whenever a mesh exists; gradient psum rides ICI intra-slice and
    # DCN across slices).
    n_dev = len(jax.devices())
    consensus_fn = None  # multi-host preemption consensus (set below)
    if (
        config.parallel_mode == "gspmd"
        and n_dev > 1
        and n_proc == 1
        and config.batch_size % max(n_dev // config.tp_shards, 1) == 0
    ):
        # XLA-partitioned DP x TP over a (data, model) mesh (parallel/gspmd.py):
        # the global-batch step is jitted with in_shardings; the partitioner
        # inserts the collectives (incl. the TP all-reduce of the wide FC head).
        from maskrcnn_tf2_tpu.parallel.gspmd import (
            make_gspmd_eval_step,
            make_gspmd_train_step,
            make_mesh_2d,
            shard_global_batch,
        )

        tp = config.tp_shards
        assert n_dev % tp == 0, (n_dev, tp)
        mesh = make_mesh_2d(
            n_dev // tp, tp, config.mesh_data_axis, config.mesh_model_axis
        )
        train_step, state = make_gspmd_train_step(config, mesh, state)
        eval_step = make_gspmd_eval_step(config, mesh, state)
        place = lambda b: shard_global_batch(b, mesh, config)
        print(
            f"gspmd over {n_dev} devices: mesh "
            f"({config.mesh_data_axis}={n_dev // tp}, "
            f"{config.mesh_model_axis}={tp})"
        )
    elif n_dev > 1 and config.batch_size % n_dev == 0:
        from maskrcnn_tf2_tpu.parallel.mesh import make_mesh, replicate, shard_batch
        from maskrcnn_tf2_tpu.train.train_step import (
            make_data_parallel_eval_step,
            make_data_parallel_train_step,
        )

        from maskrcnn_tf2_tpu.utils.platform import cpu_collective_compiler_options

        mesh = make_mesh(n_dev, config.mesh_data_axis)
        # On CPU runtimes (virtual-device dryruns, localhost multi-process),
        # collective steps need relaxed rendezvous timeouts + single-thread
        # Eigen (see utils/platform.py); empty dict on TPU.
        train_step = make_data_parallel_train_step(
            config, mesh, compiler_options=cpu_collective_compiler_options() or None
        )
        eval_step = make_data_parallel_eval_step(
            config, mesh, compiler_options=cpu_collective_compiler_options() or None
        )
        if n_proc > 1:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            from maskrcnn_tf2_tpu.parallel import distributed as dist

            state = dist.replicate_global(state, mesh)
            place = lambda b: dist.form_global_batch(b, mesh, config.mesh_data_axis)

            # Epoch-boundary preemption consensus: a pmax of per-host flags
            # over the SAME mesh/collective path the train step uses (the
            # jax.experimental.multihost_utils communicator is a separate
            # gloo clique that fails to establish on CPU multi-process
            # runtimes where shard_map collectives work fine).
            axis = config.mesh_data_axis
            _consensus = jax.jit(
                shard_map(
                    lambda x: jax.lax.pmax(jnp.max(x), axis),
                    mesh=mesh, in_specs=P(axis), out_specs=P(),
                    check_rep=False,
                )
            )

            def consensus_fn(hit: bool) -> bool:
                local = np.full(
                    (len(jax.local_devices()),), 1.0 if hit else 0.0, np.float32
                )
                g = dist.form_global_batch({"f": local}, mesh, axis)["f"]
                return float(jax.device_get(_consensus(g))) > 0.0

        else:
            state = replicate(state, mesh)
            place = lambda b: shard_batch(b, mesh, config.mesh_data_axis)
        if jax.process_index() == 0:
            print(
                f"data-parallel over {n_dev} devices / {n_proc} processes "
                f"(axis '{config.mesh_data_axis}')"
            )
    else:
        train_step = jax.jit(make_train_step(config))
        eval_step = jax.jit(make_eval_step(config))
        place = lambda b: b

    # Preemption-safe checkpointing (aux subsystem the reference lacks —
    # its only recovery is manual resume, training.py:105-111): TPU VMs get
    # SIGTERM ahead of maintenance/preemption; checkpoint after the in-flight
    # step and return cleanly so `resume=True` continues from here. The save
    # goes through the dedicated preempt manager (no best-only ranking — see
    # checkpoint.make_preempt_manager). Multi-host: the locally-seen signal
    # rides the sharded batch as a f32 flag whose max joins the step's fused
    # all-reduce (train_step.py), so EVERY host sees the same consensus value
    # for the same step, breaks at the same boundary, and the collective save
    # proceeds without deadlock even when only one host got the signal.
    import signal as _signal

    # 'hit' = SIGTERM seen locally (set by the handler); 'stop' = the actual
    # break decision. In multi-host mode 'stop' may ONLY come from the
    # all-reduced consensus — a host breaking on its local flag would run a
    # different collective sequence than its peers (observed: gloo 'Received
    # data size doesn't match expected size', 4-byte pmax vs 1 MB fused
    # all-reduce) and crash the job.
    preempt = {"hit": False, "stop": False}
    _prev_handlers = {}

    def _mark_preempt(signum, frame):
        preempt["hit"] = True
        print(f"signal {signum}: checkpointing after the in-flight step")

    for _sig in (_signal.SIGTERM,):
        try:
            _prev_handlers[_sig] = _signal.signal(_sig, _mark_preempt)
            # SA_RESTART: python's default installs the handler WITHOUT it,
            # so a SIGTERM arriving while the main thread is blocked inside
            # a native collective read (fetching losses blocks on the gloo
            # all-reduce) delivers EINTR into gloo, which throws
            # gloo::EnforceNotMet -> std::terminate (observed SIGABRT in the
            # 2-process preemption drill). With SA_RESTART the python-level
            # handler still runs on delivery; the interrupted syscall is
            # resumed instead of failing.
            _signal.siginterrupt(_sig, False)
        except ValueError:  # not the main thread
            pass

    def _restore_handlers():
        for _sig, _h in _prev_handlers.items():
            _signal.signal(_sig, _h)

    global_step = start_epoch * (steps_per_epoch or train_loader.steps_per_epoch)
    try:
        state = _epoch_loop(
            config, state, train_loader, val_dataset, train_step, eval_step,
            place, manager, pre_manager, sched, metric_writer, profile_steps,
            checkpoint_base, steps_per_epoch, rng, start_epoch, global_step,
            n_proc, preempt, consensus_fn,
        )
    finally:
        # Always un-install the SIGTERM handler — a raise inside the loop
        # must not leave a no-op handler swallowing SIGTERMs in long-lived
        # host processes (notebooks, serving wrappers).
        _restore_handlers()
    return state


def _epoch_loop(
    config, state, train_loader, val_dataset, train_step, eval_step, place,
    manager, pre_manager, sched, metric_writer, profile_steps,
    checkpoint_base, steps_per_epoch, rng, start_epoch, global_step,
    n_proc, preempt, consensus_fn,
):
    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        # Device-side per-step loss accumulation: exact epoch means with no
        # host sync inside the step loop (one sync at epoch end).
        agg_dev = None
        spe = 0
        # An "epoch" is one full pass over the dataset: the loader's epoch()
        # iterator defines the boundary (instance-less images are skipped and
        # the ragged tail dropped, so the step count is measured, not
        # floor(n/batch) — the reference's endless .repeat() stream lets
        # epoch e consume epoch e+1's images; this does not).
        # Multi-host: steps are cross-process collectives, so every host MUST
        # run the same number of them — pin the per-epoch count to the
        # deterministic global steps_per_epoch and let each host cycle its
        # shard to fill it (per-host skip/tail differences would otherwise
        # deadlock the job at the epoch boundary).
        fixed = (
            (steps_per_epoch or train_loader.steps_per_epoch)
            if n_proc > 1
            else None
        )
        epoch_iter = prefetch(
            train_loader.epoch(fixed_steps=fixed), size=config.prefetch_size
        )
        # Multi-host preempt consensus flag from the PREVIOUS step: fetching
        # the current step's all-reduced flag would host-sync every step and
        # serialize dispatch (no async pipelining, ADVICE r4). The one-step
        # fetch delay costs one extra step of preemption-stop latency; every
        # host applies the same delay, so all still break at the same
        # boundary, and a flag raised on the epoch's LAST step is caught by
        # the epoch-boundary consensus pmax below.
        pending_preempt = None
        for batch_np in epoch_iter:
            if steps_per_epoch and spe >= steps_per_epoch:
                break
            if profile_steps and global_step == profile_steps[0]:
                jax.profiler.start_trace(ckpt_lib.checkpoint_dir(config, checkpoint_base))
            if n_proc > 1:
                # Multi-host preemption consensus: the locally-seen SIGTERM
                # rides the sharded batch; its pmean comes back in `losses`
                # (fused into the step's single all-reduce, train_step.py).
                batch_np = dict(batch_np)
                batch_np["preempt"] = np.full(
                    (batch_np["images"].shape[0],),
                    1.0 if preempt["hit"] else 0.0,
                    np.float32,
                )
            batch = place(jax.tree.map(jnp.asarray, batch_np))
            step_rng = jax.random.fold_in(rng, global_step)
            if n_proc > 1 and epoch == start_epoch and spe == 0:
                # Compile the step, THEN align hosts, THEN execute: the first
                # execution creates the cross-process gloo clique, whose key
                # exchange has a hard ~30 s window the multi-minute compile
                # desync must not eat into (see distributed.client_barrier).
                from maskrcnn_tf2_tpu.parallel.distributed import client_barrier

                train_step = train_step.lower(state, batch, step_rng).compile()
                client_barrier("train_model_first_step")
            state, losses = train_step(state, batch, step_rng)
            if n_proc > 1:
                # pmean > 0 <=> SOME host flagged. Fetch the previous step's
                # flag (already resolved on device — a free host read) and
                # keep this step's on device, preserving async dispatch.
                losses = dict(losses)
                flag = losses.pop("preempt")
                if pending_preempt is not None and float(pending_preempt) > 0:
                    preempt["stop"] = True
                pending_preempt = flag
            if profile_steps and global_step == profile_steps[1]:
                jax.block_until_ready(losses)
                jax.profiler.stop_trace()
            global_step += 1
            spe += 1
            agg_dev = (
                losses
                if agg_dev is None
                else jax.tree.map(jnp.add, agg_dev, losses)
            )
            if metric_writer and spe % config.log_per_steps == 0:
                metric_writer(global_step, {k: float(v) for k, v in losses.items()})
            if n_proc == 1 and preempt["hit"]:
                # Single-process: the local flag decides directly — checked
                # LAST in the iteration so a signal arriving inside
                # metric_writer still stops after this very step.
                preempt["stop"] = True
            if preempt["stop"]:
                break

        metrics = (
            {k: float(v) / spe for k, v in agg_dev.items()} if agg_dev else {}
        )
        if not preempt["stop"]:
            # Epoch-boundary check: a SIGTERM landing on the LAST step of an
            # epoch never rode a batch, so the in-step decision can't have
            # fired. Multi-host: consensus pmax (every host calls it at the
            # same point — without it, only the signaled host would take the
            # preempt branch and the others would deadlock at the next
            # collective). Single-process: the local flag decides directly.
            preempt["stop"] = (
                consensus_fn(preempt["hit"]) if consensus_fn is not None
                else preempt["hit"]
            )
        if preempt["stop"]:
            # Partial-epoch save: keeps every optimizer step taken so far;
            # resume starts at the next epoch (the remainder of this data
            # pass is the price of the preemption, not redone work). Saved
            # via the dedicated preempt manager so it never competes in
            # best-only ranking (and can't be GC'd as "non-best"). In
            # multi-host mode every host reached this point at the same step
            # (consensus above), so the collective save completes.
            ckpt_lib.save(pre_manager, state, epoch, metrics, extra=sched.state_dict())
            pre_manager.wait_until_finished()
            print(f"preempted at epoch {epoch + 1} step {spe}: checkpoint saved")
            return state
        # validation (reference test_step path); DP-sharded when a mesh exists
        if val_dataset is not None:
            val_loader = DataLoader(
                val_dataset,
                config,
                shuffle=False,
                process_index=jax.process_index(),
                process_count=n_proc,
            )
            # Same common-step-count rule as the train loop (deterministic
            # from the global val length, so all hosts agree — including on
            # skipping validation entirely when the val set is too small).
            val_fixed = val_loader.steps_per_epoch if n_proc > 1 else None
            # Device-side aggregation (same as the train loop): one host
            # sync AFTER the last batch instead of a blocking float() fetch
            # per eval batch.
            val_agg, val_n = None, 0
            if not (n_proc > 1 and val_fixed == 0):
                for vb in val_loader.epoch(fixed_steps=val_fixed):
                    vl = eval_step(
                        state, place(jax.tree.map(jnp.asarray, vb)), rng
                    )
                    val_agg = (
                        vl
                        if val_agg is None
                        else jax.tree.map(jnp.add, val_agg, vl)
                    )
                    val_n += 1
            if val_agg is not None:
                for k, v in val_agg.items():
                    metrics[f"val_{k}"] = float(v) / val_n

        monitor = metrics.get("val_loss_sum", metrics.get("loss_sum", 0.0))
        new_lr = sched.update(monitor)
        state = _set_lr(state, new_lr)

        ckpt_lib.save(manager, state, epoch, metrics, extra=sched.state_dict())
        dt = time.time() - t0
        ips = spe * config.batch_size / dt
        print(
            f"epoch {epoch + 1}/{config.epochs} "
            f"loss={metrics.get('loss_sum', float('nan')):.4f} "
            + (f"val_loss={metrics['val_loss_sum']:.4f} " if "val_loss_sum" in metrics else "")
            + f"lr={new_lr:.2e} {ips:.2f} img/s"
        )
    manager.wait_until_finished()
    return state
