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
    """ReduceLROnPlateau twin (reference training.py:126-130)."""

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

    manager = ckpt_lib.make_manager(config, checkpoint_base)
    start_epoch = 0
    if resume:
        state, start_epoch = ckpt_lib.restore(manager, state)

    train_loader = DataLoader(train_dataset, config, shuffle=True, augment_fn=augment_fn)
    spe = steps_per_epoch or train_loader.steps_per_epoch

    # Data-parallel over every visible device (the reference is single-GPU;
    # here DP is the default whenever a mesh exists).
    n_dev = len(jax.devices())
    if n_dev > 1 and config.batch_size % n_dev == 0:
        from maskrcnn_tf2_tpu.parallel.mesh import make_mesh, replicate, shard_batch
        from maskrcnn_tf2_tpu.train.train_step import make_data_parallel_train_step

        mesh = make_mesh(n_dev, config.mesh_data_axis)
        train_step = make_data_parallel_train_step(config, mesh)
        state = replicate(state, mesh)
        place = lambda b: shard_batch(b, mesh, config.mesh_data_axis)
        print(f"data-parallel over {n_dev} devices (axis '{config.mesh_data_axis}')")
    else:
        train_step = jax.jit(make_train_step(config))
        place = lambda b: b
    eval_step = jax.jit(make_eval_step(config))

    sched = PlateauScheduler(
        config.reduce_lr_factor, config.reduce_lr_patience, config.learning_rate
    )

    train_iter = prefetch(iter(train_loader), size=config.prefetch_size)
    global_step = start_epoch * spe
    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        agg: Dict[str, float] = {}
        for s in range(spe):
            if profile_steps and global_step == profile_steps[0]:
                jax.profiler.start_trace(ckpt_lib.checkpoint_dir(config, checkpoint_base))
            batch = place(jax.tree.map(jnp.asarray, next(train_iter)))
            state, losses = train_step(
                state, batch, jax.random.fold_in(rng, global_step)
            )
            if profile_steps and global_step == profile_steps[1]:
                jax.block_until_ready(losses)
                jax.profiler.stop_trace()
            global_step += 1
            if s % config.log_per_steps == 0:
                vals = {k: float(v) for k, v in losses.items()}
                for k, v in vals.items():
                    agg[k] = agg.get(k, 0.0) + v
                if metric_writer:
                    metric_writer(global_step, vals)

        # validation (reference test_step path)
        metrics = {k: v / max(1, spe // config.log_per_steps) for k, v in agg.items()}
        if val_dataset is not None:
            val_loader = DataLoader(val_dataset, config, shuffle=False)
            val_losses = []
            for vb in val_loader.epoch():
                vl = eval_step(state, jax.tree.map(jnp.asarray, vb), rng)
                val_losses.append({k: float(v) for k, v in vl.items()})
            if val_losses:
                for k in val_losses[0]:
                    metrics[f"val_{k}"] = float(np.mean([v[k] for v in val_losses]))

        monitor = metrics.get("val_loss_sum", metrics.get("loss_sum", 0.0))
        new_lr = sched.update(monitor)
        state = _set_lr(state, new_lr)

        ckpt_lib.save(manager, state, epoch, metrics)
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
