"""Orbax checkpointing.

Replaces Keras ModelCheckpoint weights-only best-only saving + filename-
parsed resume (reference training.py:105-125): one param/batch_stats/opt
pytree per checkpoint, step tracked in metadata, async-capable. Checkpoint
directory names embed backbone + config md5 like the reference's
``cp-{epoch}-{backbone}-{md5}`` convention.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import orbax.checkpoint as ocp

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.train.train_step import TrainState


def checkpoint_dir(config: MaskRCNNConfig, base: Optional[str] = None) -> str:
    base = base or config.checkpoints_dir
    return os.path.abspath(
        os.path.join(base, f"maskrcnn_{config.backbone}_{config.md5()[:8]}")
    )


def make_manager(config: MaskRCNNConfig, base: Optional[str] = None, max_to_keep: int = 3):
    path = checkpoint_dir(config, base)
    os.makedirs(path, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        best_fn=(lambda metrics: metrics.get("val_loss_sum", metrics.get("loss_sum", 0.0)))
        if config.save_best_only
        else None,
        best_mode="min" if config.save_best_only else "max",
    )
    # item_handlers: a FRESH manager (resume in a new process) cannot read
    # item_metadata without a registered handler — it returns None and resume
    # with an extra payload would break.
    return ocp.CheckpointManager(
        path, options=options, item_handlers=ocp.StandardCheckpointHandler()
    )


def make_preempt_manager(config: MaskRCNNConfig, base: Optional[str] = None):
    """Manager for preemption (partial-epoch) checkpoints — its own subdir,
    ``max_to_keep=1``, and crucially NO ``best_fn``: a preempted epoch's
    train-only loss mean over few steps must not compete in best-only
    ranking (it could be garbage-collected as non-best — silently losing the
    preempted progress — or spuriously evict a better checkpoint). Resume
    picks whichever of (main, preempt) manager has the later step."""
    path = os.path.join(checkpoint_dir(config, base), "preempt")
    os.makedirs(path, exist_ok=True)
    return ocp.CheckpointManager(
        path,
        options=ocp.CheckpointManagerOptions(max_to_keep=1),
        item_handlers=ocp.StandardCheckpointHandler(),
    )


def pick_resume_manager(manager, preempt_manager):
    """The manager holding the newest checkpoint. Ties go to the main
    manager (its epoch-e checkpoint saw the full epoch; the preempt one is
    partial)."""
    main_step = manager.latest_step()
    pre_step = preempt_manager.latest_step() if preempt_manager else None
    if pre_step is not None and (main_step is None or pre_step > main_step):
        return preempt_manager
    return manager


def save(manager, state: TrainState, epoch: int, metrics: dict, extra: Optional[dict] = None):
    """Save state (+ optional host-side ``extra`` payload, e.g. the LR
    plateau scheduler state, so resume reproduces the LR trajectory — the
    reference's ReduceLROnPlateau restarts from scratch on resume; we don't)."""
    payload = dict(state._asdict())
    if extra:
        payload["extra"] = {k: float(v) for k, v in extra.items()}
    manager.save(
        epoch,
        args=ocp.args.StandardSave(payload),
        metrics={k: float(v) for k, v in metrics.items()},
    )


def restore(
    manager,
    state: TrainState,
    step: Optional[int] = None,
    extra_template: Optional[dict] = None,
) -> Tuple[TrainState, int, Optional[dict]]:
    """Restore latest (or given) checkpoint into the state template.

    Returns (state, start_epoch, extra). With no checkpoint returns
    (state, 0, None). ``extra`` is None for checkpoints written without one.
    """
    target = step if step is not None else manager.latest_step()
    if target is None:
        return state, 0, None
    template = dict(state._asdict())
    if extra_template:
        # Ask the checkpoint whether it carries the extra payload instead of
        # trying and swallowing exceptions (which would also mask genuine
        # corruption / shape mismatches as "old checkpoint").
        meta = manager.item_metadata(target)
        # same-session managers return a dict-like; fresh ones a
        # StandardCheckpointMetadata whose pytree lives under .tree
        tree = getattr(meta, "tree", meta)
        saved_keys = set(tree.keys()) if tree is not None else set()
        if "extra" in saved_keys:
            template["extra"] = {
                k: float(v) for k, v in extra_template.items()
            }
            restored = manager.restore(
                target, args=ocp.args.StandardRestore(template)
            )
            extra = restored.pop("extra", None)
            return TrainState(**restored), int(target) + 1, extra
    restored = manager.restore(
        target, args=ocp.args.StandardRestore(dict(state._asdict()))
    )
    return TrainState(**restored), int(target) + 1, None
