"""Jitted train/eval steps, single-chip and data-parallel (shard_map).

TPU-native replacement for the reference's **eager** Keras custom train loop
(``MaskRCNN.train_step``, model.py:137-180, compiled with
``run_eagerly=True`` at training.py:98): here the whole step — device-side
RPN target building, forward, 5 losses + L2, backward, optimizer update,
non-finite-guard — is one XLA program. Data parallelism is
``shard_map`` over the ``data`` mesh axis with a gradient ``psum``
(SURVEY §2.15: the reference has no distributed backend at all).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.losses import batchnorm_module_paths, compute_losses, l2_reg_loss
from maskrcnn_tf2_tpu.models import MaskRCNN
from maskrcnn_tf2_tpu.ops.anchors import get_anchors
from maskrcnn_tf2_tpu.ops.image import parse_image_meta
from maskrcnn_tf2_tpu.ops.targets import rpn_targets
from maskrcnn_tf2_tpu.train.optimizer import build_optimizer


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(config: MaskRCNNConfig, rng) -> TrainState:
    """Initialize model params + optimizer state."""
    model = MaskRCNN(config)
    h, w, c = config.image_shape
    dummy_images = jnp.zeros((1, h, w, c), jnp.float32)
    dummy_meta = jnp.zeros((1, config.meta_size), jnp.float32)
    g = config.max_gt_instances
    mh, mw = (
        config.mini_mask_shape if config.use_mini_masks else (h, w)
    )
    dummy_rois = (
        None
        if config.use_rpn_rois
        else jnp.zeros((1, config.random_rois or config.train_rois_per_image, 4))
    )
    variables = jax.jit(
        lambda r: model.init(
            {"params": r, "sampling": jax.random.fold_in(r, 1)},
            dummy_images,
            dummy_meta,
            jnp.zeros((1, g), jnp.int32),
            jnp.zeros((1, g, 4), jnp.float32),
            jnp.zeros((1, g, mh, mw), jnp.float32),
            input_rois=dummy_rois,
            train=True,
        )
    )(rng)
    if config.backbone_init_weights not in (None, "", "none", "random"):
        # the reference's ImageNet backbone init (resnet_models.py:292-297)
        from maskrcnn_tf2_tpu.models.backbones.pretrained import init_backbone_weights

        variables = dict(variables)
        variables, _ = init_backbone_weights(variables, config)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(config)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats, opt_state)


def _loss_and_updates(
    params,
    batch_stats,
    batch: Dict[str, jnp.ndarray],
    rng,
    config: MaskRCNNConfig,
    anchors: jnp.ndarray,
    augment: bool = False,
):
    model = MaskRCNN(config)
    rng_sample, rng_rpn, rng_aug = jax.random.split(rng, 3)
    if augment and config.augment_on_device:
        from maskrcnn_tf2_tpu.ops.augment import device_augment

        batch = device_augment(
            batch,
            rng_aug,
            flip=config.augment_flip,
            scale_jitter=config.augment_scale_jitter,
            photometric=config.augment_photometric,
        )
    b = batch["images"].shape[0]

    # Device-side RPN targets (the reference's CPU build_rpn_targets hot loop).
    rpn_tgt = jax.vmap(
        lambda r, ci, bx: rpn_targets(
            r,
            anchors,
            ci,
            bx,
            config.rpn_train_anchors_per_image,
            config.rpn_bbox_std_dev,
        ),
        in_axes=(0, 0, 0),
    )(jax.random.split(rng_rpn, b), batch["gt_class_ids"], batch["gt_boxes"])

    outputs, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["images"],
        batch["image_meta"],
        batch["gt_class_ids"],
        batch["gt_boxes"],
        batch["gt_masks"],
        input_rois=batch.get("input_rois"),  # use_rpn_rois=False path
        train=True,
        rngs={"sampling": rng_sample},
        mutable=["batch_stats"],
    )
    active = parse_image_meta(batch["image_meta"])["active_class_ids"]
    total, losses = compute_losses(
        outputs, rpn_tgt.match, rpn_tgt.deltas, active, config
    )
    frozen = tuple(
        name
        for flag, name in [
            (config.frozen_backbone, "backbone"),
            (config.frozen_rpn_model, "rpn"),
            (config.frozen_cls_head, "classifier"),
            (config.frozen_mask_head, "mask_head"),
        ]
        if flag
    )
    l2 = l2_reg_loss(
        params,
        config.weight_decay,
        config.l2_reg_batchnorm,
        skip_prefixes=frozen,
        bn_module_paths=batchnorm_module_paths(batch_stats),
    )
    losses["l2_loss"] = l2
    total = total + l2
    return total, (losses, mutated.get("batch_stats", batch_stats))


def fused_pmean(trees, axis_name: str):
    """pmean every leaf of ``trees`` (a tuple of pytrees) in ONE all-reduce.

    ``jax.lax.pmean`` on a pytree emits one all-reduce per leaf (~173 for
    grads + losses + batch_stats of a ResNet-FPN step). On TPU XLA's
    all-reduce combiner re-merges them, but each XLA:CPU collective is its
    own spin-wait rendezvous phase — with N virtual devices sharing one
    host core (the multichip dryrun) that turns a <10 s step into minutes
    and races the 60 s rendezvous kill (rendezvous.cc). Flattening to a
    single f32 vector is bit-equivalent for f32 leaves and costs only one
    concat+slice pass of HBM traffic.
    """
    leaves, treedef = jax.tree.flatten(trees)
    if not leaves:
        return trees
    shapes = [(l.shape, l.dtype) for l in leaves]
    flat = jnp.concatenate(
        [jnp.ravel(l).astype(jnp.float32) for l in leaves]
    )
    flat = jax.lax.pmean(flat, axis_name)
    out, off = [], 0
    for shape, dtype in shapes:
        n = 1
        for d in shape:
            n *= int(d)
        out.append(flat[off : off + n].reshape(shape).astype(dtype))
        off += n
    return jax.tree.unflatten(treedef, out)


def make_train_step(config: MaskRCNNConfig, axis_name: str | None = None):
    """Build the fused train step. If ``axis_name`` is set, gradients and
    metrics are psum-averaged over that mesh axis (call under shard_map)."""
    if config.quant_mode != "off":
        raise ValueError(
            "quant_mode is inference-only post-training quantization; "
            "train with quant_mode='off', then export/quantize.py"
        )
    tx = build_optimizer(config)
    anchors_np = get_anchors(config)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        if axis_name is not None:
            # Decorrelate sampling RNG across data-parallel shards.
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        anchors = jnp.asarray(anchors_np)
        # Multi-host preemption consensus flag (loop.py): a per-example f32
        # riding the sharded batch; its max joins the fused all-reduce below
        # (pmean > 0 <=> SOME host saw SIGTERM), so every host breaks at the
        # same step boundary and the collective preempt save can't deadlock.
        batch = dict(batch)
        preempt_in = batch.pop("preempt", None)
        grad_fn = jax.value_and_grad(_loss_and_updates, has_aux=True)
        (total, (losses, new_batch_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng, config, anchors, True
        )
        if preempt_in is not None:
            losses["preempt"] = jnp.max(preempt_in)
        if axis_name is not None:
            if not config.sync_bn:
                # Per-shard BN: running stats diverge across replicas, so
                # reconcile them here (~13 ms/step r50@512 b8 on v5e). With
                # sync-BN the normalization ITSELF uses cross-replica batch
                # statistics (BatchNorm axis_name psum), so the updated
                # running stats are already bit-identical on every shard
                # and that reduction would be pure overhead.
                grads, losses, new_batch_stats = fused_pmean(
                    (grads, losses, new_batch_stats), axis_name
                )
            else:
                grads, losses = fused_pmean((grads, losses), axis_name)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        # Non-finite guard (config.nonfinite_guard): skip the whole update
        # when the loss — or, in "full" mode, any optimizer update tensor —
        # is non-finite. "loss" is the reference's check_loss_nan semantics
        # (model.py:64-84) at O(1) cost; the "full" isfinite scan of every
        # update costs a full HBM pass (~20 ms/step r50@512 b8 on v5e).
        guard = config.nonfinite_guard
        if guard == "off":
            ok = jnp.bool_(True)
            new_state = TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_batch_stats,
                opt_state=new_opt_state,
            )
        else:
            ok = jnp.isfinite(total)
            if guard == "full":
                ok = ok & jnp.all(
                    jnp.asarray(
                        [jnp.all(jnp.isfinite(u)) for u in jax.tree.leaves(updates)]
                    )
                )
            pick = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(ok, a, b), new, old
            )
            new_state = TrainState(
                step=state.step + 1,
                params=pick(new_params, state.params),
                batch_stats=pick(new_batch_stats, state.batch_stats),
                opt_state=pick(new_opt_state, state.opt_state),
            )
        losses["grad_finite"] = ok.astype(jnp.float32)
        return new_state, losses

    return train_step


def make_eval_step(config: MaskRCNNConfig, axis_name: str | None = None):
    """Validation loss step (reference test_step, model.py:182-217 — same
    losses, no L2, no update). With ``axis_name`` losses are pmean-reduced
    over the data-parallel mesh axis (call under shard_map)."""
    anchors_np = get_anchors(config)

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        anchors = jnp.asarray(anchors_np)
        _, (losses, _) = _loss_and_updates(
            state.params, state.batch_stats, batch, rng, config, anchors
        )
        del losses["l2_loss"]
        if axis_name is not None:
            (losses,) = fused_pmean((losses,), axis_name)
        return losses

    return eval_step


# ---------------------------------------------------------------------------
# Data-parallel wiring
# ---------------------------------------------------------------------------

def make_data_parallel_train_step(
    config: MaskRCNNConfig, mesh: Mesh, compiler_options=None
):
    """shard_map'd train step: batch sharded over the ``data`` axis, state
    replicated, gradient all-reduce over ICI.

    ``compiler_options`` is forwarded to ``jax.jit`` — the multichip dryrun
    uses it to raise XLA:CPU's in-process collective rendezvous timeouts
    (20 s warn / 40 s SIGABRT by default), which otherwise race against the
    serial execution of N virtual device threads on one host core.
    """
    axis = config.mesh_data_axis
    step_fn = make_train_step(config, axis_name=axis)

    from jax.experimental.shard_map import shard_map

    state_spec = P()  # replicated
    batch_spec = P(axis)  # shard leading batch dim
    rng_spec = P()

    sharded = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(state_spec, batch_spec, rng_spec),
        out_specs=(state_spec, state_spec),
        check_rep=False,
    )
    return jax.jit(sharded, compiler_options=compiler_options)


def make_data_parallel_eval_step(
    config: MaskRCNNConfig, mesh: Mesh, compiler_options=None
):
    """shard_map'd validation step: batch sharded over the ``data`` axis,
    per-shard losses pmean-reduced (the mesh does real work during eval
    instead of every device recomputing the replicated batch)."""
    axis = config.mesh_data_axis
    step_fn = make_eval_step(config, axis_name=axis)

    from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(),
        check_rep=False,
    )
    return jax.jit(sharded, compiler_options=compiler_options)
