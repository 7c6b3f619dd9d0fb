"""Optimizer factory (optax).

Covers the reference's ``get_optimizer`` zoo (training.py:151-177: adam,
adamax, adadelta, adagrad, sgd, rmsprop, ftrl) plus its gradient clipping
knobs (``clipvalue`` / ``clipnorm`` from optimizer_kwargs, config.py:144-149).
The learning rate is injected as a runtime hyperparameter so the
ReduceLROnPlateau-equivalent host logic (train.loop) can scale it without
recompiling.
"""

from __future__ import annotations

import optax

from maskrcnn_tf2_tpu.config import MaskRCNNConfig

_OPTIMIZERS = {
    "adam": optax.adam,
    "adamax": optax.adamax,
    "adadelta": optax.adadelta,
    "adagrad": optax.adagrad,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
}


def build_optimizer(config: MaskRCNNConfig) -> optax.GradientTransformation:
    name = config.optimizer.lower()
    if name not in _OPTIMIZERS:
        raise ValueError(
            f"unsupported optimizer '{name}'; available: {sorted(_OPTIMIZERS)}"
        )

    @optax.inject_hyperparams
    def make(learning_rate):
        chain = []
        if config.clipvalue is not None:
            chain.append(optax.clip(config.clipvalue))
        if config.clipnorm is not None:
            chain.append(optax.clip_by_global_norm(config.clipnorm))
        chain.append(_OPTIMIZERS[name](learning_rate))
        return optax.chain(*chain)

    return make(learning_rate=config.learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place in the optimizer state."""
    opt_state.hyperparams["learning_rate"] = type(
        opt_state.hyperparams["learning_rate"]
    )(lr)
    return opt_state
