"""Optimizer factory (optax).

Covers the reference's ``get_optimizer`` zoo (training.py:151-177: adam,
adamax, adadelta, adagrad, sgd, rmsprop, ftrl) plus its gradient clipping
knobs (``clipvalue`` / ``clipnorm`` from optimizer_kwargs, config.py:144-149).
The learning rate is injected as a runtime hyperparameter so the
ReduceLROnPlateau-equivalent host logic (train.loop) can scale it without
recompiling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from maskrcnn_tf2_tpu.config import MaskRCNNConfig


class FtrlState(NamedTuple):
    n: optax.Updates  # accumulated squared gradients
    z: optax.Updates  # linear term


def ftrl(
    learning_rate: float,
    learning_rate_power: float = -0.5,
    l1: float = 0.0,
    l2: float = 0.0,
) -> optax.GradientTransformation:
    """FTRL-proximal (McMahan et al.) — optax has no built-in; the reference
    exposes tf.keras Ftrl in its optimizer zoo (training.py:151-177)."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return FtrlState(n=zeros, z=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        assert params is not None, "ftrl requires params"

        def per_leaf(g, n, z, p):
            g = g.astype(jnp.float32)
            n_new = n + g * g
            sigma = (n_new**-learning_rate_power - n**-learning_rate_power) / learning_rate
            z_new = z + g - sigma * p.astype(jnp.float32)
            denom = n_new**-learning_rate_power / learning_rate + 2.0 * l2
            p_new = jnp.where(
                jnp.abs(z_new) <= l1,
                0.0,
                -(z_new - jnp.sign(z_new) * l1) / denom,
            )
            return p_new.astype(p.dtype) - p, n_new, z_new

        out = jax.tree.map(per_leaf, grads, state.n, state.z, params)
        updates = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple))
        n = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple))
        z = jax.tree.map(lambda t: t[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return updates, FtrlState(n=n, z=z)

    return optax.GradientTransformation(init, update)


_OPTIMIZERS = {
    "adam": optax.adam,
    "adamax": optax.adamax,
    "adadelta": optax.adadelta,
    "adagrad": optax.adagrad,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "ftrl": ftrl,
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
