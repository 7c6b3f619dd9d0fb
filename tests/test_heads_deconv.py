"""_DeconvS2D == nn.ConvTranspose((2,2), strides (2,2)) with shared params.

The mask head's TPU path rewrites the deconv as one dot + depth-to-space
(models/heads.py::_DeconvS2D); this pins exact-math equivalence (f32) and
param-tree compatibility, forward AND gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from maskrcnn_tf2_tpu.models.heads import _DeconvS2D


def _pair(c=24, f=16):
    ref = nn.ConvTranspose(f, (2, 2), strides=(2, 2), dtype=jnp.float32)
    new = _DeconvS2D(f, dtype=jnp.float32)
    return ref, new


def test_deconv_s2d_matches_conv_transpose_forward(rng):
    ref, new = _pair()
    x = jnp.asarray(rng.randn(3, 14, 14, 24).astype(np.float32))
    variables = ref.init(jax.random.PRNGKey(0), x)
    # identical param tree -> the SAME variables drive both modules
    assert variables["params"]["kernel"].shape == (2, 2, 24, 16)
    assert variables["params"]["bias"].shape == (16,)
    a = ref.apply(variables, x)
    b = new.apply(variables, x)
    assert b.shape == (3, 28, 28, 16)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5)


def test_deconv_s2d_matches_conv_transpose_grad(rng):
    ref, new = _pair()
    x = jnp.asarray(rng.randn(2, 7, 7, 24).astype(np.float32))
    variables = ref.init(jax.random.PRNGKey(1), x)

    def loss(m, v, x):
        y = m.apply(v, x)
        return jnp.sum(jnp.sin(y))

    ga = jax.grad(lambda v, x: loss(ref, v, x), argnums=(0, 1))(variables, x)
    gb = jax.grad(lambda v, x: loss(new, v, x), argnums=(0, 1))(variables, x)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)
