"""Backbone zoo: all 25 reference keys build and emit C1..C5 with correct
strides (the reference's backbone matrix, models_factory.py:10-61 +
_effnet_mapping)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tf2_tpu.models import backbone_names, get_backbone

ALL_NAMES = backbone_names()
# Heavy variants get a smoke pass only in the "fast" list below; the full
# matrix still builds shapes via init with tiny inputs.
FAST = [
    "resnet18",
    "seresnet18",
    "resnext50",
    "seresnext50",
    "senet154",
    "mobilenet",
    "mobilenetv2",
    "efficientnetb0",
]


def test_zoo_has_25_backbones():
    assert len(ALL_NAMES) == 25, ALL_NAMES


@pytest.mark.parametrize("name", FAST)
def test_backbone_endpoints_and_strides(name):
    from jit_fast import jit_fast  # tests/ is on sys.path under pytest

    model = get_backbone(name, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32))

    if name == "senet154":
        # measured outlier: one fused jit of this graph compiles slower
        # (54 s) than eager per-op dispatch runs (20 s) — giant op count
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, train_bn=False)
        out = model.apply(variables, x, train_bn=False)
    else:
        # real init + forward — ONE jitted graph (eager per-op dispatch on
        # CPU was ~40 s for efficientnet; a single fast-compile jit is
        # several times quicker and exercises the same code)
        @jit_fast
        def fwd(r):
            variables = model.init({"params": r}, x, train_bn=False)
            return model.apply(variables, x, train_bn=False)

        out = fwd(jax.random.PRNGKey(0))
    assert set(out) == {"C1", "C2", "C3", "C4", "C5"}
    for i, key in enumerate(["C1", "C2", "C3", "C4", "C5"]):
        expected = 64 // (2 ** (i + 1))
        assert out[key].shape[1] == expected, (name, key, out[key].shape)
    assert np.isfinite(np.asarray(out["C5"], dtype=np.float32)).all()


@pytest.mark.parametrize("name", [n for n in ALL_NAMES if n not in FAST])
def test_backbone_shapes_abstract(name):
    """Shape-only (eval_shape) check for the heavy variants — no FLOPs."""
    model = get_backbone(name, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda r: model.init({"params": r}, x, train_bn=False), jax.random.PRNGKey(0)
    )
    out = jax.eval_shape(
        lambda v: model.apply(v, x, train_bn=False), shapes
    )
    for i, key in enumerate(["C1", "C2", "C3", "C4", "C5"]):
        assert out[key].shape[1] == 64 // (2 ** (i + 1)), (name, key, out[key].shape)


def test_stem_s2d_exact_vs_plain_conv(monkeypatch):
    """The space-to-depth stem rewrite (_StemConvS2D) must match the plain
    7x7/s2 SAME conv exactly in f32 on the SAME kernel param — including the
    (2,3) asymmetric SAME padding at the bottom/right edges."""
    from maskrcnn_tf2_tpu.models.backbones import resnet as rn

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 64, 64, 3).astype(np.float32))

    plain = nn.Conv(
        16, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
        dtype=jnp.float32, name="conv",
    )
    v = plain.init(jax.random.PRNGKey(0), x)
    ref = plain.apply(v, x)

    monkeypatch.setenv("MASKRCNN_TPU_STEM_S2D", "1")
    s2d = rn._StemConvS2D(16, dtype=jnp.float32, name="conv")
    out = s2d.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_stem_s2d_gate_in_convbn(monkeypatch):
    """ConvBN(stem_s2d=True) must produce the same param tree either way and
    identical outputs (f32) when the env gate flips."""
    from maskrcnn_tf2_tpu.models.backbones.resnet import ConvBN

    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(1, 32, 32, 3).astype(np.float32))
    mod = ConvBN(8, (7, 7), (2, 2), dtype=jnp.float32, stem_s2d=True)

    monkeypatch.setenv("MASKRCNN_TPU_STEM_S2D", "0")
    v0 = mod.init(jax.random.PRNGKey(1), x, False)
    y0 = mod.apply(v0, x, False)
    monkeypatch.setenv("MASKRCNN_TPU_STEM_S2D", "1")
    v1 = mod.init(jax.random.PRNGKey(1), x, False)
    y1 = mod.apply(v1, x, False)

    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)
