"""ROI heads: FPN classifier (class + box) and mask head.

Re-design of the reference heads (``FPNClassifier``/``fpn_classifier_graph``
mrcnn_layers.py:675-737/1124-1198 and ``FPNMaskLayer``/``fpn_mask_graph``
:741-819/1201-1267). The reference materializes each head twice (Keras Layer
+ functional twin) and again per train/inference graph; here each is ONE Flax
module whose ``train_bn`` switch covers all four reference copies.

TimeDistributed disappears: ROIs are folded into the batch axis
(``[B, N, P, P, C] -> [B*N, P, P, C]``) so every conv runs as one large
batched MXU matmul instead of N small ones.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class _FCOnPooled(nn.Module):
    """Dense over the flattened (P, P, C) patch WITHOUT flattening the big
    tensor first — param-compatible with ``nn.Dense(features)`` applied to
    ``x.reshape(B*N, P*P*C)`` (``kernel [P*P*C, F]``, ``bias [F]``).

    The explicit flatten of [B, N, 7, 7, 256] pooled features is a real
    relayout on TPU ((7, 256)-tiled minor dims repacked to one 12544 lane
    axis — measured 1.6 ms/batch at 16k ROIs); a dot_general contracting
    (P, P, C) directly lets XLA fold that repack into the matmul's LHS
    tile loads."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:  # [B, N, P, P, C] -> [B, N, F]
        _, _, p, _, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p * p * c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w = kernel.reshape(p, p, c, self.features).astype(self.dtype)
        y = jax.lax.dot_general(
            x.astype(self.dtype), w, (((2, 3, 4), (0, 1, 2)), ((), ()))
        )
        return y + bias.astype(self.dtype)


class _DeconvS2D(nn.Module):
    """The mask head's 2x2-stride-2 ``ConvTranspose`` as ONE MXU dot +
    depth-to-space (reference ``Conv2DTranspose``, mrcnn_layers.py:794-800).

    With kernel == stride the transposed conv's taps never overlap, so it is
    exactly ``out[n, 2h+i, 2w+j, f] = sum_c x[n,h,w,c] K[i,j,c,f] + b[f]``:
    a ``[BHW, C] x [C, 4F]`` matmul plus a reshuffle. Param-compatible with
    ``nn.ConvTranspose(F, (2, 2), strides=(2, 2))`` (``kernel [2,2,C,F]``,
    ``bias [F]``, same initializers) so checkpoints interchange. The hoped-for
    payoff was the BACKWARD (conv_transpose's gradient lowers to a spatial
    ``reverse`` + pad fusions over the [1600, 28, 28, 256] cotangent);
    MEASURED LOSER at r50@512 b8 train: 95.7 vs 90.5 ms/step — the
    depth-to-space transpose is a real relayout costing more than the
    ``reverse`` it saves. Default OFF; re-measure with
    MASKRCNN_TPU_DECONV=s2d before re-enabling. Equivalence pinned by
    tests/test_heads_deconv.py.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        d = self.dtype
        # flax ConvTranspose applies the kernel spatially FLIPPED:
        # out[2h+i, 2w+j] = x[h, w] @ K[1-i, 1-j] (verified vs nn.ConvTranspose)
        k2 = (
            kernel[::-1, ::-1]
            .astype(d)
            .transpose(2, 0, 1, 3)
            .reshape(c, 4 * self.features)
        )
        y = jax.lax.dot_general(
            x.astype(d).reshape(n * h * w, c),
            k2,
            (((1,), (0,)), ((), ())),
        )
        y = (
            y.reshape(n, h, w, 2, 2, self.features)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, 2 * h, 2 * w, self.features)
        )
        return y + bias.astype(d)


def _deconv_s2d_on() -> bool:
    import os

    return os.environ.get("MASKRCNN_TPU_DECONV", "") == "s2d"


def _bn(name, train_bn, dtype, bn_axis=None):
    return nn.BatchNorm(
        use_running_average=not train_bn,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
        axis_name=bn_axis,
    )


class FPNClassifierHead(nn.Module):
    """ROIAlign(pool)ed features -> class logits/probs + per-class box deltas.

    Structure (reference mrcnn_layers.py:1124-1198): PxP conv acting as FC
    (1024) + BN + act, 1x1 conv (1024) + BN + act, then Dense heads.
    """

    num_classes: int
    pool_size: int = 7
    fc_size: int = 1024
    leaky_relu: bool = False
    dtype: Any = jnp.bfloat16
    bn_axis: Any = None
    quant: str = "off"  # config.quant_mode when config.quant_classifier

    def _amax(self, name: str, x: Array):
        """Calibrated input amax for the quantized twins ('quant' collection,
        same calib pattern as models/fpn.py::FPN.qconv)."""
        v = self.variable(
            "quant", f"{name}_x_amax", lambda: jnp.zeros((), jnp.float32)
        )
        if self.quant == "calib":
            v.value = jnp.maximum(
                v.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
            )
        return v.value

    @nn.compact
    def __call__(self, roi_features: Array, train_bn: bool = False):
        d = self.dtype
        act: Callable = (lambda v: nn.leaky_relu(v, 0.2)) if self.leaky_relu else nn.relu
        b, n, p, _, c = roi_features.shape
        # The reference's TimeDistributed PxP VALID conv "FC" (and the 1x1
        # conv after it) are plain dense layers once ROIs are flattened —
        # one large MXU matmul instead of a degenerate convolution (which
        # also compiles pathologically slowly on TPU).
        if self.quant in ("calib", "int8"):
            a1 = self._amax("mrcnn_class_conv1", roi_features)
        if self.quant == "int8":
            from maskrcnn_tf2_tpu.models.quant import Int8FCOnPooled

            x = Int8FCOnPooled(self.fc_size, dtype=d, name="mrcnn_class_conv1")(
                roi_features, a1
            ).reshape(b * n, self.fc_size)
        else:
            x = _FCOnPooled(self.fc_size, dtype=d, name="mrcnn_class_conv1")(
                roi_features
            ).reshape(b * n, self.fc_size)
        x = _bn("mrcnn_class_bn1", train_bn, d, self.bn_axis)(x)
        x = act(x)
        if self.quant in ("calib", "int8"):
            a2 = self._amax("mrcnn_class_conv2", x)
        if self.quant == "int8":
            from maskrcnn_tf2_tpu.models.quant import Int8Dense

            x = Int8Dense(self.fc_size, dtype=d, name="mrcnn_class_conv2")(x, a2)
        else:
            x = nn.Dense(self.fc_size, dtype=d, name="mrcnn_class_conv2")(x)
        x = _bn("mrcnn_class_bn2", train_bn, d, self.bn_axis)(x)
        x = act(x)
        shared = x

        logits = nn.Dense(self.num_classes, dtype=d, name="mrcnn_class_logits")(shared)
        logits = logits.reshape(b, n, self.num_classes).astype(jnp.float32)
        probs = nn.softmax(logits, axis=-1)

        deltas = nn.Dense(self.num_classes * 4, dtype=d, name="mrcnn_bbox_fc")(shared)
        deltas = deltas.reshape(b, n, self.num_classes, 4).astype(jnp.float32)
        return logits, probs, deltas


class _MaskProj(nn.Module):
    """Final 1x1 conv of the mask head, param-compatible with
    ``nn.Conv(num_classes, (1, 1))`` (kernel ``[1, 1, C, O]``, bias ``[O]``,
    same initializers) plus a train-mode single-column path.

    A 1x1 conv is a dense layer over the channel axis. At train time the
    mask loss consumes ONLY the GT class's channel (reference
    losses.py:190-235), so given ``class_ids`` this computes just that
    column: gather each ROI's kernel column via a one-hot matmul (autodiff
    then yields the exact scatter-add kernel gradient as another matmul)
    and contract it with the features — O(1) channels instead of O(C),
    and no ``[B*T, 2P, 2P, num_classes]`` intermediate.
    """

    num_classes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, class_ids: Array | None = None) -> Array:
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, c, self.num_classes)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.num_classes,))
        w = kernel[0, 0].astype(self.dtype)  # [C, O]
        if class_ids is None:
            return (
                jax.lax.dot_general(
                    x.astype(self.dtype), w, (((3,), (0,)), ((), ()))
                )
                + bias.astype(self.dtype)
            )
        onehot = jax.nn.one_hot(class_ids, self.num_classes, dtype=self.dtype)
        cols = jax.lax.dot_general(
            onehot, w, (((1,), (1,)), ((), ()))
        )  # [N, C]
        out = jax.lax.dot_general(
            x.astype(self.dtype), cols, (((3,), (1,)), ((0,), (0,)))
        )  # [N, H, W]
        return out + (onehot @ bias.astype(self.dtype))[:, None, None]


class FPNMaskHead(nn.Module):
    """ROIAlign(mask_pool)ed features -> per-class sigmoid masks [B,N,2P,2P,C].

    Structure (reference mrcnn_layers.py:1201-1267): 4x [3x3 conv(256) + BN +
    act], 2x2 stride-2 transpose conv, 1x1 conv to num_classes + sigmoid.

    With ``class_ids`` (train-time slim path, see ``config.mask_train_slim``)
    the final projection computes only each ROI's GT-class channel and the
    output is ``[B, N, 2P, 2P]``.
    """

    num_classes: int
    conv_channels: int = 256
    leaky_relu: bool = False
    dtype: Any = jnp.bfloat16
    bn_axis: Any = None
    quant: str = "off"  # config.quant_mode when config.quant_mask_head

    @nn.compact
    def __call__(
        self,
        roi_features: Array,
        train_bn: bool = False,
        class_ids: Array | None = None,
    ) -> Array:
        d = self.dtype
        act: Callable = (lambda v: nn.leaky_relu(v, 0.2)) if self.leaky_relu else nn.relu
        b, n, p, _, c = roi_features.shape
        x = roi_features.reshape(b * n, p, p, c).astype(d)

        for i in range(1, 5):
            name = f"mrcnn_mask_conv{i}"
            if self.quant in ("calib", "int8"):
                amax = self.variable(
                    "quant", f"{name}_x_amax", lambda: jnp.zeros((), jnp.float32)
                )
            if self.quant == "calib":
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                )
            if self.quant == "int8":
                from maskrcnn_tf2_tpu.models.quant import Int8Conv

                x = Int8Conv(
                    self.conv_channels, (3, 3), use_bias=True, dtype=d, name=name
                )(x, amax.value)
            else:
                x = nn.Conv(
                    self.conv_channels, (3, 3), padding="SAME", dtype=d, name=name
                )(x)
            x = _bn(f"mrcnn_mask_bn{i}", train_bn, d, self.bn_axis)(x)
            x = act(x)

        if _deconv_s2d_on():
            x = _DeconvS2D(self.conv_channels, dtype=d, name="mrcnn_mask_deconv")(x)
        else:
            x = nn.ConvTranspose(
                self.conv_channels, (2, 2), strides=(2, 2), dtype=d,
                name="mrcnn_mask_deconv",
            )(x)
        x = act(x)
        proj = _MaskProj(self.num_classes, dtype=d, name="mrcnn_mask")
        if class_ids is not None:
            x = proj(x, class_ids.reshape(b * n))
            x = nn.sigmoid(x.astype(jnp.float32))
            return x.reshape(b, n, 2 * p, 2 * p)
        x = proj(x)
        x = nn.sigmoid(x.astype(jnp.float32))
        return x.reshape(b, n, 2 * p, 2 * p, self.num_classes)
