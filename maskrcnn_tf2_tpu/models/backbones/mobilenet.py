"""MobileNet V1/V2 backbones.

The reference delegates these to ``keras_applications`` (factory rows at
models_factory.py:59-60); here they are first-class Flax modules returning
C1..C5 endpoints directly. NHWC, bfloat16 compute; depthwise convolutions are
expressed as ``feature_group_count == channels`` which XLA lowers natively.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from maskrcnn_tf2_tpu.models.quant import conv_site

Array = jnp.ndarray


def _conv_bn(m, x, features, kernel, strides, dtype, train_bn, name, groups=1, act=nn.relu6, bn_axis=None, quant="off"):
    x = conv_site(m, x, features, kernel, strides, groups, dtype, quant, name)
    x = nn.BatchNorm(
        use_running_average=not train_bn,
        momentum=0.9,
        epsilon=1e-3,
        dtype=dtype,
        name=f"{name}_bn",
        axis_name=bn_axis,
    )(x)
    return act(x) if act is not None else x


class MobileNetV1(nn.Module):
    alpha: float = 1.0
    dtype: Any = jnp.bfloat16
    bn_axis: Any = None
    quant: str = "off"  # config.quant_mode: block convs only (stem stays bf16)

    @nn.compact
    def __call__(self, x: Array, train_bn: bool = False) -> Dict[str, Array]:
        d = self.dtype

        def c(ch):
            return max(8, int(ch * self.alpha))

        x = x.astype(d)
        x = _conv_bn(self, x, c(32), (3, 3), (2, 2), d, train_bn, "stem", bn_axis=self.bn_axis)

        def ds_block(x, features, strides, name):
            in_ch = x.shape[-1]
            x = _conv_bn(
                self, x, in_ch, (3, 3), strides, d, train_bn, f"{name}_dw",
                groups=in_ch, bn_axis=self.bn_axis, quant=self.quant)
            return _conv_bn(
                self, x, features, (1, 1), (1, 1), d, train_bn, f"{name}_pw",
                bn_axis=self.bn_axis, quant=self.quant,
            )

        x = ds_block(x, c(64), (1, 1), "b1")
        endpoints = {"C1": x}  # stride 2
        x = ds_block(x, c(128), (2, 2), "b2")
        x = ds_block(x, c(128), (1, 1), "b3")
        endpoints["C2"] = x  # stride 4
        x = ds_block(x, c(256), (2, 2), "b4")
        x = ds_block(x, c(256), (1, 1), "b5")
        endpoints["C3"] = x  # stride 8
        x = ds_block(x, c(512), (2, 2), "b6")
        for i in range(5):
            x = ds_block(x, c(512), (1, 1), f"b{7 + i}")
        endpoints["C4"] = x  # stride 16
        x = ds_block(x, c(1024), (2, 2), "b12")
        x = ds_block(x, c(1024), (1, 1), "b13")
        endpoints["C5"] = x  # stride 32
        return endpoints


class InvertedResidual(nn.Module):
    features: int
    strides: int = 1
    expand: int = 6
    dtype: Any = jnp.bfloat16
    bn_axis: Any = None
    quant: str = "off"

    @nn.compact
    def __call__(self, x: Array, train_bn: bool) -> Array:
        d = self.dtype
        in_ch = x.shape[-1]
        y = x
        if self.expand != 1:
            y = _conv_bn(self, y, in_ch * self.expand, (1, 1), (1, 1), d, train_bn, "expand", bn_axis=self.bn_axis, quant=self.quant)
        mid = y.shape[-1]
        y = _conv_bn(
            self, y, mid, (3, 3), (self.strides, self.strides), d, train_bn, "dw",
            groups=mid, bn_axis=self.bn_axis, quant=self.quant)
        y = _conv_bn(self, y, self.features, (1, 1), (1, 1), d, train_bn, "project", act=None, bn_axis=self.bn_axis, quant=self.quant)
        if self.strides == 1 and in_ch == self.features:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    alpha: float = 1.0
    dtype: Any = jnp.bfloat16
    bn_axis: Any = None
    quant: str = "off"  # config.quant_mode: block convs only (stem stays bf16)

    @nn.compact
    def __call__(self, x: Array, train_bn: bool = False) -> Dict[str, Array]:
        d = self.dtype

        def c(ch):
            return max(8, int(ch * self.alpha + 4) // 8 * 8)

        x = x.astype(d)
        x = _conv_bn(self, x, c(32), (3, 3), (2, 2), d, train_bn, "stem", bn_axis=self.bn_axis)
        # (expand, features, repeats, first_stride)
        schedule = [
            (1, 16, 1, 1),
            (6, 24, 2, 2),
            (6, 32, 3, 2),
            (6, 64, 4, 2),
            (6, 96, 3, 1),
            (6, 160, 3, 2),
            (6, 320, 1, 1),
        ]
        endpoints = {}
        stride = 2
        bidx = 0
        for expand, features, repeats, first_stride in schedule:
            for r in range(repeats):
                s = first_stride if r == 0 else 1
                if s == 2:
                    endpoints[f"stride{stride}"] = x
                    stride *= 2
                x = InvertedResidual(
                    c(features), s, expand, dtype=d, bn_axis=self.bn_axis,
                    quant=self.quant, name=f"block{bidx}"
                )(x, train_bn)
                bidx += 1
        endpoints[f"stride{stride}"] = x
        return {
            "C1": endpoints["stride2"],
            "C2": endpoints["stride4"],
            "C3": endpoints["stride8"],
            "C4": endpoints["stride16"],
            "C5": endpoints["stride32"],
        }
