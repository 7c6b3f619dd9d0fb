"""EfficientNet B0-B7 backbones.

The reference imports these from the external ``efficientnet`` package
(``_effnet_mapping``, mrcnn_layers.py:1344-1352); here they are Flax modules
with the standard compound-scaling recipe (width/depth coefficients, MBConv
with SE ratio 0.25, swish), returning C1..C5 endpoints.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from maskrcnn_tf2_tpu.models.quant import conv_site

Array = jnp.ndarray

# (width_coefficient, depth_coefficient)
EFFICIENTNET_PARAMS = {
    "efficientnetb0": (1.0, 1.0),
    "efficientnetb1": (1.0, 1.1),
    "efficientnetb2": (1.1, 1.2),
    "efficientnetb3": (1.2, 1.4),
    "efficientnetb4": (1.4, 1.8),
    "efficientnetb5": (1.6, 2.2),
    "efficientnetb6": (1.8, 2.6),
    "efficientnetb7": (2.0, 3.1),
}

# (kernel, stride, expand, features, repeats)
_BLOCK_ARGS = [
    (3, 1, 1, 16, 1),
    (3, 2, 6, 24, 2),
    (5, 2, 6, 40, 2),
    (3, 2, 6, 80, 3),
    (5, 1, 6, 112, 3),
    (5, 2, 6, 192, 4),
    (3, 1, 6, 320, 1),
]


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def _conv_bn(m, x, features, kernel, strides, dtype, train_bn, name, groups=1, act=True, bn_axis=None, quant="off"):
    x = conv_site(
        m, x, features, (kernel, kernel), (strides, strides), groups, dtype,
        quant, name,
    )
    x = nn.BatchNorm(
        use_running_average=not train_bn,
        momentum=0.9,
        epsilon=1e-3,
        dtype=dtype,
        name=f"{name}_bn",
        axis_name=bn_axis,
    )(x)
    return nn.swish(x) if act else x


class MBConv(nn.Module):
    kernel: int
    strides: int
    expand: int
    features: int
    se_ratio: float = 0.25
    dtype: Any = jnp.bfloat16
    bn_axis: Any = None
    quant: str = "off"

    @nn.compact
    def __call__(self, x: Array, train_bn: bool) -> Array:
        d = self.dtype
        in_ch = x.shape[-1]
        y = x
        if self.expand != 1:
            y = _conv_bn(self, y, in_ch * self.expand, 1, 1, d, train_bn, "expand", bn_axis=self.bn_axis, quant=self.quant)
        mid = y.shape[-1]
        y = _conv_bn(self, y, mid, self.kernel, self.strides, d, train_bn, "dw", groups=mid, bn_axis=self.bn_axis, quant=self.quant)
        # Squeeze-excite on the expanded features, reduction vs input channels.
        se_ch = max(1, int(in_ch * self.se_ratio))
        s = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
        s = nn.Dense(se_ch, dtype=d, name="se_reduce")(s.astype(d))
        s = nn.swish(s)
        s = nn.Dense(mid, dtype=d, name="se_expand")(s)
        s = nn.sigmoid(s.astype(jnp.float32)).astype(y.dtype)
        y = y * s[:, None, None, :]
        y = _conv_bn(self, y, self.features, 1, 1, d, train_bn, "project", act=False, bn_axis=self.bn_axis, quant=self.quant)
        if self.strides == 1 and in_ch == self.features:
            y = y + x
        return y


class EfficientNet(nn.Module):
    width: float = 1.0
    depth: float = 1.0
    dtype: Any = jnp.bfloat16
    bn_axis: Any = None
    quant: str = "off"  # config.quant_mode: block convs only (stem stays bf16)

    @nn.compact
    def __call__(self, x: Array, train_bn: bool = False) -> Dict[str, Array]:
        d = self.dtype
        x = x.astype(d)
        x = _conv_bn(self, x, round_filters(32, self.width), 3, 2, d, train_bn, "stem", bn_axis=self.bn_axis)

        endpoints = {}
        stride = 2
        bidx = 0
        for kernel, first_stride, expand, features, repeats in _BLOCK_ARGS:
            features = round_filters(features, self.width)
            repeats = round_repeats(repeats, self.depth)
            for r in range(repeats):
                s = first_stride if r == 0 else 1
                if s == 2:
                    endpoints[f"stride{stride}"] = x
                    stride *= 2
                x = MBConv(
                    kernel, s, expand, features, dtype=d, bn_axis=self.bn_axis,
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
