"""Feature Pyramid Network top-down pathway.

Re-design of the reference ``UpSamplingLayer``/``upsampling_graph``
(mrcnn_layers.py:48-101, 1010-1049): 1x1 lateral convs on C2..C5, 2x nearest
upsampling + add, 3x3 output convs, and P6 = stride-2 maxpool of P5.
Returns ``rpn_features = [P2..P6]`` and ``mrcnn_features = [P2..P5]``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


def _upsample2x_nearest(x: Array) -> Array:
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.bfloat16
    quant: str = "off"  # config.quant_mode (see models/quant.py)

    @nn.compact
    def __call__(self, endpoints: Dict[str, Array]) -> Tuple[List[Array], List[Array]]:
        d = self.dtype
        # int8 + s8 C endpoints (resnet.py _qc_on): stage edges may arrive as
        # (s8, scale) tuples — the laterals consume them directly below.
        c2, c3, c4, c5 = (
            endpoints[k] if isinstance(endpoints[k], tuple) else endpoints[k].astype(d)
            for k in ("C2", "C3", "C4", "C5")
        )

        def qconv(name, ksize):
            """nn.Conv, or its calibrated int8 twin (param paths unchanged)."""

            def apply(x):
                if self.quant == "calib":
                    amax = self.variable(
                        "quant", f"{name}_x_amax", lambda: jnp.zeros((), jnp.float32)
                    )
                    amax.value = jnp.maximum(
                        amax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                    )
                if self.quant == "int8":
                    from maskrcnn_tf2_tpu.models.quant import Int8Conv

                    amax = self.variable(
                        "quant", f"{name}_x_amax", lambda: jnp.zeros((), jnp.float32)
                    )
                    if isinstance(x, tuple):
                        # pre-quantized C endpoint: skip the input quantize
                        # pass (producer out_amax == this edge's running max)
                        xq, sx = x
                        return Int8Conv(
                            self.out_channels, ksize, use_bias=True, dtype=d,
                            name=name,
                        )(None, amax.value, xq=xq, sx=sx)
                    return Int8Conv(
                        self.out_channels, ksize, use_bias=True, dtype=d, name=name
                    )(x, amax.value)
                if isinstance(x, tuple):  # quant off/calib never sees tuples
                    raise ValueError("s8 endpoint outside int8 mode")
                return nn.Conv(
                    self.out_channels, ksize, padding="SAME", dtype=d, name=name
                )(x)

            return apply

        lat = lambda name: qconv(name, (1, 1))
        out = lambda name: qconv(name, (3, 3))

        p5 = lat("fpn_c5p5")(c5)
        p4 = lat("fpn_c4p4")(c4) + _upsample2x_nearest(p5)
        p3 = lat("fpn_c3p3")(c3) + _upsample2x_nearest(p4)
        p2 = lat("fpn_c2p2")(c2) + _upsample2x_nearest(p3)

        p2 = out("fpn_p2")(p2)
        p3 = out("fpn_p3")(p3)
        p4 = out("fpn_p4")(p4)
        p5 = out("fpn_p5")(p5)
        p6 = nn.max_pool(p5, (1, 1), strides=(2, 2), padding="VALID")

        return [p2, p3, p4, p5, p6], [p2, p3, p4, p5]
