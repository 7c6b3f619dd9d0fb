"""Int8 conv building block for post-training quantization (config.quant_mode).

The TPU-native analog of the reference's TRT deployment notch
(``src/inference_optimize.py`` exports ONNX -> TRT engines; its published
numbers are fp16, README.md:460-503 — int8 is TRT's next notch). v5e's MXU
contracts int8 x int8 -> int32 at ~1.6x the bf16 rate with identical dequant
epilogues (259.8 vs 159.6 TOP/s conv, scripts/microbench_int8.py).

Used by the ResNet backbone (models/backbones/resnet.py::ConvBN), the FPN
convs (models/fpn.py) and the RPN shared conv (models/rpn.py); calibration
scales are collected by the same modules in ``quant_mode='calib'`` (see
export/quantize.py for the flow).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class Int8Conv(nn.Module):
    """Int8 drop-in for ``nn.Conv`` — param-compatible (identical ``kernel``
    / ``bias`` params, same module name), so the quantized graph applies the
    UNCHANGED trained checkpoint.

    Symmetric TRT-style scales: input per-tensor from the calibrated running
    amax (passed in by the owner from the 'quant' collection), weights
    per-output-channel from their own amax. The dequant scale — and any
    following eval-mode BatchNorm / bias / relu — are elementwise and fuse
    into one XLA epilogue, so no BN folding is needed.
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, x_amax: Array) -> Array:
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel, x.shape[-1] // self.groups, self.features),
        )
        sx = jnp.maximum(x_amax.astype(jnp.float32), 1e-6) / 127.0
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / sx), -127.0, 127.0
        ).astype(jnp.int8)
        wf = w.astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.round(wf / sw).astype(jnp.int8)
        import os

        # Conv OUTPUT type. The MXU accumulates int8 x int8 in int32 either
        # way; s32 is the bit-exact default (CPU oracle tests). bf16 halves
        # the epilogue's HBM round-trip (the s32 result of every quantized
        # conv is written then re-read by its dequant+BN+relu fusion — a
        # s32[32,256,256,256] is 2.1 GB) at the cost of bf16 rounding before
        # the dequant scale.
        pet = {"bf16": jnp.bfloat16, "f32": jnp.float32, "s32": jnp.int32}.get(
            os.environ.get("MASKRCNN_TPU_INT8_PET", "s32"), jnp.int32
        )
        y = jax.lax.conv_general_dilated(
            xq,
            wq,
            self.strides,
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=pet,
        )
        y = y.astype(jnp.float32) * (sx * sw)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)
