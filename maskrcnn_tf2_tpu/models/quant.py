"""Int8 conv building block for post-training quantization (config.quant_mode).

The TPU-native analog of the reference's TRT deployment notch
(``src/inference_optimize.py`` exports ONNX -> TRT engines; its published
numbers are fp16, README.md:460-503 — int8 is TRT's next notch). v5e's MXU
contracts int8 x int8 -> int32 at ~1.6x the bf16 rate with identical dequant
epilogues (259.8 vs 159.6 TOP/s conv, scripts/microbench_int8.py).

Used by the ResNet backbone (models/backbones/resnet.py::ConvBN), the FPN
convs (models/fpn.py), the RPN shared conv (models/rpn.py) and — behind
``config.quant_classifier`` — the classifier head's two wide FC layers
(models/heads.py); calibration scales are collected by the same modules in
``quant_mode='calib'`` (see export/quantize.py for the flow).
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
    def __call__(self, x: Array, x_amax: Array, xq: Array = None, sx: Array = None) -> Array:
        """``x`` + calibrated ``x_amax``, or a pre-quantized ``(xq, sx)``
        pair from a producer-side s8 epilogue (the quantized residual
        stream, resnet.py — saves the bf16 write + re-read of the edge)."""
        in_ch = (x if xq is None else xq).shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel, in_ch // self.groups, self.features),
        )
        if xq is None:
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


def conv_site(
    m: nn.Module,
    x: Array,
    features: int,
    kernel: Tuple[int, int],
    strides: Tuple[int, int],
    groups: int,
    dtype: Any,
    quant: str,
    name: str,
) -> Array:
    """One quantizable conv site, shared by the MobileNet/EfficientNet
    builders (the ResNet family has the same branching inline in ConvBN).

    Param-tree-identical across modes — Int8Conv is nn.Conv param-compatible
    (same ``kernel`` name/shape, incl. depthwise where
    ``feature_group_count == in_channels`` gives kernel ``[kh, kw, 1, F]``)
    — so the quantized graph applies the UNCHANGED trained checkpoint. The
    calibrated input amax lives in the CALLER module's ``quant`` collection
    as ``{name}_x_amax`` (recorded in 'calib', consumed in 'int8'; see
    export/quantize.py). Matches the reference TRT flow where every backbone
    ships as an engine (README.md:460-503) and int8 is the next notch.

    Measured guidance (v5e, 1024^2 b32): int8 WINS on the ResNet family
    (1.36x bf16 — wide 3x3 convs ride the MXU's int8 rate) but is neutral-
    to-negative on the depthwise families: mobilenetv2 0.861x either way;
    efficientnetb0 0.857x with depthwise quantized vs 0.992x without (the
    5x5 dw convs are VPU-bound and the quantize pass just adds traffic).
    Depthwise sites therefore stay bf16 in int8 mode by default (never
    worse; A/B re-measure with MASKRCNN_TPU_INT8_DW=1). All backbones stay
    AP-neutral (top-5 box delta 0.0); prefer bf16 outright for MobileNet/
    EfficientNet serving. Int8 is a BATCH-throughput mode: at batch 1 it
    loses on every latency-table config (+~17 ms @1024², +~5 ms @512²,
    backbone-independent — quantize/dequant fusions are occupancy-bound
    with one image; BENCH_LATENCY_TABLE.md r5); use bf16 for
    latency-bound b1 serving.
    """
    if quant == "calib":
        # record for EVERY site (incl. depthwise) so one calibration
        # artifact serves both settings of MASKRCNN_TPU_INT8_DW
        amax = m.variable("quant", f"{name}_x_amax", lambda: jnp.zeros((), jnp.float32))
        amax.value = jnp.maximum(amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
    if quant == "int8" and groups > 1:
        import os

        if os.environ.get("MASKRCNN_TPU_INT8_DW", "0") != "1":
            quant = "off"  # dw stays bf16 — measured never worse (docstring)
    if quant == "int8":
        amax = m.variable("quant", f"{name}_x_amax", lambda: jnp.zeros((), jnp.float32))
        return Int8Conv(
            features, kernel, strides, groups, dtype=dtype, name=f"{name}_conv"
        )(x, amax.value)
    return nn.Conv(
        features,
        kernel,
        strides=strides,
        padding="SAME",
        use_bias=False,
        feature_group_count=groups,
        dtype=dtype,
        name=f"{name}_conv",
    )(x)


def _quantize_input(x: Array, x_amax: Array) -> Tuple[Array, Array]:
    """Symmetric per-tensor int8 quantization from a calibrated amax."""
    sx = jnp.maximum(x_amax.astype(jnp.float32), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127.0, 127.0).astype(
        jnp.int8
    )
    return xq, sx


class Int8Dense(nn.Module):
    """Int8 drop-in for ``nn.Dense`` — identical param tree (``kernel
    [K, F]``, ``bias [F]``, same names/initializers), so the quantized graph
    applies the UNCHANGED trained checkpoint. Same TRT-style scales as
    Int8Conv: per-tensor input (calibrated amax), per-output-channel weight.

    int32 accumulation is exact for every use here: |acc| <= K * 127^2
    (K=12544 for the pooled FC -> 2.0e8 < 2^31).
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, x_amax: Array) -> Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        xq, sx = _quantize_input(x, x_amax)
        wf = kernel.astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-12) / 127.0
        wq = jnp.round(wf / sw).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq,
            wq,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (sx * sw)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class Int8FCOnPooled(nn.Module):
    """Int8 twin of ``heads._FCOnPooled`` (Dense over a pooled ``(P, P, C)``
    ROI patch contracted directly by dot_general, no big-tensor flatten) —
    identical param tree (``kernel [P*P*C, F]``, ``bias [F]``)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, x_amax: Array) -> Array:
        _, _, p, _, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p * p * c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xq, sx = _quantize_input(x, x_amax)
        wf = kernel.reshape(p, p, c, self.features).astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.round(wf / sw).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq,
            wq,
            (((2, 3, 4), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (sx * sw) + bias.astype(jnp.float32)
        return y.astype(self.dtype)
