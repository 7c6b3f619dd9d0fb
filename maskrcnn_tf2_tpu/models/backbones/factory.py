"""Backbone factory: name -> Flax module with C1..C5 endpoints.

TPU-native counterpart of the reference's ``Classifiers.get`` factory
(models_factory.py:83-106) + ``MaskRCNNBackbone``'s endpoint name-table
(mrcnn_layers.py:1299-1330): all 25 reference backbone keys are supported and
every module returns its endpoints explicitly, so no per-backbone layer-name
surgery exists anywhere.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from maskrcnn_tf2_tpu.models.backbones.efficientnet import (
    EFFICIENTNET_PARAMS,
    EfficientNet,
)
from maskrcnn_tf2_tpu.models.backbones.mobilenet import MobileNetV1, MobileNetV2
from maskrcnn_tf2_tpu.models.backbones.resnet import RESNET_VARIANTS, ResNet


def backbone_names():
    return (
        sorted(RESNET_VARIANTS)
        + ["mobilenet", "mobilenetv2"]
        + sorted(EFFICIENTNET_PARAMS)
    )


def get_backbone(
    name: str,
    dtype: Any = jnp.bfloat16,
    leaky_relu: bool = False,
    bn_axis: Any = None,
    quant: str = "off",
):
    """Build the backbone module for a reference backbone key."""
    name = name.lower()
    if name in RESNET_VARIANTS:
        return ResNet(
            dtype=dtype,
            leaky_relu=leaky_relu,
            bn_axis=bn_axis,
            quant=quant,
            name="backbone",
            **RESNET_VARIANTS[name],
        )
    if name == "mobilenet":
        return MobileNetV1(dtype=dtype, bn_axis=bn_axis, quant=quant, name="backbone")
    if name == "mobilenetv2":
        return MobileNetV2(dtype=dtype, bn_axis=bn_axis, quant=quant, name="backbone")
    if name in EFFICIENTNET_PARAMS:
        width, depth = EFFICIENTNET_PARAMS[name]
        return EfficientNet(
            width=width, depth=depth, dtype=dtype, bn_axis=bn_axis, quant=quant,
            name="backbone",
        )
    raise ValueError(
        f"unknown backbone '{name}'; available: {backbone_names()}"
    )
