"""Int8 post-training quantization — the TPU-native analog of the
reference's TensorRT deployment flow (``src/inference_optimize.py``, which
exports ONNX -> TRT engines; its published numbers are fp16, README.md:
460-503 — int8 is TRT's next notch and this module is that notch for TPU).

Flow (TRT-style max calibration):

    int8_config, variables = quantize_for_inference(config, variables, batches)
    predictor = Predictor(int8_config, variables)

``calibrate`` runs the ordinary inference forward with
``quant_mode='calib'``, which makes every quantizable conv record the
running amax of its input into the ``quant`` Flax collection;
``quant_mode='int8'`` then consumes those scales (see
models/backbones/resnet.py::_Int8Conv). Params are untouched — weights are
re-quantized per-output-channel inside the jitted graph (one cheap
bandwidth pass over ~45 MB of kernels per step, fused by XLA).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Tuple

import jax

from maskrcnn_tf2_tpu.config import MaskRCNNConfig
from maskrcnn_tf2_tpu.models import MaskRCNN


def calibrate(config: MaskRCNNConfig, variables, batches: Iterable) -> dict:
    """Collect per-conv input-amax calibration over ``batches``.

    ``batches``: iterable of ``(images, image_meta)`` device-shaped arrays
    (raw 0..255 images, exactly what the inference graph takes).
    Returns ``variables`` with the populated ``'quant'`` collection added.
    """
    calib_cfg = dataclasses.replace(config, quant_mode="calib")
    model = MaskRCNN(calib_cfg)

    @jax.jit
    def step(v, images, meta):
        _, mut = model.apply(v, images, meta, train=False, mutable=["quant"])
        return mut["quant"]

    variables = dict(variables)
    n = 0
    for images, meta in batches:
        quant = step(variables, images, meta)
        variables["quant"] = quant  # running max threads through
        n += 1
    if n == 0:
        raise ValueError("calibrate() needs at least one batch")
    return variables


def quantize_for_inference(
    config: MaskRCNNConfig, variables, batches: Iterable
) -> Tuple[MaskRCNNConfig, dict]:
    """Calibrate and return ``(int8_config, variables)`` ready for Predictor."""
    variables = calibrate(config, variables, batches)
    return dataclasses.replace(config, quant_mode="int8"), variables
