"""Deployment export: serialized StableHLO artifacts (and optional TF
SavedModel via jax2tf).

The reference's deployment path is ONNX graph surgery + NVIDIA TensorRT
plugin splicing (inference_optimize.py:12-735) because its TF graph cannot
express Proposal/ROIAlign/DetectionNMS efficiently. This framework's
inference graph is already a single fixed-shape XLA program with those ops
native, so deployment is direct serialization:

  * ``export_stablehlo`` — portable serialized artifact via ``jax.export``;
    reloadable with ``load_stablehlo`` and runnable on any JAX backend
    (TPU serving path; versioned, forward-compatible bytecode).
  * ``export_saved_model`` — optional TF SavedModel through jax2tf for
    TF-serving-style deployments (needs tensorflow; gated).

Both export the same contract the reference's engines expose:
``(images, image_meta) -> (detections [B, D, 6], masks [B, D, mh, mw, C])``.
"""

from __future__ import annotations

from maskrcnn_tf2_tpu.config import MaskRCNNConfig


def _inference_fn_and_args(config: MaskRCNNConfig, variables, batch_size: int):
    import jax
    import jax.numpy as jnp

    from maskrcnn_tf2_tpu.models import MaskRCNN

    model = MaskRCNN(config)
    h, w, c = config.image_shape

    def infer(images, image_meta):
        out = model.apply(variables, images, image_meta, train=False)
        return out["detections"], out["mrcnn_masks"]

    images = jnp.zeros((batch_size, h, w, c), jnp.float32)
    meta = jnp.zeros((batch_size, config.meta_size), jnp.float32)
    return infer, (images, meta)


def export_stablehlo(
    config: MaskRCNNConfig, variables, path: str, batch_size: int = 1
) -> str:
    """Serialize the jitted inference function to a StableHLO artifact."""
    import jax
    from jax import export as jax_export

    infer, args = _inference_fn_and_args(config, variables, batch_size)
    exported = jax_export.export(jax.jit(infer))(*args)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_stablehlo(path: str):
    """Load a serialized artifact; returns a callable (images, meta)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call


def export_saved_model(
    config: MaskRCNNConfig, variables, path: str, batch_size: int = 1
) -> str:
    """TF SavedModel via jax2tf (optional; requires tensorflow)."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "export_saved_model requires tensorflow + jax2tf"
        ) from e

    infer, args = _inference_fn_and_args(config, variables, batch_size)
    tf_fn = tf.function(
        jax2tf.convert(infer, with_gradient=False),
        input_signature=[
            tf.TensorSpec(args[0].shape, tf.float32, name="input_image"),
            tf.TensorSpec(args[1].shape, tf.float32, name="input_image_meta"),
        ],
        autograph=False,
    )
    module = tf.Module()
    module.__call__ = tf_fn
    tf.saved_model.save(module, path)
    return path


def export_onnx(
    config: MaskRCNNConfig,
    variables,
    path: str,
    batch_size: int = 1,
    opset: int = 17,
) -> str:
    """ONNX artifact via jax2tf -> tf2onnx — parity with the reference's
    ``maskrcnn_to_onnx`` (inference_optimize.py:12-21), minus the TensorRT
    plugin surgery (this graph's Proposal/ROIAlign/DetectionNMS are ordinary
    ops that tf2onnx lowers directly, so ``modify_onnx_model``'s splicing,
    inference_optimize.py:415-735, has nothing left to do).

    Gated: requires the optional ``tf2onnx``/``onnx`` packages on top of
    tensorflow; raises a clear error when absent (this image ships TF but
    not tf2onnx). Outputs follow the reference contract
    ``['mrcnn_detection', 'mrcnn_mask']`` (inference_optimize.py:719-722).
    """
    try:  # gate first: cheap, and TF import alone takes ~1 min on this box
        import tf2onnx
    except ImportError as e:
        raise RuntimeError(
            "export_onnx requires the optional tf2onnx package "
            "(pip install tf2onnx onnx); export_stablehlo/export_saved_model "
            "cover the TPU-native deployment path without it"
        ) from e
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("export_onnx requires tensorflow + jax2tf") from e

    infer, args = _inference_fn_and_args(config, variables, batch_size)

    def named(images, image_meta):
        det, masks = infer(images, image_meta)
        return {"mrcnn_detection": det, "mrcnn_mask": masks}

    tf_fn = tf.function(
        jax2tf.convert(named, with_gradient=False),
        input_signature=[
            tf.TensorSpec(args[0].shape, tf.float32, name="input_image"),
            tf.TensorSpec(args[1].shape, tf.float32, name="input_image_meta"),
        ],
        autograph=False,
    )
    tf2onnx.convert.from_function(
        tf_fn,
        input_signature=tf_fn.input_signature,
        opset=opset,
        output_path=path,
    )
    return path
