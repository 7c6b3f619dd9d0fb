"""AOT-compiled inference engines — the TPU-native analog of the
reference's TensorRT engine build.

The reference deploys by compiling its ONNX graph into a serialized TRT
engine ahead of time (``make_engine_from_onnx``, inference_optimize.py:24-64;
``trtexec`` flow, README.md:348-367) so the serving process never pays graph
compilation. On TPU the same role is played by the XLA executable: this
module lowers + compiles the fixed-shape inference function once (with the
production compiler options) and serializes the **compiled executable** via
``jax.experimental.serialize_executable`` — loading it back skips XLA
compilation entirely (the multi-minute cost on large graphs).

Unlike ``export_stablehlo`` (portable, recompiled at load), an engine is
pinned to the backend it was built for — exactly like a TRT engine is pinned
to its GPU architecture. Weights travel inside the artifact (as the TRT
engine's do), passed as runtime arguments so the executable itself stays
weight-agnostic (``refit``-able, in TRT terms).

File format: a single pickle stream
``{meta, variables (numpy pytree), serialized executable, in/out treedefs}``.
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional

import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig

_MAGIC = "maskrcnn_tf2_tpu.engine.v1"


def build_engine(
    config: MaskRCNNConfig,
    variables,
    path: str,
    batch_size: int = 1,
    compiler_options: Optional[Dict[str, str]] = None,
) -> str:
    """Compile the inference fn ahead of time and serialize the executable.

    Equivalent role to the reference's ``make_engine_from_onnx``
    (inference_optimize.py:24-64): one offline build, zero serving-time
    compilation. Returns ``path``.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import serialize_executable

    from maskrcnn_tf2_tpu.models import MaskRCNN
    from maskrcnn_tf2_tpu.utils.platform import inference_compiler_options

    if compiler_options is None:
        compiler_options = inference_compiler_options()

    model = MaskRCNN(config)

    def infer(variables, images, image_meta):
        out = model.apply(variables, images, image_meta, train=False)
        cls = out["detections"][..., 4].astype(jnp.int32)
        masks = jnp.take_along_axis(
            out["mrcnn_masks"], cls[:, :, None, None, None], axis=-1
        )[..., 0]
        return out["detections"], masks

    h, w, c = config.image_shape
    # uint8 ingress (serving contract): 4x smaller host->device transfer;
    # the in-graph normalizer casts. Meta stays f32.
    images = jnp.zeros((batch_size, h, w, c), jnp.uint8)
    meta = jnp.zeros((batch_size, config.meta_size), jnp.float32)
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    # The persistent compilation cache must be bypassed here: an executable
    # restored from the cache deserializes with missing thunk definitions
    # ("Buffer Definition Event: Function ... not found" at run time on this
    # jaxlib). A fresh compile serializes correctly.
    cache_was_on = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        compiled = (
            jax.jit(infer)
            .lower(variables, images, meta)
            .compile(compiler_options=compiler_options)
        )
        serialized, in_tree, out_tree = serialize_executable.serialize(compiled)
    finally:
        jax.config.update("jax_enable_compilation_cache", cache_was_on)

    payload = {
        "magic": _MAGIC,
        "platform": jax.devices()[0].platform,
        "jax_version": jax.__version__,
        "backbone": config.backbone,
        "batch_size": batch_size,
        "image_shape": tuple(config.image_shape),
        "meta_size": int(config.meta_size),
        "config_md5": config.md5(),
        "num_devices": len(compiled._executable.xla_executable.local_devices()),
        "variables": host_vars,
        "serialized": serialized,
        "in_tree": in_tree,
        "out_tree": out_tree,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    return path


class Engine:
    """A loaded AOT engine: ``engine(images_u8, image_meta)`` with no
    compilation at load or call time (the TRT-engine runtime analog,
    README.md:421-437 Jetson flow)."""

    def __init__(self, payload, loaded):
        self.batch_size = payload["batch_size"]
        self.image_shape = payload["image_shape"]
        self.meta_size = payload["meta_size"]
        self.backbone = payload["backbone"]
        self.config_md5 = payload["config_md5"]
        self._variables = payload["variables"]
        self._loaded = loaded

    def __call__(self, images, image_meta):
        det, masks = self._loaded(self._variables, images, image_meta)
        return np.asarray(det), np.asarray(masks)


def load_engine(path: str) -> Engine:
    """Deserialize and load an engine built by :func:`build_engine`.

    Raises a clear error when the artifact targets a different backend —
    the same contract as TRT engines (arch-pinned)."""
    import jax
    from jax.experimental import serialize_executable

    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("magic") != _MAGIC:
        raise ValueError(f"{path} is not a maskrcnn_tf2_tpu engine artifact")
    platform = jax.devices()[0].platform
    if payload["platform"] != platform:
        raise RuntimeError(
            f"engine was built for backend '{payload['platform']}' but this "
            f"process runs '{platform}' — rebuild with build_engine() "
            "(engines are backend-pinned, like TRT engines; use "
            "export_stablehlo for a portable artifact)"
        )
    n_dev = payload.get("num_devices", 1)
    loaded = serialize_executable.deserialize_and_load(
        payload["serialized"],
        payload["in_tree"],
        payload["out_tree"],
        execution_devices=jax.devices()[:n_dev],
    )
    return Engine(payload, loaded)
