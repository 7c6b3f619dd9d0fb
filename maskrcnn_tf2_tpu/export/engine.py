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
pinned to the backend *and host* it was built for — exactly like a TRT
engine is pinned to its GPU architecture (per-device builds,
inference_optimize.py:24-64). ``load_engine`` verifies platform, device
kind, and host fingerprint and fails with a clear "rebuild on this host"
error instead of a runtime NOT_FOUND deep inside the executable.

Weights travel inside the artifact (as the TRT engine's do), passed as
runtime arguments so the executable itself stays weight-agnostic
(``refit``-able, in TRT terms).

File format (v2): a text header line ``maskrcnn_tf2_tpu.engine.v2 <sha256>``
followed by a pickle stream ``{meta, variables (numpy pytree), serialized
executable, in/out treedefs}``. The sha256 of the pickle bytes is verified
before unpickling, which catches corruption/truncation — it is NOT a
security boundary. **Engines deserialize with ``pickle`` and must only be
loaded from trusted sources**: loading an attacker-supplied ``.engine`` file
is arbitrary code execution (TRT engines are parsed by a runtime instead;
treat ours like you would a Python wheel, not a data file).
"""

from __future__ import annotations

import hashlib
import pickle
from typing import Dict, Optional

import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig

_MAGIC = b"maskrcnn_tf2_tpu.engine.v2"


def _fresh_compile(fn, args, compiler_options):
    """Lower+compile bypassing the persistent compilation cache.

    An executable *restored from the cache* deserializes with missing thunk
    definitions ("Buffer Definition Event: Function ... not found" at run
    time on this jaxlib) — only a fresh compile serializes correctly. jax
    latches cache-enablement once per process (``is_cache_used`` memoizes
    its decision), so flipping the config flag alone is not enough in a
    process that already compiled with the cache on (test fixture, detect
    CLI, warm serving host): we must also ``reset_cache()`` to un-latch the
    memoized decision, and reset again after restoring the flag so later
    compiles re-latch with the cache re-enabled.
    """
    import jax
    from jax._src import compilation_cache as _cc

    cache_was_on = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    _cc.reset_cache()
    try:
        return jax.jit(fn).lower(*args).compile(compiler_options=compiler_options)
    finally:
        jax.config.update("jax_enable_compilation_cache", cache_was_on)
        _cc.reset_cache()


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
    from maskrcnn_tf2_tpu.utils.compile_cache import host_fingerprint
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
    compiled = _fresh_compile(infer, (variables, images, meta), compiler_options)
    serialized, in_tree, out_tree = serialize_executable.serialize(compiled)

    dev = jax.devices()[0]
    payload = {
        "platform": dev.platform,
        "device_kind": getattr(dev, "device_kind", ""),
        "host_fp": host_fingerprint(),
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
    blob = pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)
    digest = hashlib.sha256(blob).hexdigest()
    with open(path, "wb") as f:
        f.write(_MAGIC + b" " + digest.encode() + b"\n")
        f.write(blob)
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

    Raises a clear error when the artifact targets a different backend,
    device kind, or host — the same contract as TRT engines (arch-pinned;
    inference_optimize.py:24-64 builds per-device). Only load engines from
    trusted sources: the payload is a pickle stream (see module docstring).
    """
    import jax
    from jax.experimental import serialize_executable

    from maskrcnn_tf2_tpu.utils.compile_cache import host_fingerprint

    with open(path, "rb") as f:
        header = f.read(len(_MAGIC) + 66)  # magic + ' ' + 64 hex + '\n'
        if not header.startswith(_MAGIC + b" "):
            raise ValueError(f"{path} is not a maskrcnn_tf2_tpu engine artifact")
        digest = header[len(_MAGIC) + 1 : -1].decode()
        blob = f.read()
    if hashlib.sha256(blob).hexdigest() != digest:
        raise ValueError(f"{path} is corrupt (sha256 mismatch) — rebuild the engine")
    payload = pickle.loads(blob)

    dev = jax.devices()[0]
    platform = dev.platform
    if payload["platform"] != platform:
        raise RuntimeError(
            f"engine was built for backend '{payload['platform']}' but this "
            f"process runs '{platform}' — rebuild with build_engine() "
            "(engines are backend-pinned, like TRT engines; use "
            "export_stablehlo for a portable artifact)"
        )
    kind = getattr(dev, "device_kind", "")
    if payload.get("device_kind", kind) != kind:
        raise RuntimeError(
            f"engine was built for device kind '{payload['device_kind']}' but "
            f"this process runs '{kind}' — rebuild with build_engine() on "
            "this device (engines are device-pinned, like TRT engines)"
        )
    # CPU AOT executables embed LLVM target features of the build host;
    # loading them on a different host fails at run time deep inside the
    # executable. Refuse up front with an actionable message.
    if platform == "cpu" and payload.get("host_fp") not in (None, host_fingerprint()):
        raise RuntimeError(
            "engine was built on a different host (CPU-feature/jaxlib "
            "fingerprint mismatch) — rebuild with build_engine() on this "
            "host (CPU engines are host-pinned)"
        )
    n_dev = payload.get("num_devices", 1)
    loaded = serialize_executable.deserialize_and_load(
        payload["serialized"],
        payload["in_tree"],
        payload["out_tree"],
        execution_devices=jax.devices()[:n_dev],
    )
    return Engine(payload, loaded)
