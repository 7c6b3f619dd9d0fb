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
kind, host fingerprint, and the jax/jaxlib versions, and fails with a clear
"rebuild" error instead of a runtime NOT_FOUND deep inside the executable.

Weights travel inside the artifact (as the TRT engine's do), passed as
runtime arguments so the executable itself stays weight-agnostic
(``refit``-able, in TRT terms).

File format (v3): a text header line ``maskrcnn_tf2_tpu.engine.v3 <sha256>``
followed by three length-prefixed sections (8-byte big-endian length each):

  1. JSON metadata (platform/device/versions/shapes + the weight manifest:
     per-leaf key path, dtype, shape),
  2. the raw concatenated weight bytes (C-order, decoded via the manifest —
     no pickle, bfloat16 carried as declared-dtype raw bytes),
  3. the jax-internal serialized executable.

The sha256 covers sections 1+2+3 and is verified before anything is parsed.
Sections 1 and 2 are decoded with JSON + ``np.frombuffer`` only. Section 3
is a ``jax.experimental.serialize_executable`` payload, which internally
uses pickle — that is the ONLY pickle in the artifact, it is jax's own
format, and it is touched only after the platform/device/host/version gates
pass. The sha256 catches corruption/truncation, NOT malice: **engines must
only be loaded from trusted sources** (deserializing an attacker-supplied
executable is arbitrary code execution — treat an ``.engine`` file like a
Python wheel, not a data file; TRT engines carry the same caveat).
"""

from __future__ import annotations

import hashlib
import json
import struct
from typing import Dict, Optional

import numpy as np

from maskrcnn_tf2_tpu.config import MaskRCNNConfig

_MAGIC = b"maskrcnn_tf2_tpu.engine.v3"


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


def _flatten_vars(variables):
    """Flatten a nested-dict variable pytree to sorted (path, ndarray) pairs.

    Paths join nested keys with '/'; deterministic order (sorted) so the
    byte stream is reproducible. Only plain dict nesting is supported — the
    engine converts FrozenDicts up front.
    """
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k in sorted(node):
                rec(f"{prefix}/{k}" if prefix else str(k), node[k])
        else:
            flat[prefix] = np.asarray(node)

    rec("", variables)
    return sorted(flat.items())


def _unflatten_vars(pairs):
    root: dict = {}
    for path, arr in pairs:
        keys = path.split("/")
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = arr
    return root


def _to_plain_dict(tree):
    """FrozenDict/dict pytree -> plain nested dict (leaves -> numpy)."""
    if hasattr(tree, "items"):
        return {k: _to_plain_dict(v) for k, v in tree.items()}
    return np.asarray(tree)


def _encode_weights(variables):
    """-> (manifest list, concatenated raw bytes). bfloat16 (or any
    non-standard dtype) is carried as raw bytes under its dtype name and
    reconstructed via ml_dtypes at load — no pickle anywhere."""
    manifest = []
    chunks = []
    for path, arr in _flatten_vars(variables):
        # NOT ascontiguousarray: it promotes 0-d arrays (quant scales) to
        # shape (1,); tobytes() already emits a C-order copy for any layout.
        manifest.append(
            {"key": path, "dtype": arr.dtype.name, "shape": list(arr.shape)}
        )
        chunks.append(arr.tobytes())
    return manifest, b"".join(chunks)


def _decode_weights(manifest, raw):
    import ml_dtypes  # ships with jax; resolves bfloat16/float8 names

    pairs = []
    off = 0
    for ent in manifest:
        try:
            dt = np.dtype(ent["dtype"])
        except TypeError:
            dt = np.dtype(getattr(ml_dtypes, ent["dtype"]))
        n = int(np.prod(ent["shape"], dtype=np.int64)) * dt.itemsize
        arr = np.frombuffer(raw[off : off + n], dtype=dt).reshape(ent["shape"])
        pairs.append((ent["key"], arr))
        off += n
    if off != len(raw):
        raise ValueError("engine weight section length mismatch — rebuild")
    return _unflatten_vars(pairs)


def _write_section(f, data: bytes):
    f.write(struct.pack(">Q", len(data)))
    f.write(data)


def _split_sections(blob: bytes, n: int):
    out, off = [], 0
    for _ in range(n):
        if off + 8 > len(blob):
            raise ValueError("truncated engine artifact — rebuild")
        (ln,) = struct.unpack(">Q", blob[off : off + 8])
        off += 8
        if off + ln > len(blob):
            raise ValueError("truncated engine artifact — rebuild")
        out.append(blob[off : off + ln])
        off += ln
    return out


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
    import jaxlib
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
    # Compile against the PLAIN-DICT variables so load_engine can rebuild the
    # call's pytree structure from the weight manifest alone (a FrozenDict
    # tree would not round-trip through the pickle-free container).
    host_vars = _to_plain_dict(variables)
    compiled = _fresh_compile(infer, (host_vars, images, meta), compiler_options)
    serialized, in_tree, out_tree = serialize_executable.serialize(compiled)
    # The treedefs are reconstructed at load from (variables, images, meta)
    # — verify that reconstruction is faithful NOW, at build time.
    assert in_tree == jax.tree_util.tree_structure(((host_vars, images, meta), {}))
    assert out_tree == jax.tree_util.tree_structure((images, images))

    dev = jax.devices()[0]
    manifest, weight_bytes = _encode_weights(host_vars)
    meta_json = json.dumps(
        {
            "platform": dev.platform,
            "device_kind": getattr(dev, "device_kind", ""),
            "host_fp": host_fingerprint(),
            "jax_version": jax.__version__,
            "jaxlib_version": jaxlib.__version__,
            "backbone": config.backbone,
            "batch_size": batch_size,
            "image_shape": list(config.image_shape),
            "meta_size": int(config.meta_size),
            "config_md5": config.md5(),
            "num_devices": len(compiled._executable.xla_executable.local_devices()),
            "weights": manifest,
        }
    ).encode()

    sha = hashlib.sha256()
    import io

    body = io.BytesIO()
    for section in (meta_json, weight_bytes, serialized):
        _write_section(body, section)
    blob = body.getvalue()
    sha.update(blob)
    with open(path, "wb") as f:
        f.write(_MAGIC + b" " + sha.hexdigest().encode() + b"\n")
        f.write(blob)
    return path


class Engine:
    """A loaded AOT engine: ``engine(images_u8, image_meta)`` with no
    compilation at load or call time (the TRT-engine runtime analog,
    README.md:421-437 Jetson flow)."""

    def __init__(self, payload, variables, loaded):
        self.batch_size = payload["batch_size"]
        self.image_shape = tuple(payload["image_shape"])
        self.meta_size = payload["meta_size"]
        self.backbone = payload["backbone"]
        self.config_md5 = payload["config_md5"]
        self._variables = variables
        self._loaded = loaded

    def __call__(self, images, image_meta):
        det, masks = self._loaded(self._variables, images, image_meta)
        return np.asarray(det), np.asarray(masks)


def load_engine(path: str) -> Engine:
    """Deserialize and load an engine built by :func:`build_engine`.

    Raises a clear error when the artifact targets a different backend,
    device kind, host, or jax/jaxlib version — the same contract as TRT
    engines (arch-pinned; inference_optimize.py:24-64 builds per-device).
    Only sections decoded with JSON/np.frombuffer are touched before the
    gates; the jax-internal executable payload (the one pickle, see module
    docstring) is deserialized last. Only load engines from trusted sources.
    """
    import jax
    import jaxlib
    import jax.numpy as jnp
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
    meta_json, weight_bytes, serialized = _split_sections(blob, 3)
    payload = json.loads(meta_json)

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
    # A same-host engine loaded under a different jax/jaxlib fails deep
    # inside serialize_executable.deserialize with an obscure error — the
    # exact failure class the version gates exist to front-run (ADVICE r4).
    for name, mod in (("jax", jax), ("jaxlib", jaxlib)):
        built = payload.get(f"{name}_version")
        if built is not None and built != mod.__version__:
            raise RuntimeError(
                f"engine was built under {name} {built} but this process "
                f"runs {name} {mod.__version__} — rebuild with "
                "build_engine() (serialized executables are version-pinned)"
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
    variables = _decode_weights(payload["weights"], weight_bytes)
    h, w, c = payload["image_shape"]
    img_spec = jax.ShapeDtypeStruct((payload["batch_size"], h, w, c), jnp.uint8)
    meta_spec = jax.ShapeDtypeStruct(
        (payload["batch_size"], payload["meta_size"]), jnp.float32
    )
    in_tree = jax.tree_util.tree_structure(((variables, img_spec, meta_spec), {}))
    out_tree = jax.tree_util.tree_structure((0, 0))
    n_dev = payload.get("num_devices", 1)
    loaded = serialize_executable.deserialize_and_load(
        serialized,
        in_tree,
        out_tree,
        execution_devices=jax.devices()[:n_dev],
    )
    return Engine(payload, variables, loaded)
