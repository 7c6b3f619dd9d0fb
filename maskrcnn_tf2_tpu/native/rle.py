"""On-demand-built native RLE codec loader.

Compiles ``rle_ext.c`` once with the system compiler into
``~/.cache/maskrcnn_tf2_tpu/native/`` (keyed by source md5) and loads it as
an extension module. Every consumer must treat ``get() is None`` as "use the
numpy fallback" — no toolchain, sandboxed FS, or any compile error quietly
degrades to the pure-Python path (data/coco.py keeps full behavior).

Reference counterpart: pycocotools' C mask API, which the reference imports
for all RLE work (samples/coco/coco.py:356-442).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sysconfig
from importlib.machinery import ExtensionFileLoader
from importlib.util import module_from_spec, spec_from_loader

_mod = None
_tried = False


def _build_and_load():
    src = os.path.join(os.path.dirname(__file__), "rle_ext.c")
    with open(src, "rb") as f:
        tag = hashlib.md5(f.read()).hexdigest()[:12]
    cache = os.path.join(
        os.path.expanduser("~/.cache/maskrcnn_tf2_tpu/native")
    )
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"_rle_native_{tag}.so")
    if not os.path.exists(so):
        cc = os.environ.get("CC", "cc")
        tmp = so + f".tmp{os.getpid()}"
        subprocess.run(
            [cc, "-O3", "-shared", "-fPIC",
             f"-I{sysconfig.get_paths()['include']}", src, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, so)  # atomic: concurrent builders race safely
    loader = ExtensionFileLoader("_rle_native", so)
    spec = spec_from_loader("_rle_native", loader)
    mod = module_from_spec(spec)
    loader.exec_module(mod)
    return mod


def get():
    """The native module, or None if it cannot be built/loaded here."""
    global _mod, _tried
    if not _tried:
        _tried = True
        if os.environ.get("MASKRCNN_TPU_NO_NATIVE_RLE"):
            _mod = None
        else:
            try:
                _mod = _build_and_load()
            except Exception:
                _mod = None
    return _mod
