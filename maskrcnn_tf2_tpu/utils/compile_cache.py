"""Persistent XLA compilation cache, keyed by a host fingerprint.

Compiles of the full detector graph take minutes; caching them across
processes makes CLIs/benches start in seconds on warm runs. Call
``enable()`` early (idempotent).

Why the fingerprint: XLA:CPU AOT entries embed LLVM target features of the
machine that compiled them (e.g. ``+prefer-no-scatter``/``+prefer-no-gather``
on some hosts). Loading such an entry on a host with different CPU features
produces broken executables that fail at *run* time with
``NOT_FOUND: Buffer Definition Event: Function ... not found`` (and sprays
``cpu_aot_loader`` machine-feature-mismatch warnings). jax's own cache key
does not include host CPU features, so we key the cache *directory* instead:
a cache written on box A is simply invisible on box B. This mirrors the
portability contract TRT engines state explicitly (reference
inference_optimize.py:24-64 builds per-device engines).
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform
from functools import lru_cache

_DEFAULT_DIR = os.path.expanduser("~/.cache/maskrcnn_tf2_tpu/xla")


@lru_cache(maxsize=None)
def _cpu_feature_string() -> str:
    """CPU identity + ISA feature flags of this host.

    These determine the LLVM target features XLA:CPU bakes into AOT
    executables — the exact axis on which cross-machine cache entries break.
    """
    try:
        model, flags = "", ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                elif not flags and line.startswith("flags"):
                    # Sort: flag *set* matters, ordering is kernel-dependent.
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                if model and flags:
                    break
        if model or flags:
            return f"{model}|{flags}"
    except OSError:
        pass
    return f"{_platform.machine()}|{_platform.processor()}"


def host_fingerprint() -> str:
    """Short stable fingerprint of (platform, jax/jaxlib versions, CPU
    features) — anything that can invalidate a compiled-executable artifact
    across hosts."""
    import jax
    import jaxlib

    raw = "|".join(
        [
            _platform.system(),
            _platform.machine(),
            jax.__version__,
            jaxlib.__version__,
            _cpu_feature_string(),
        ]
    )
    return hashlib.sha256(raw.encode()).hexdigest()[:16]


def enable(cache_dir: str | None = None) -> str:
    """Enable the persistent compile cache under a host-fingerprinted subdir.

    The fingerprint subdir is appended to whatever base directory is chosen
    (argument > $JAX_COMPILATION_CACHE_DIR > default), so an explicit path
    (e.g. the test suite's ``xla_cpu_tests``) is machine-keyed too.
    """
    import jax

    base = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    path = os.path.join(base, host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
