"""Persistent XLA compilation cache.

Compiles of the full detector graph take minutes; caching them across
processes makes CLIs/benches start in seconds on warm runs. Call
``enable()`` early (idempotent).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/maskrcnn_tf2_tpu/xla")


def enable(cache_dir: str | None = None) -> str:
    import jax

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
