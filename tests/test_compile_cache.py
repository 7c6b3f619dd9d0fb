"""Machine-keyed persistent compile cache (VERDICT r3 weak #1).

XLA:CPU AOT cache entries embed the build host's LLVM target features;
loading them on a different host fails at RUN time ("Buffer Definition
Event ... not found"). The fix keys the cache *directory* by a host
fingerprint so a cache written on box A is invisible on box B. These tests
plant a foreign-fingerprint cache and verify it is never selected.
"""

import os

import jax

from maskrcnn_tf2_tpu.utils import compile_cache


def test_fingerprint_is_stable_and_short():
    a = compile_cache.host_fingerprint()
    b = compile_cache.host_fingerprint()
    assert a == b
    assert len(a) == 16
    int(a, 16)  # hex


def test_fingerprint_tracks_cpu_features(monkeypatch):
    """Different CPU features (the exact axis cpu_aot_loader reports
    mismatched across boxes) => different fingerprint => different dir."""
    base = compile_cache.host_fingerprint()
    monkeypatch.setattr(
        compile_cache, "_cpu_feature_string", lambda: "OtherCPU|+fancy-isa"
    )
    assert compile_cache.host_fingerprint() != base


def test_enable_routes_around_planted_foreign_cache(tmp_path, monkeypatch):
    """A cache dir populated under a different machine's fingerprint must
    not be selected by enable() on this machine."""
    prev_dir = jax.config.jax_compilation_cache_dir
    try:
        # plant: a foreign box wrote entries under its own fingerprint
        monkeypatch.setattr(
            compile_cache, "_cpu_feature_string", lambda: "ForeignCPU|+prefer-no-scatter"
        )
        foreign = compile_cache.enable(str(tmp_path))
        os.makedirs(foreign, exist_ok=True)
        with open(os.path.join(foreign, "poisoned_entry"), "w") as f:
            f.write("aot entry compiled elsewhere")

        # this box: enable() with the same base dir picks a DIFFERENT subdir
        monkeypatch.undo()
        local = compile_cache.enable(str(tmp_path))
        assert local != foreign
        assert os.path.basename(local) == compile_cache.host_fingerprint()
        assert not os.listdir(local)  # the poisoned entry is invisible
        assert jax.config.jax_compilation_cache_dir == local
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)


def test_enable_respects_explicit_base(tmp_path):
    prev_dir = jax.config.jax_compilation_cache_dir
    try:
        path = compile_cache.enable(str(tmp_path / "custom"))
        assert path.startswith(str(tmp_path / "custom"))
        assert os.path.isdir(path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
