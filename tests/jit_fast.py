"""Per-jit fast-compile options for compile-dominated, runtime-light tests.

Measured on the one-core CI box: ``xla_backend_optimization_level=0`` cuts
XLA:CPU compile ~30% but slows executed code ~3x — so apply it ONLY to
tests that compile a big graph and run it once or twice (mode switches,
backbone builds), never to files that train many steps (test_end_to_end).
"""

import jax

FAST_COMPILE = {"xla_backend_optimization_level": 0}


def jit_fast(fn):
    return jax.jit(fn, compiler_options=FAST_COMPILE)
