"""Test config: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is first imported anywhere — the TPU-native
multi-device code paths (shard_map over a Mesh) are exercised on CPU exactly
as the driver's dryrun does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # overwrite: host env may pin the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site hook may have force-registered an accelerator plugin and overridden
# jax_platforms at interpreter start; the config update wins as long as no
# backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache (keyed on optimized HLO + flags, so changed code
# still recompiles): the end-to-end train-step fixture alone is ~10 min of
# one-core XLA:CPU compile per run without it. Separate dir from the TPU
# cache to keep eviction behavior independent.
from maskrcnn_tf2_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable(
    os.path.expanduser("~/.cache/maskrcnn_tf2_tpu/xla_cpu_tests")
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
