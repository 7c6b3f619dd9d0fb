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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
