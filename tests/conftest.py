"""Test configuration: force an 8-virtual-device CPU platform before JAX loads.

Multi-chip sharding paths (pjit over a Mesh) are exercised on a virtual CPU
mesh so the suite runs anywhere; the real TPU chip is reserved for bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU test math deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# `import pytest` already imported jax via a plugin, so the env vars above are
# too late for jax's config snapshot — update it directly (the backend itself
# initializes lazily, so this still takes effect).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
