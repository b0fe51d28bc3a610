"""Test configuration: force a hermetic 8-device CPU JAX backend.

Tests never require TPU hardware — the XLA CPU backend is the fake backend
(the reference has none, SURVEY.md §4), and the virtual 8-device host
platform exercises the multi-chip sharding paths.

Note: the dev image's sitecustomize pre-imports jax and registers the TPU
plugin, so env-var-only configuration is too late; we override via
jax.config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng(request):
    # Function-scoped and seeded per test: a shared session stream makes
    # draw-sensitive tests depend on which tests ran before them (adding a
    # test file changed the draws seen by a homography-exactness test).
    import zlib

    # zlib.crc32, not hash(): str hashes are salted per process.
    seed = zlib.crc32(request.node.nodeid.encode())
    return np.random.default_rng(seed)


@pytest.fixture(scope="session")
def cpu_devices():
    devices = jax.devices()
    assert devices[0].platform == "cpu"
    return devices
