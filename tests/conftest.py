"""Test configuration: force the CPU backend with 8 virtual devices.

The development/CI environment tunnels to a single real TPU chip via the
``axon`` PJRT plugin; tests instead run on CPU with
``--xla_force_host_platform_device_count=8`` so multi-device sharding
(mesh/pjit/shard_map) is exercised without a pod. This must happen before
jax is imported anywhere.
"""

import os
import sys

# Disable the axon TPU plugin registration (sitecustomize gates on this var)
# and force the host platform with 8 virtual devices.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already have been imported by a pytest plugin, in which case
# JAX_PLATFORMS was read at import time — override via the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: pipeline-level jits (slam_step & friends)
# take tens of seconds to compile on CPU; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/icpslam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# jax may already be in sys.modules (a pytest plugin can import it), but the
# backend must not have been initialized yet for the env vars to take effect.
assert jax.default_backend() == "cpu", (
    f"expected CPU backend for tests, got {jax.default_backend()}; "
    "jax was initialized before tests/conftest.py could set the platform"
)
del sys


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop JAX's in-memory executable caches after each test module.

    A full single-process `pytest tests/` accumulates every compiled
    slam_step/run_scans variant (hundreds of MB of executables); late in
    the run XLA:CPU compiles have segfaulted under that memory pressure
    (seen in r3 at ~85% through the suite, SIGSEGV/SIGABRT inside
    backend_compile). The persistent disk cache keeps cross-module
    recompiles cheap; only the in-memory handles are dropped.
    """
    yield
    jax.clear_caches()
