"""Test configuration: run the whole suite on a virtual 8-device CPU mesh
so sharding paths (DP/TP) are exercised without TPU hardware, per
SURVEY.md §4 (multi-host CPU simulation). Must run before jax imports.

Note: the axon sitecustomize pins JAX_PLATFORMS=axon; only
jax.config.update("jax_platforms", ...) overrides it.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: full-suite reruns skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8
