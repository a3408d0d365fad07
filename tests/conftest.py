"""Test configuration: CPU backend with 8 virtual devices (multi-chip sharding
tests run on a simulated mesh) and float64 for enumeration-grade accuracy.

Note: the container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (the TPU tunnel), so env vars set here are too late — the
platform must be forced through jax.config instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite is compile-bound on this 2-core box,
# and one process accumulating hundreds of live LLVM compilations has
# (reproducibly) segfaulted XLA's CPU backend — cached reruns sidestep both.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# XLA:CPU's JIT has (reproducibly, ~1-in-2 full-suite runs on this box)
# segfaulted inside backend_compile_and_load once a single process has
# accumulated 50+ tests' worth of live LLVM compilations.  Dropping the
# in-process executable caches between test modules releases the loaded
# code objects; the persistent on-disk cache (.jax_cache_cpu) makes the
# cross-module recompiles cheap loads instead of fresh LLVM work.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
