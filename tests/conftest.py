"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The XLA flag must be set before jax initializes its backends. This
environment's axon sitecustomize pins JAX_PLATFORMS, so the platform is
forced through jax.config (which wins) rather than the env var.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: most of the suite's wall time is
# XLA:CPU compiles of physics/training programs. Caching them on disk
# makes re-runs fast and survives the jax.clear_caches() below (that
# only drops in-memory executables). Cold first run is unaffected.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import pytest  # noqa: E402

# Modules whose tests each compile fresh (large) physics programs — every
# test builds new Task instances, so nothing is reused across tests, but
# the executables pile up in the process until XLA's CPU compiler
# segfaults near the end of a full-suite run. Dropping the caches after
# each such test bounds memory at zero recompile cost.
_HEAVY_MODULES = ("test_tasks", "test_task_behaviors", "test_parallel",
                  "test_ppo")
# test_collect intentionally NOT listed: its tests share lru_cached
# env/ppo objects so the jit cache can hit across tests; the module
# clears everything once at teardown (see its _module_teardown).


@pytest.fixture(autouse=True)
def _free_xla_executables(request):
    yield
    if request.module.__name__.rsplit(".", 1)[-1] in _HEAVY_MODULES:
        jax.clear_caches()
