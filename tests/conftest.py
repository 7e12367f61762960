"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Environment variables must be set before jax initializes its backends, so
this happens at conftest import time (pytest imports conftest before any
test module imports jax).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
