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
