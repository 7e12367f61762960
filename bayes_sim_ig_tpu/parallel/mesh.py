"""Mesh construction and env-axis sharding helpers."""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None, **kwargs):
    """Multi-host init. The reference has no distributed backend at all;
    on TPU pods this wires DCN coordination so a 1-D env mesh spans hosts.

    With no arguments it auto-detects the cluster environment (the
    standard ``jax.distributed.initialize()`` contract); explicit
    arguments support manual bring-up, including the single-process form
    (num_processes=1, process_id=0, coordinator on localhost) that the
    test suite exercises. Returns True if initialization happened, False
    if it was skipped (already initialized, or nothing to coordinate).

    Only the benign failure modes are swallowed: already-initialized and
    (for argument-free auto-detection) no-cluster-environment. A genuine
    bring-up failure with explicit coordinator arguments — bad address,
    mismatched process count — re-raises instead of silently falling back
    to single-host (ADVICE round 2)."""
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id, **kwargs)
        return True
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        # Benign: this process is already past distributed bring-up
        # (initialized earlier, or the XLA backend is already live).
        # Match the specific phrasings — a bare "already" substring also
        # matches genuine failures like "address already in use"
        # (round-3 review finding).
        if ("already initialized" in msg
                or "should only be called once" in msg
                or "must be called before" in msg
                or "backend is already" in msg):
            return False
        if not explicit:
            return False  # no cluster env to auto-detect
        raise


def make_mesh(n_devices: Optional[int] = None, axis: str = ENV_AXIS) -> Mesh:
    """1-D mesh over (the first ``n_devices``) devices; envs shard along it."""
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, \
            f"need {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(axis,))


def env_sharding(mesh: Mesh, axis: str = ENV_AXIS) -> NamedSharding:
    """Leading-axis (env) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(state, mesh: Mesh, num_envs: int,
                    axis: str = ENV_AXIS):
    """Places an EnvState-like pytree on the mesh: leaves with a leading
    env axis are sharded along it, everything else is replicated."""
    shard = env_sharding(mesh, axis)
    repl = replicated_sharding(mesh)

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, state)


def shard_batch(batch, mesh: Mesh, axis: str = ENV_AXIS):
    """Shards a data batch (e.g. MDNN training data) along its leading axis
    and lets GSPMD turn the loss reduction into a cross-device psum."""
    shard = env_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, shard), batch)
