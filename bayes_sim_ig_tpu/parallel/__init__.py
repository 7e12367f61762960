"""Multi-chip scaling: env-sharded data parallelism over a device mesh.

The reference's entire multi-device story is placing the simulator and RL on
(at most) two CUDA devices (README.md:322-328); there is no distributed
backend (SURVEY.md §2.3). Here the first-class design is SPMD data
parallelism over the env axis of a ``jax.sharding.Mesh``:

  * env state / params / rollout streams are sharded along ``env``;
  * policy and MDNN parameters are replicated;
  * gradient and metric reductions become XLA ``psum``-style collectives
    over ICI, inserted automatically by the GSPMD partitioner when the
    jitted train step consumes sharded inputs;
  * multi-host runs initialize via ``jax.distributed`` (DCN between hosts,
    ICI within a slice).
"""

from .mesh import (
    make_mesh, env_sharding, replicated_sharding, shard_env_state,
    shard_batch, initialize_distributed,
    set_global_mesh, get_global_mesh, auto_mesh, constrain_env_sharded,
    replicate,
)

__all__ = ["make_mesh", "env_sharding", "replicated_sharding",
           "shard_env_state", "shard_batch", "initialize_distributed",
           "set_global_mesh", "get_global_mesh", "auto_mesh",
           "constrain_env_sharded", "replicate"]
