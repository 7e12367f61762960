"""Vectorized JAX tasks and the env factory."""

from .task import (
    Task, EnvState, VecEnv, env_step, env_full_reset,
    CLIP_OBSERVATIONS, CLIP_ACTIONS,
)
from .pendulum import Pendulum
from .cartpole import Cartpole
from .ant import Ant
from .flyers import Ingenuity, Quadcopter
from .ball_balance import BallBalance
from .anymal import Anymal
from .humanoid import Humanoid
from .franka_cabinet import FrankaCabinet
from .shadow_hand import ShadowHand

_TASK_REGISTRY = {
    "Pendulum": Pendulum,
    "Cartpole": Cartpole,
    "Ant": Ant,
    "Ingenuity": Ingenuity,
    "Quadcopter": Quadcopter,
    "BallBalance": BallBalance,
    "Anymal": Anymal,
    "Humanoid": Humanoid,
    "FrankaCabinet": FrankaCabinet,
    "ShadowHand": ShadowHand,
}


def register_task(name, cls):
    _TASK_REGISTRY[name] = cls


def available_tasks():
    return sorted(_TASK_REGISTRY)


def make_env(task_name: str, cfg: dict, seed: int = 0) -> VecEnv:
    """Creates a vectorized env for a task (replaces ``make_ig_env``,
    ig_env_wrappers.py:411-426, without the eval()-based class lookup)."""
    if task_name not in _TASK_REGISTRY:
        raise KeyError(f"Unknown task '{task_name}'. "
                       f"Available: {available_tasks()}")
    task = _TASK_REGISTRY[task_name](cfg)
    # Asymmetric actor-critic switch (reference env-config key,
    # cfg/shadow_hand.yaml:43): the PPO critic consumes
    # task.privileged_state instead of the DR-noised observations.
    task.asymmetric_observations = bool(
        cfg.get("env", {}).get("asymmetric_observations", False))
    if task.asymmetric_observations:
        # state_dim from abstract shapes only (jax.eval_shape traces
        # init_state without running it).
        import jax
        import jax.numpy as jnp
        import numpy as np
        params = jax.ShapeDtypeStruct(
            (task.num_envs, len(task.params_spec.lows)), jnp.float32)
        st = jax.eval_shape(task.init_state,
                            jax.ShapeDtypeStruct((2,), jnp.uint32), params)
        task.state_dim = int(sum(np.prod(l.shape[1:])
                                 for l in jax.tree_util.tree_leaves(st)))
    return VecEnv(task, seed=seed)


__all__ = ["Task", "EnvState", "VecEnv", "env_step", "env_full_reset",
           "Pendulum", "Cartpole", "Ant", "Ingenuity", "Quadcopter",
           "make_env", "register_task", "available_tasks",
           "CLIP_OBSERVATIONS", "CLIP_ACTIONS"]
