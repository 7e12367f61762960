"""Vectorized Pendulum task — the one task whose physics lives fully in the
reference repo (``/root/reference/bayes_sim_ig/sim/openai_env_wrappers.py:
24-177``), reproduced here as pure batched JAX functions.

Dynamics (openai_env_wrappers.py:159-171): torque u in [-2, 2] (actions in
[-1, 1] scaled by max_torque), g = 10, dt = 0.05,
  newthdot = thdot + (-3 g / (2 l) sin(th + pi) + 3 / (m l^2) u) dt
  newth    = th + newthdot dt;  thdot clipped to +-8.
Reward (openai_env_wrappers.py:173-177), on the pre-step state:
  -(angle_norm(th)^2 + 0.1 thdot^2 + 0.001 u^2).
Obs: [cos th, sin th, thdot]. Reset state: th ~ U[-pi, pi],
thdot ~ U[-1, 1] (openai_env_wrappers.py:82-86).

Randomized params: mass and length, bound by name from the flat param spec
(openai_env_wrappers.py:43-49).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..dr import TaskNames, build_params_spec
from .task import Task


class PendulumState(NamedTuple):
    th: jnp.ndarray      # (N,)
    thdot: jnp.ndarray   # (N,)


def angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


class Pendulum(Task):
    name = "Pendulum"
    obs_dim = 3
    act_dim = 1
    # Classic gym semantics: reward of the state the action was taken in
    # (PendulumB steps AFTER computing the cost of the current th/thdot,
    # openai_env_wrappers.py:173-177) — unlike the IG tasks' post-step
    # reward (task.py module docstring).
    reward_post_step = False
    max_speed = 8.0
    max_torque = 2.0
    dt = 0.05
    gravity = 10.0

    def __init__(self, cfg):
        env_cfg = cfg["env"]
        self.num_envs = int(env_cfg["numEnvs"])
        self.max_episode_length = int(env_cfg["episodeLength"])
        self.params_spec = build_params_spec(
            cfg["task"]["randomization_params"],
            actor_names_map={"pendulum": TaskNames(
                body_names=["pendulum"], shape_names=["pendulum"],
                dof_names=["pendulum"], tendon_names=[])},
            defaults_map={"pendulum": {
                "rigid_body_properties": {"mass": np.array([1.0])},
                "rigid_shape_properties": {"length": np.array([1.0])},
            }})
        self._mass_dim = self.params_spec.index_of("mass")
        self._length_dim = self.params_spec.index_of("length")
        self.setup_noise(cfg["task"]["randomization_params"])

    # ------------------------------------------------------------------ #
    def init_state(self, key, params):
        n = params.shape[0]
        k1, k2 = jax.random.split(key)
        th = jax.random.uniform(k1, (n,), minval=-jnp.pi, maxval=jnp.pi)
        thdot = jax.random.uniform(k2, (n,), minval=-1.0, maxval=1.0)
        return PendulumState(th=th, thdot=thdot)

    def physics_step(self, state, actions, params, key):
        u = jnp.clip(actions[:, 0] * self.max_torque,
                     -self.max_torque, self.max_torque)
        m = params[:, self._mass_dim]
        l = params[:, self._length_dim]
        g, dt = self.gravity, self.dt
        newthdot = state.thdot + (
            -3.0 * g / (2.0 * l) * jnp.sin(state.th + jnp.pi)
            + 3.0 / (m * l ** 2) * u) * dt
        newth = state.th + newthdot * dt
        newthdot = jnp.clip(newthdot, -self.max_speed, self.max_speed)
        return PendulumState(th=newth, thdot=newthdot)

    def observe(self, state, params):
        return jnp.stack([jnp.cos(state.th), jnp.sin(state.th),
                          state.thdot], axis=-1)

    def reward(self, state, actions, params):
        u = jnp.clip(actions[:, 0] * self.max_torque,
                     -self.max_torque, self.max_torque)
        costs = (angle_normalize(state.th) ** 2
                 + 0.1 * state.thdot ** 2 + 0.001 * u ** 2)
        return -costs

    def render_obs_frame(self, obs_row, height=200, width=200):
        """Frame from one observation row [cos th, sin th, thdot] — lets
        the collector render from its recorded obs stream."""
        th = float(np.arctan2(obs_row[1], obs_row[0]))
        return self._draw(th, height, width)

    def get_img(self, env_state, env_id=0, height=200, width=200):
        """Minimal rasterized frame (rod + pivot) for TensorBoard videos,
        standing in for the reference's gym classic-control viewer
        (openai_env_wrappers.py:118-141)."""
        th = float(np.asarray(env_state.task_state.th[env_id]))
        return self._draw(th, height, width)

    def _draw(self, th, height, width):
        """Rasterizes the rod at angle ``th``."""
        img = np.full((height, width, 3), 255, np.uint8)
        cx, cy = width // 2, height // 2
        # Rod tip; screen y grows downward. Reference rotates by th + pi/2.
        ang = th + np.pi / 2
        tip = (cx + int(0.4 * width * np.cos(ang)),
               cy - int(0.4 * height * np.sin(ang)))
        n_pts = max(abs(tip[0] - cx), abs(tip[1] - cy), 1)
        xs = np.linspace(cx, tip[0], n_pts).astype(int)
        ys = np.linspace(cy, tip[1], n_pts).astype(int)
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                img[np.clip(ys + dy, 0, height - 1),
                    np.clip(xs + dx, 0, width - 1)] = (204, 77, 77)
        img[cy - 3:cy + 3, cx - 3:cx + 3] = 0
        return img
