"""Cartpole task tests: param spec layout (defines realParams meaning),
dynamics sanity, termination, and rough energy behavior."""

import os

import numpy as np
import pytest
import yaml

import jax.numpy as jnp

from bayes_sim_ig_tpu.distributions import MoG, Uniform, to_device_distr
from bayes_sim_ig_tpu.sim import make_env

CFG = os.path.join(os.path.dirname(__file__), "..", "bayes_sim_ig_tpu",
                   "cfg", "cartpole.yaml")


def _env(num_envs=8, distr=None):
    cfg = yaml.safe_load(open(CFG))
    cfg["env"]["numEnvs"] = num_envs
    env = make_env("Cartpole", cfg)
    spec = env.task.params_spec
    if distr is None:
        distr = Uniform(spec.lows, spec.highs)
    env.set_distr(to_device_distr(distr, spec.lows, spec.highs))
    return env


def test_param_layout_matches_reference_realparams_order():
    env = _env()
    assert env.task.params_spec.names == [
        "slider_mass_mult", "cart_mass_mult", "pole_mass_mult",
        "slider_friction_mult", "slider_restitution",
        "cart_friction_mult", "cart_restitution",
        "pole_friction_mult", "pole_restitution",
        "slider_to_cart_stiffness", "cart_to_pole_stiffness",
        "slider_to_cart_damping", "cart_to_pole_damping",
    ]
    # The yaml realParams vector must be dimension-compatible.
    cfg = yaml.safe_load(open(CFG))
    assert len(cfg["env"]["realParams"]["means"][0]) == \
        env.task.params_spec.dim


def test_unforced_pole_falls_and_terminates():
    # With near-default params and no force, the pole falls over and the
    # env early-terminates within a few hundred steps.
    spec_dim = 13
    mean = np.ones(spec_dim)
    mean[9:] = 0.02  # negligible stiffness/damping
    distr = MoG(a=[1.0], ms=[mean], Ss=[np.eye(spec_dim) * 1e-10])
    env = _env(num_envs=16, distr=distr)
    env.reset()
    terminated = False
    for _ in range(400):
        _, _, done, _ = env.step(jnp.zeros((16, 1)))
        if int(np.asarray(done).sum()) > 0:
            terminated = True
            break
    assert terminated, "pole never fell without control"


@pytest.mark.heavy
def test_heavy_damping_slows_cart():
    # Same force, higher slider damping -> smaller cart displacement.
    dims = 13
    low_damp = np.ones(dims)
    low_damp[9:] = 0.02
    high_damp = low_damp.copy()
    high_damp[11] = 100.0  # slider_to_cart damping
    displacements = []
    for mean in (low_damp, high_damp):
        distr = MoG(a=[1.0], ms=[mean], Ss=[np.eye(dims) * 1e-12])
        env = _env(num_envs=4, distr=distr)
        env.reset()
        from bayes_sim_ig_tpu.sim.cartpole import CartpoleState
        env.state = env.state._replace(task_state=CartpoleState(
            x=jnp.zeros(4), x_dot=jnp.zeros(4), th=jnp.zeros(4),
            th_dot=jnp.zeros(4)))
        for _ in range(20):
            obs, _, _, _ = env.step(jnp.full((4, 1), 0.2))
        displacements.append(abs(float(np.asarray(obs)[0, 0])))
    assert displacements[1] < displacements[0] * 0.8


def test_reward_shape_and_termination_penalty():
    env = _env()
    task = env.task
    from bayes_sim_ig_tpu.sim.cartpole import CartpoleState
    state = CartpoleState(
        x=jnp.array([0.0, 5.0]), x_dot=jnp.array([1.0, 0.0]),
        th=jnp.array([0.1, 0.0]), th_dot=jnp.array([2.0, 0.0]))
    rew = np.asarray(task.reward(state, jnp.zeros((2, 1)),
                                 jnp.ones((2, 13))))
    assert rew[0] == np.float32(1.0 - 0.01 - 0.01 * 1.0 - 0.005 * 2.0)
    assert rew[1] == -2.0  # out of bounds
