"""Tests for the jitted PPO trainer."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from bayes_sim_ig_tpu.distributions import MoG, to_device_distr
from bayes_sim_ig_tpu.rl import process_ppo
from bayes_sim_ig_tpu.sim import make_env
from .test_sim import pendulum_cfg


def _fixed_param_env(num_envs=64, episode_len=100):
    """Pendulum with params pinned to (1, 1) so learning is stationary."""
    env = make_env("Pendulum", pendulum_cfg(num_envs, episode_len))
    spec = env.task.params_spec
    mog = MoG(a=[1.0], ms=[np.ones(2)], Ss=[np.eye(2) * 1e-10])
    env.set_distr(to_device_distr(mog, spec.lows, spec.highs))
    return env


@pytest.mark.heavy
def test_ppo_learns_pendulum(tmp_path):
    env = _fixed_param_env()
    cfg_train = {"seed": 0, "learn": {
        "nsteps": 64, "noptepochs": 5, "nminibatches": 4,
        "optim_stepsize": 1e-3, "desired_kl": 0.008, "gamma": 0.95,
        "save_interval": 1000}, "policy": {
        "pi_hid_sizes": [64, 64], "vf_hid_sizes": [64, 64]}}
    ppo = process_ppo(env, cfg_train, logdir=str(tmp_path))
    # Measure mean step reward before and after training.
    rewards = []
    orig_run_metrics = []

    def eval_reward():
        obs = env.reset()
        tot = 0.0
        for _ in range(60):
            act, _ = ppo.act(obs, deterministic=True)
            obs, rew, done, _ = env.step(act)
            tot += float(np.asarray(rew).mean())
        return tot / 60

    before = eval_reward()
    ppo.run(num_learning_iterations=60, log_interval=1000)
    after = eval_reward()
    # Random policy mean step reward is about -5.5; a learning policy
    # should improve substantially within 60 iterations.
    assert after > before + 1.0, f"PPO did not learn: {before} -> {after}"
    assert ppo.current_learning_iteration == 60


@pytest.mark.heavy
def test_save_load_roundtrip(tmp_path):
    env = _fixed_param_env(num_envs=8, episode_len=20)
    cfg_train = {"seed": 0, "learn": {"nsteps": 4, "noptepochs": 1,
                                      "nminibatches": 1,
                                      "save_interval": 1000},
                 "policy": {"pi_hid_sizes": [8], "vf_hid_sizes": [8]}}
    ppo = process_ppo(env, cfg_train, logdir=str(tmp_path))
    ppo.run(num_learning_iterations=2, log_interval=1000)
    path = os.path.join(str(tmp_path), "ckpt.ckpt")
    ppo.save(path)
    obs = env.reset()
    a1 = np.asarray(ppo.act(obs, deterministic=True)[0])
    ppo2 = process_ppo(env, cfg_train, logdir=str(tmp_path))
    a2 = np.asarray(ppo2.act(obs, deterministic=True)[0])
    assert np.abs(a1 - a2).max() > 1e-6  # different init
    ppo2.load(path)
    a3 = np.asarray(ppo2.act(obs, deterministic=True)[0])
    np.testing.assert_allclose(a3, a1, rtol=1e-6)
    assert ppo2.current_learning_iteration == 2


@pytest.mark.heavy
def test_counter_continuation(tmp_path):
    """ftuneRL mode continues the iteration counter (bayes_sim_main.py:
    118-122)."""
    env = _fixed_param_env(num_envs=8, episode_len=20)
    cfg_train = {"seed": 0, "learn": {"nsteps": 4, "noptepochs": 1,
                                      "nminibatches": 1,
                                      "save_interval": 1000},
                 "policy": {"pi_hid_sizes": [8], "vf_hid_sizes": [8]}}
    ppo = process_ppo(env, cfg_train, logdir=str(tmp_path))
    ppo.run(num_learning_iterations=3, log_interval=1000)
    ppo.current_learning_iteration = 10
    ppo.run(num_learning_iterations=12, log_interval=1000)
    assert ppo.current_learning_iteration == 12


def test_gae_matches_numpy_reference():
    import numpy as np
    import jax.numpy as jnp
    from bayes_sim_ig_tpu.rl.ppo import gae_advantages

    rs = np.random.RandomState(0)
    T, N = 12, 5
    vals = rs.randn(T, N).astype(np.float32)
    rews = rs.randn(T, N).astype(np.float32)
    dones = (rs.rand(T, N) < 0.2).astype(np.float32)
    last_val = rs.randn(N).astype(np.float32)
    gamma, lam = 0.99, 0.95
    got = np.asarray(gae_advantages(
        jnp.asarray(vals), jnp.asarray(rews), jnp.asarray(dones),
        jnp.asarray(last_val), gamma, lam))
    # Direct backward recursion in numpy.
    want = np.zeros((T, N), np.float32)
    gae = np.zeros(N, np.float32)
    val_next = last_val
    for t in reversed(range(T)):
        nonterm = 1.0 - dones[t]
        delta = rews[t] + gamma * val_next * nonterm - vals[t]
        gae = delta + gamma * lam * nonterm * gae
        want[t] = gae
        val_next = vals[t]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.heavy
def test_ppo_reinit_fresh_policy_same_programs():
    """reinit re-draws the policy and resets the iteration counter while
    keeping shapes — the ADR loop's per-iteration RL restart path."""
    import jax
    env = _fixed_param_env(num_envs=8, episode_len=20)
    cfg_train = {"seed": 0, "learn": {"nsteps": 4, "noptepochs": 1,
                                      "nminibatches": 1,
                                      "save_interval": 1000},
                 "policy": {"pi_hid_sizes": [8], "vf_hid_sizes": [8]}}
    ppo = process_ppo(env, cfg_train, logdir="/tmp/ppo_reinit_test")
    ppo.run(2, log_interval=100)
    params_before = jax.tree_util.tree_map(np.asarray,
                                           ppo.train_state.params)
    it_before = ppo.current_learning_iteration
    assert it_before > 0
    ppo.reinit(seed=7)
    assert ppo.current_learning_iteration == 0
    diffs = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()),
        params_before, jax.tree_util.tree_map(np.asarray,
                                              ppo.train_state.params)))
    assert max(diffs) > 1e-4
    ppo.run(1, log_interval=100)  # trains again without error


def test_asymmetric_actor_critic(tmp_path):
    """`asymmetric_observations` (reference cfg/shadow_hand.yaml:43,
    surface at collect_trajectories.py:47-50): the critic consumes the
    privileged simulator state, the actor only the observations; one
    jitted train iteration runs and vec_env.get_state() matches the
    declared state_dim."""
    cfg = pendulum_cfg(num_envs=16, episode_len=20)
    cfg["env"]["asymmetric_observations"] = True
    env = make_env("Pendulum", cfg)
    task = env.task
    assert task.asymmetric_observations
    # Pendulum task state is (th, thdot) pairs -> 2 dims, obs is 3-dim
    # [cos th, sin th, thdot]: the two widths genuinely differ.
    assert task.state_dim > 0 and task.state_dim != task.obs_dim
    spec = task.params_spec
    mog = MoG(a=[1.0], ms=[np.ones(2)], Ss=[np.eye(2) * 1e-10])
    env.set_distr(to_device_distr(mog, spec.lows, spec.highs))
    cfg_train = {"seed": 0, "learn": {
        "nsteps": 8, "noptepochs": 2, "nminibatches": 2,
        "save_interval": 1000}, "policy": {
        "pi_hid_sizes": [16], "vf_hid_sizes": [16]}}
    ppo = process_ppo(env, cfg_train, logdir=str(tmp_path))
    assert ppo.asymmetric
    # Critic first layer reads the privileged width, actor the obs width.
    assert ppo.train_state.params["critic"][0]["w"].shape[0] == \
        task.state_dim
    assert ppo.train_state.params["actor"][0]["w"].shape[0] == task.obs_dim
    ppo.run(num_learning_iterations=2, log_interval=1000)
    # The reference call shape: act(obs, vec_env.get_state()).
    obs = env.reset()
    states = env.get_state()
    assert states.shape == (task.num_envs, task.state_dim)
    act, _ = ppo.actor_critic.act(obs, states)
    assert act.shape == (task.num_envs, task.act_dim)
    assert np.isfinite(np.asarray(act)).all()
