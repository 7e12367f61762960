"""Tests for the env core: Pendulum physics parity, IG-style reset/done
semantics, DR param specs, and noise."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayes_sim_ig_tpu.distributions import Uniform, MoG, to_device_distr
from bayes_sim_ig_tpu.dr import (build_params_spec, TaskNames,
                                 make_noise_config, apply_noise)
from bayes_sim_ig_tpu.sim import make_env


def pendulum_cfg(num_envs=16, episode_len=20):
    return {
        "env": {"numEnvs": num_envs, "episodeLength": episode_len},
        "task": {"randomize": True, "randomization_params": {
            "actor_params": {"pendulum": {
                "rigid_body_properties": {"mass": {
                    "range": [0.01, 2.0], "operation": "scaling",
                    "distribution": "uniform"}},
                "rigid_shape_properties": {"length": {
                    "range": [0.01, 2.0], "operation": "scaling",
                    "distribution": "uniform"}},
            }}}},
    }


def pendulum_oracle_step(th, thdot, u, m, l, g=10.0, dt=0.05):
    """Numpy transcription of openai_env_wrappers.py:159-171."""
    u = np.clip(u, -2.0, 2.0)
    newthdot = thdot + (-3 * g / (2 * l) * np.sin(th + np.pi)
                        + 3.0 / (m * l ** 2) * u) * dt
    newth = th + newthdot * dt
    newthdot = np.clip(newthdot, -8.0, 8.0)
    return newth, newthdot


class TestPendulumPhysics:
    def test_step_matches_oracle(self):
        env = make_env("Pendulum", pendulum_cfg())
        task = env.task
        rs = np.random.RandomState(0)
        n = task.num_envs
        params = np.stack([rs.uniform(0.1, 2.0, n),
                           rs.uniform(0.1, 2.0, n)], axis=1)
        th0 = rs.uniform(-np.pi, np.pi, n)
        thdot0 = rs.uniform(-1, 1, n)
        from bayes_sim_ig_tpu.sim.pendulum import PendulumState
        state = PendulumState(th=jnp.asarray(th0, jnp.float32),
                              thdot=jnp.asarray(thdot0, jnp.float32))
        acts = rs.uniform(-1, 1, (n, 1)).astype(np.float32)
        new = task.physics_step(state, jnp.asarray(acts),
                                jnp.asarray(params, jnp.float32), None)
        m = params[:, task._mass_dim]
        l = params[:, task._length_dim]
        th1, thdot1 = pendulum_oracle_step(th0, thdot0, acts[:, 0] * 2.0,
                                           m, l)
        np.testing.assert_allclose(np.asarray(new.th), th1, rtol=2e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(new.thdot), thdot1,
                                   rtol=2e-4, atol=1e-5)

    def test_reward_matches_oracle(self):
        env = make_env("Pendulum", pendulum_cfg())
        task = env.task
        from bayes_sim_ig_tpu.sim.pendulum import PendulumState
        th = np.array([0.1, 3.0, -2.0], np.float32)
        thdot = np.array([1.0, -4.0, 0.5], np.float32)
        state = PendulumState(th=jnp.asarray(th), thdot=jnp.asarray(thdot))
        acts = np.array([[0.5], [-1.0], [0.0]], np.float32)
        params = jnp.ones((3, 2))
        rew = np.asarray(task.reward(state, jnp.asarray(acts), params))
        u = np.clip(acts[:, 0] * 2.0, -2, 2)
        angle_norm = ((th + np.pi) % (2 * np.pi)) - np.pi
        expected = -(angle_norm ** 2 + 0.1 * thdot ** 2 + 0.001 * u ** 2)
        np.testing.assert_allclose(rew, expected, rtol=1e-5)


class TestEnvSemantics:
    def _env(self, max_len=11):
        cfg = pendulum_cfg(num_envs=8, episode_len=max_len)
        env = make_env("Pendulum", cfg)
        spec = env.task.params_spec
        env.set_distr(to_device_distr(Uniform(spec.lows, spec.highs)))
        return env

    def test_done_on_last_step_and_auto_rerandomize(self):
        env = self._env(max_len=11)
        env.reset()
        params0 = np.asarray(env.extern_params).copy()
        dones = []
        for _ in range(10):
            _, _, done, _ = env.step(jnp.zeros((8, 1)))
            dones.append(np.asarray(done).sum())
        # done exactly on step 10 (progress hits max_len-1 = 10).
        assert dones[:-1] == [0] * 9 and dones[-1] == 8
        # Params unchanged during the episode.
        np.testing.assert_array_equal(np.asarray(env.extern_params), params0)
        # Next step resets + re-randomizes every env.
        _, _, done, _ = env.step(jnp.zeros((8, 1)))
        assert np.asarray(done).sum() == 0
        params1 = np.asarray(env.extern_params)
        assert np.abs(params1 - params0).max() > 1e-3
        assert np.asarray(env.state.progress).max() == 0

    def test_full_reset_resamples_all(self):
        env = self._env()
        env.reset()
        p0 = np.asarray(env.extern_params).copy()
        env.reset()
        p1 = np.asarray(env.extern_params)
        assert np.abs(p1 - p0).max() > 1e-3

    def test_distr_controls_params(self):
        env = self._env()
        spec = env.task.params_spec
        target = np.array([1.3, 0.7])
        mog = MoG(a=[1.0], ms=[target], Ss=[np.eye(2) * 1e-8])
        env.set_distr(to_device_distr(mog, spec.lows, spec.highs))
        env.reset()
        np.testing.assert_allclose(np.asarray(env.extern_params),
                                   np.tile(target, (8, 1)), atol=1e-2)


class TestParamsSpec:
    def test_pendulum_spec(self):
        env = make_env("Pendulum", pendulum_cfg())
        spec = env.task.params_spec
        assert spec.names == ["pendulum_mass_mult", "pendulum_length_mult"]
        np.testing.assert_array_equal(spec.lows, [0.01, 0.01])
        np.testing.assert_array_equal(spec.defaults, [1.0, 1.0])

    def test_link_props_interleave_attrs_per_body(self):
        # Cartpole-style: friction+restitution per shape must interleave
        # (body0_attr0, body0_attr1, body1_attr0, ...), the order that
        # defines realParams vectors (reference params_generator.py:167-187).
        dr = {"actor_params": {"cartpole": {
            "rigid_shape_properties": {
                "friction": {"range": [0.01, 10.0], "operation": "scaling"},
                "restitution": {"range": [0.01, 1.0],
                                "operation": "additive"},
            },
            "dof_properties": {
                "stiffness": {"range": [0.01, 2.0], "operation": "additive"},
                "damping": {"range": [0.01, 100.0],
                            "operation": "additive"},
            },
        }}}
        names = TaskNames(body_names=["slider", "cart", "pole"],
                          shape_names=["slider", "cart", "pole"],
                          dof_names=["slider_to_cart", "cart_to_pole"])
        defaults = {"cartpole": {
            "rigid_shape_properties": {
                "friction": np.array([2.0, 6.0, 0.5]),
                "restitution": np.zeros(3)},
            "dof_properties": {
                "stiffness": np.zeros(2), "damping": np.zeros(2)},
        }}
        spec = build_params_spec(dr, {"cartpole": names}, defaults,
                                 plot_names_skip_patterns=["slider"])
        assert spec.names == [
            "slider_friction_mult", "slider_restitution",
            "cart_friction_mult", "cart_restitution",
            "pole_friction_mult", "pole_restitution",
            "slider_to_cart_stiffness", "cart_to_pole_stiffness",
            "slider_to_cart_damping", "cart_to_pole_damping",
        ]
        assert 0 in spec.skip_ids and 1 in spec.skip_ids
        assert 6 in spec.skip_ids and 8 in spec.skip_ids

    def test_operation_validation(self):
        dr = {"actor_params": {"a": {"rigid_body_properties": {
            "mass": {"range": [0, 1], "operation": "scaling"}}}}}
        names = {"a": TaskNames(body_names=["b"])}
        with pytest.raises(AssertionError, match="scaling zero default"):
            build_params_spec(dr, names, {"a": {"rigid_body_properties": {
                "mass": np.array([0.0])}}})
        dr2 = {"actor_params": {"a": {"rigid_body_properties": {
            "mass": {"range": [0, 1], "operation": "additive"}}}}}
        with pytest.raises(AssertionError, match="additive needs"):
            build_params_spec(dr2, names, {"a": {"rigid_body_properties": {
                "mass": np.array([1.0])}}})


class TestNoise:
    def test_gaussian_additive(self):
        cfg = make_noise_config({
            "distribution": "gaussian", "operation": "additive",
            "range": [0.0, 0.1]})
        x = jnp.zeros((2000, 4))
        corr = jnp.zeros((2000, 4))
        out = apply_noise(cfg, jax.random.PRNGKey(0), x, corr, 1000)
        out = np.asarray(out)
        assert abs(out.mean()) < 0.01
        assert out.std() == pytest.approx(0.1, abs=0.01)

    def test_scaling_schedule_interpolates_to_identity(self):
        cfg = make_noise_config({
            "distribution": "gaussian", "operation": "scaling",
            "range": [1.5, 0.0], "schedule": "linear",
            "schedule_steps": 100})
        x = jnp.ones((4, 3))
        corr = jnp.zeros((4, 3))
        # At frame 0 the schedule scaling is 0 -> multiplier is exactly 1.
        out0 = np.asarray(apply_noise(cfg, jax.random.PRNGKey(1), x, corr, 0))
        np.testing.assert_allclose(out0, 1.0, rtol=1e-6)
        # At frame >= schedule_steps, multiplier is the configured mean 1.5.
        out1 = np.asarray(apply_noise(cfg, jax.random.PRNGKey(1), x, corr,
                                      100))
        np.testing.assert_allclose(out1, 1.5, rtol=1e-6)

    def test_correlated_component_held_fixed(self):
        cfg = make_noise_config({
            "distribution": "gaussian", "operation": "additive",
            "range": [0.0, 0.0], "range_correlated": [0.0, 1.0]})
        x = jnp.zeros((3, 2))
        corr = jnp.asarray(np.random.RandomState(0).randn(3, 2)
                           .astype(np.float32))
        out1 = apply_noise(cfg, jax.random.PRNGKey(2), x, corr, 0)
        out2 = apply_noise(cfg, jax.random.PRNGKey(3), x, corr, 0)
        # White var is 0 -> output equals the held correlated draw.
        np.testing.assert_allclose(np.asarray(out1), np.asarray(corr),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-6)


class TestParamsGeneratorFacade:
    def test_reference_surface(self):
        from bayes_sim_ig_tpu.distributions import pdf
        env = make_env("Pendulum", pendulum_cfg(num_envs=4))
        gen = env.task.actor_params_generator
        assert list(gen.names) == ["pendulum_mass_mult",
                                   "pendulum_length_mult"]
        gen.set_distr(pdf.Uniform(gen.lows, gen.highs))
        smpl = gen.sample()
        assert smpl.shape == (2,)
        assert (smpl >= gen.lows).all() and (smpl <= gen.highs).all()
        # set_distr also retargeted the env's device sampler.
        obs = env.reset()
        assert obs.shape == (4, 3)


class TestNonFiniteQuarantine:
    def test_blown_up_env_is_reset_not_propagated(self):
        # An env whose physics goes NaN must emit sanitized outputs, be
        # flagged done, and reset (with fresh params) on the next step —
        # one unstable DR corner must not poison the whole batch.
        from bayes_sim_ig_tpu.sim.pendulum import Pendulum
        from bayes_sim_ig_tpu.sim.task import VecEnv

        class Exploding(Pendulum):
            def physics_step(self, state, actions, params, key):
                new = super().physics_step(state, actions, params, key)
                bomb = jnp.where(jnp.arange(new.th.shape[0]) == 0,
                                 jnp.nan, 0.0)
                return new._replace(th=new.th + bomb)

        cfg = pendulum_cfg(num_envs=4, episode_len=50)
        task = Exploding(cfg)
        env = VecEnv(task, seed=0)
        spec = task.params_spec
        env.set_distr(to_device_distr(Uniform(spec.lows, spec.highs)))
        env.reset()
        p0 = np.asarray(env.extern_params).copy()
        obs, rew, done, _ = env.step(jnp.zeros((4, 1)))
        assert np.isfinite(np.asarray(obs)).all()
        assert np.isfinite(np.asarray(rew)).all()
        done = np.asarray(done)
        assert done[0] == 1 and (done[1:] == 0).all()
        # Next step: env 0 re-randomizes and restarts; others continue.
        env.step(jnp.zeros((4, 1)))
        p1 = np.asarray(env.extern_params)
        assert np.abs(p1[0] - p0[0]).max() > 1e-3
        np.testing.assert_array_equal(p1[1:], p0[1:])
        assert np.asarray(env.state.progress)[0] == 0
