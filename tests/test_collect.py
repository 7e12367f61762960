"""Tests for jitted rollout collection: label/trajectory consistency (the
extern_actor_params invariant), padding, rewards, and collection policies."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayes_sim_ig_tpu.distributions import Uniform, to_device_distr
from bayes_sim_ig_tpu.rl import process_ppo
from bayes_sim_ig_tpu.sim import make_env
from bayes_sim_ig_tpu.utils.collect import (
    collect_trajectories, policy_ones, policy_random, policy_rl,
    policy_rl_randomized, get_collect_policy,
)
from .test_sim import pendulum_cfg, pendulum_oracle_step


@pytest.fixture(scope="module", autouse=True)
def _module_teardown():
    # One cleanup for the whole module (instead of conftest's per-test
    # clear): drop the shared env/ppo objects and their executables.
    yield
    _make_ppo.cache_clear()
    jax.clear_caches()


@functools.lru_cache(maxsize=None)
def _make_ppo(num_envs=16, episode_len=20):
    # Cached per shape: reusing the same task/ppo objects across tests
    # lets the jit cache hit (3 compiles for the module instead of 9 —
    # ~25 s on the 1-CPU suite runner). Tests only assert
    # self-consistent physics invariants, never exact key streams.
    env = make_env("Pendulum", pendulum_cfg(num_envs, episode_len))
    spec = env.task.params_spec
    env.set_distr(to_device_distr(Uniform(spec.lows, spec.highs)))
    cfg_train = {"seed": 0, "learn": {"nsteps": 8}, "policy": {}}
    return process_ppo(env, cfg_train, logdir="/tmp/bsim_test")


class TestCollect:
    def test_get_state_surface(self):
        # Asymmetric actor-critic privileged-state surface
        # (collect_trajectories.py:47-50): flattened per-env task state.
        ppo = _make_ppo(num_envs=4)
        ppo.vec_env.reset()
        st = ppo.vec_env.get_state()
        assert st.shape[0] == 4 and st.ndim == 2
        assert np.isfinite(np.asarray(st)).all()

    def test_shapes_and_counts(self):
        ppo = _make_ppo(num_envs=16)
        params, states, acts, rews, imgs = collect_trajectories(
            40, ppo, policy_ones, max_traj_len=10)
        assert params.shape == (40, 2)
        assert states.shape == (40, 11, 3)
        assert acts.shape == (40, 11, 1)
        assert rews.shape == (40,)
        assert imgs == []

    def test_labels_match_trajectory_physics(self):
        """The collected param labels must be the exact physics params that
        generated each trajectory: replay the recorded actions through the
        oracle dynamics from the recorded initial state and compare."""
        ppo = _make_ppo(num_envs=8)
        params, states, acts, rews, _ = collect_trajectories(
            8, ppo, policy_random, max_traj_len=10)
        params = np.asarray(params)
        states = np.asarray(states)
        acts = np.asarray(acts)
        task = ppo.vec_env.task
        m = params[:, task._mass_dim]
        l = params[:, task._length_dim]
        th = np.arctan2(states[:, 0, 1], states[:, 0, 0])
        thdot = states[:, 0, 2]
        for t in range(10):
            u = np.clip(acts[:, t, 0], -1, 1) * 2.0
            th, thdot = pendulum_oracle_step(th, thdot, u, m, l)
            np.testing.assert_allclose(np.cos(th), states[:, t + 1, 0],
                                       rtol=1e-3, atol=2e-4)
            np.testing.assert_allclose(thdot, states[:, t + 1, 2],
                                       rtol=1e-3, atol=2e-3)

    def test_rewards_match_oracle(self):
        ppo = _make_ppo(num_envs=8)
        params, states, acts, rews, _ = collect_trajectories(
            8, ppo, policy_ones, max_traj_len=10)
        params, states, acts = map(np.asarray, (params, states, acts))
        task = ppo.vec_env.task
        m = params[:, task._mass_dim]
        l = params[:, task._length_dim]
        th = np.arctan2(states[:, 0, 1], states[:, 0, 0])
        thdot = states[:, 0, 2]
        total = np.zeros(8)
        for t in range(10):
            u = np.clip(acts[:, t, 0], -1, 1) * 2.0
            angle_norm = ((th + np.pi) % (2 * np.pi)) - np.pi
            total += -(angle_norm ** 2 + 0.1 * thdot ** 2 + 0.001 * u ** 2)
            th, thdot = pendulum_oracle_step(th, thdot, u, m, l)
        np.testing.assert_allclose(np.asarray(rews), total, rtol=1e-3,
                                   atol=1e-3)

    def test_multiple_rounds(self):
        ppo = _make_ppo(num_envs=8)
        params, states, *_ = collect_trajectories(
            20, ppo, policy_ones, max_traj_len=5)
        assert params.shape[0] == 20 and states.shape == (20, 6, 3)
        # Labels across rounds must differ (fresh param draws).
        assert np.abs(np.asarray(params[:8]) -
                      np.asarray(params[8:16])).max() > 1e-3

    def test_visualize_renders_frames(self):
        ppo = _make_ppo(num_envs=4)
        *_, imgs = collect_trajectories(4, ppo, None, max_traj_len=5,
                                        visualize=True)
        assert len(imgs) == 6
        assert imgs[0].shape == (200, 200, 3)


class TestPolicies:
    def test_transforms(self):
        act = jnp.full((5, 2), 0.3)
        key = jax.random.PRNGKey(0)
        np.testing.assert_array_equal(np.asarray(policy_ones(act, key)), 1.0)
        r = np.asarray(policy_random(act, key))
        assert (r >= 0).all() and (r <= 1).all()  # U[0,1] quirk preserved
        np.testing.assert_array_equal(np.asarray(policy_rl(act, key)),
                                      np.asarray(act))

    def test_rl_randomized_mixture(self):
        act = jnp.zeros((4, 1))
        changed = 0
        for i in range(200):
            out = policy_rl_randomized(act, jax.random.PRNGKey(i))
            if float(jnp.abs(out).max()) > 0:
                changed += 1
        assert 5 <= changed <= 50  # ~10% of steps fully randomized

    def test_grasp_excitation(self):
        """policy_grasp: flexion/opposition dofs pinned near max, wrist/
        abduction dofs jittering near neutral, everything in [-1, 1].
        The layout comes from the TASK (ShadowHand.grasp_excitation_dims;
        VERDICT round-4 weak #5), not from collection code."""
        from bayes_sim_ig_tpu.sim.shadow_hand import ShadowHand
        from bayes_sim_ig_tpu.utils.collect import policy_grasp
        dims = ShadowHand.grasp_excitation_dims
        act = jnp.zeros((64, 20))
        out = np.asarray(policy_grasp(act, jax.random.PRNGKey(3), dims))
        assert (out >= -1.0).all() and (out <= 1.0).all()
        flex = out[:, list(dims)]
        rest = np.delete(out, list(dims), axis=1)
        assert (flex >= 0.7).all()            # sustained squeeze
        assert (np.abs(rest) <= 0.3).all()    # wrist stays near neutral
        assert np.abs(rest).std() > 0.05      # but genuinely jitters

    def test_registry(self):
        assert get_collect_policy("policy_ones") is policy_ones
        assert get_collect_policy(None) is policy_rl
        with pytest.raises(KeyError):
            get_collect_policy("policy_nope")

    def test_grasp_resolution_per_task(self):
        """policy_grasp resolves against the task: hand tasks get their
        declared excitation dims; tasks without the attribute (e.g.
        Cartpole) degrade to policy_ones semantics with a warning
        rather than pinning arbitrary action dims."""
        import warnings
        from bayes_sim_ig_tpu.sim.shadow_hand import ShadowHand
        from bayes_sim_ig_tpu.utils.collect import policy_ones

        class _HandLike:
            grasp_excitation_dims = ShadowHand.grasp_excitation_dims

        fn = get_collect_policy("policy_grasp", task=_HandLike())
        out = np.asarray(fn(jnp.zeros((4, 20)), jax.random.PRNGKey(0)))
        assert (out[:, list(_HandLike.grasp_excitation_dims)] >= 0.7).all()

        class _CartpoleLike:
            pass

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            fn = get_collect_policy("policy_grasp", task=_CartpoleLike())
            assert fn is policy_ones
            assert any("grasp_excitation_dims" in str(x.message)
                       for x in w)
        ones = np.asarray(fn(jnp.zeros((4, 1)), jax.random.PRNGKey(0)))
        assert (ones == 1.0).all()


class TestStorageAndKeystreamGates:
    """The TPU-only collection fast paths, forced on CPU
    (collect.py `_store_dtype` / `_collect_key`)."""

    def _round(self, ppo, key):
        from bayes_sim_ig_tpu.utils.collect import _collect_round
        task = ppo.vec_env.task
        return _collect_round(task, ppo.policy_apply, policy_random, 11,
                              ppo.train_state.params, ppo.vec_env._distr,
                              key)

    def test_bf16_episode_storage_matches_f32(self, monkeypatch):
        # Banked trajectory copies may round to bf16 (<=0.4% rel); the
        # returned arrays stay float32 and labels/rewards stay exact.
        ppo = _make_ppo(num_envs=8)
        key = jax.random.PRNGKey(3)
        monkeypatch.setenv("BSIM_COLLECT_BF16", "0")
        jax.clear_caches()
        lab32, st32, ac32, rw32 = map(np.asarray, self._round(ppo, key))
        monkeypatch.setenv("BSIM_COLLECT_BF16", "force")
        jax.clear_caches()
        lab16, st16, ac16, rw16 = map(np.asarray, self._round(ppo, key))
        assert st16.dtype == np.float32 and ac16.dtype == np.float32
        np.testing.assert_array_equal(lab16, lab32)
        np.testing.assert_array_equal(rw16, rw32)
        rel = np.max(np.abs(st16 - st32) / (np.abs(st32) + 1e-6))
        assert rel < 5e-3, rel

    def test_rbg_keystream_collects_finite(self, monkeypatch):
        # Opt-in rbg keystream produces valid (finite, in-range) rounds.
        ppo = _make_ppo(num_envs=8)
        monkeypatch.setenv("BSIM_RBG_RNG", "force")
        jax.clear_caches()
        labels, states, acts, rews = map(
            np.asarray, self._round(ppo, jax.random.PRNGKey(4)))
        assert np.isfinite(states).all() and np.isfinite(rews).all()
        assert (acts >= 0).all() and (acts <= 1).all()  # policy_random
