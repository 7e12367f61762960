"""Headline benchmark: env steps/sec through the full collection hot path
(policy MLP forward + physics + per-env DR resampling at resets) with 4096
Pendulum envs on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 5e6 — the BASELINE.json north-star target of
5e6 env steps/sec (the reference publishes no numbers of its own; Isaac Gym
reports ~100k-700k steps/s per task on an A100, BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp

NUM_ENVS = 4096
N_STEPS = 512
TARGET = 5.0e6


def main():
    from bayes_sim_ig_tpu.sim import make_env
    from bayes_sim_ig_tpu.sim.task import env_step
    from bayes_sim_ig_tpu.rl import process_ppo, networks
    from bayes_sim_ig_tpu.distributions import Uniform, to_device_distr

    cfg = {
        "env": {"numEnvs": NUM_ENVS, "episodeLength": 21},
        "bayessim": {},
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
    env = make_env("Pendulum", cfg)
    task = env.task
    spec = task.params_spec
    distr = to_device_distr(Uniform(spec.lows, spec.highs))
    env.set_distr(distr)
    cfg_train = {"seed": 0, "learn": {}, "policy": {}}
    ppo = process_ppo(env, cfg_train, logdir="/tmp/bsim_bench")
    policy_params = ppo.train_state.params
    activation = ppo.activation

    @jax.jit
    def rollout(policy_params, env_state, obs, key):
        def body(carry, step_key):
            env_state, obs = carry
            act, _ = networks.sample_action(policy_params, obs, step_key,
                                            activation)
            env_state, obs2, rew, done = env_step(task, distr, env_state,
                                                  act)
            return (env_state, obs2), rew.sum()

        keys = jax.random.split(key, N_STEPS)
        (env_state, obs), rews = jax.lax.scan(body, (env_state, obs), keys)
        return env_state, obs, rews.sum()

    obs = env.reset()
    env_state = env.state
    key = jax.random.PRNGKey(0)
    # Warmup/compile.
    env_state, obs, r = rollout(policy_params, env_state, obs, key)
    jax.block_until_ready(r)
    best = 0.0
    for i in range(3):
        t0 = time.perf_counter()
        env_state, obs, r = rollout(policy_params, env_state, obs,
                                    jax.random.PRNGKey(i + 1))
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        best = max(best, NUM_ENVS * N_STEPS / dt)
    print(json.dumps({
        "metric": "pendulum_env_steps_per_sec_4096envs",
        "value": round(best, 1),
        "unit": "env steps/s",
        "vs_baseline": round(best / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
