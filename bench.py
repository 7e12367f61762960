"""Headline benchmark: env steps/sec through the full collection hot path
(policy MLP forward + physics + per-env DR resampling at resets) with 4096
Pendulum envs on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 5e6 — the BASELINE.json north-star target of
5e6 env steps/sec (the reference publishes no numbers of its own; Isaac Gym
reports ~100k-700k steps/s per task on an A100, BASELINE.md).

``python bench.py --full`` additionally reports the other BASELINE.json
metrics (MDNN training samples/sec; seconds per Pendulum adaptive-DR
iteration) as extra JSON lines after the headline.
"""

import json
import sys
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
    if "--full" in sys.argv:
        bench_mdnn()
        bench_adr_iter()


def bench_mdnn():
    """MDNN training throughput: samples/sec through the jitted scan
    (reference trains 100 updates x minibatch 100 per 1000-traj chunk)."""
    import numpy as np
    from bayes_sim_ig_tpu.models import MDNN

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(10000, 40), jnp.float32)
    y = jnp.asarray(rs.rand(10000, 2), jnp.float32)
    m = MDNN(input_dim=40, output_dim=2,
             output_lows=np.zeros(2, np.float32),
             output_highs=np.ones(2, np.float32), n_gaussians=10,
             full_covariance=False, hidden_layers=(128, 128),
             activation="tanh", lr=1e-4)
    n_updates, batch = 1000, 100
    m.run_training(x, y, 10, batch)  # compile small variant first
    t0 = time.perf_counter()
    m.run_training(x, y, n_updates, batch)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "mdnn_train_samples_per_sec",
        "value": round(n_updates * batch / dt, 1),
        "unit": "samples/s",
    }))


def bench_adr_iter():
    """One full Pendulum adaptive-DR iteration (10k rollouts + MDNN fit +
    PPO retrain + eval), warm-compiled — the BASELINE.json < 60 s target."""
    import os
    import shutil
    import tempfile
    import yaml

    from bayes_sim_ig_tpu.utils.args import init_args
    import bayes_sim_ig_tpu.bayes_sim_main as bsm

    cfg_path = os.path.join(os.path.dirname(__file__), "bayes_sim_ig_tpu",
                            "cfg", "pendulum.yaml")
    cfg = yaml.safe_load(open(cfg_path))
    cfg["bayessim"]["realIters"] = 2  # iter 0 compiles, iter 1 is timed
    cfg["bayessim"]["realEvals"] = 100
    tmp = tempfile.mkdtemp(prefix="bsim_bench_")
    tmp_cfg = os.path.join(tmp, "pendulum.yaml")
    yaml.safe_dump(cfg, open(tmp_cfg, "w"), sort_keys=False)
    # Reuse the main loop and scrape per-iteration seconds from the TB
    # scalar it writes.
    bsm.main(["--task", "Pendulum", "--logdir", tmp, "--max_iterations",
              "20", "--seed", "0", "--headless", "--cfg_env", tmp_cfg])
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    import glob
    ea = EventAccumulator(glob.glob(os.path.join(tmp, "*", "bsim"))[0])
    ea.Reload()
    secs = [s.value for s in ea.Scalars("perf/sec_per_adr_iter")]
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({
        "metric": "pendulum_adr_iteration_sec_warm",
        "value": round(secs[-1], 1),
        "unit": "s (cold first iter: %.1f)" % secs[0],
        "vs_baseline": round(60.0 / max(secs[-1], 1e-9), 3),
    }))


if __name__ == "__main__":
    main()
