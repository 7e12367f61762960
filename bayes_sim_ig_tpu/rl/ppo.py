"""PPO trainer, jit-compiled end to end.

Replaces the closed-source ``rlgpu.utils.process_ppo`` PPO the reference
drives (used surface: ``run(num_learning_iterations, log_interval)``,
``load(path)``, ``vec_env``, ``actor_critic.act(obs)``,
``current_learning_iteration`` — bayes_sim_main.py:81,88,111-122,
collect_trajectories.py:47-50).

TPU-first: one learning iteration — an ``nsteps`` rollout over all envs
(with per-env domain re-randomization at resets), GAE, and
``noptepochs x nminibatches`` clipped-PPO updates — is a single jitted
program; the host loop only logs and checkpoints. Rollout and update are
data-parallel over the env axis and shard over a device mesh (see
``parallel/``).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import replicate
from ..sim.task import env_step, env_full_reset
from . import networks


def gae_advantages(vals, rews, dones, last_val, gamma, lam):
    """Generalized advantage estimation over a (T, N) rollout with the IG
    done-on-last-step convention: done_t = 1 masks the bootstrap value of
    the post-episode state."""
    def body(carry, xs):
        gae_next, val_next = carry
        val, rew, done = xs
        nonterminal = 1.0 - done
        delta = rew + gamma * val_next * nonterminal - val
        gae = delta + gamma * lam * nonterminal * gae_next
        return (gae, val), gae

    (_, _), advs = jax.lax.scan(
        body, (jnp.zeros_like(last_val), last_val),
        (vals, rews, dones), reverse=True)
    return advs


class PPOTrainState(NamedTuple):
    params: Any
    opt_state: Any
    lr: jnp.ndarray  # current (possibly KL-adapted) learning rate


class _ActorCriticHandle:
    """Exposes the reference's ``actor_critic.act(obs)`` call shape."""

    def __init__(self, ppo: "PPO"):
        self._ppo = ppo

    def act(self, obs, *args):
        return self._ppo.act(obs)

    def act_inference(self, obs):
        return self._ppo.act(obs, deterministic=True)[0]


class PPO:
    """Clipped-surrogate PPO with GAE and optional adaptive-KL LR."""

    def __init__(self, vec_env, cfg_train: Dict, logdir: str,
                 writer=None, seed: Optional[int] = None):
        self.vec_env = vec_env
        self.task = vec_env.task
        self.logdir = logdir
        self.writer = writer
        learn = cfg_train["learn"]
        policy_cfg = cfg_train.get("policy", {})
        self.gamma = float(learn.get("gamma", 0.99))
        self.lam = float(learn.get("lam", 0.95))
        self.cliprange = float(learn.get("cliprange", 0.2))
        self.ent_coef = float(learn.get("ent_coef", 0.0))
        self.vf_coef = float(learn.get("value_loss_coef", 1.0))
        self.nsteps = int(learn.get("nsteps", 16))
        self.noptepochs = int(learn.get("noptepochs", 8))
        self.nminibatches = int(learn.get("nminibatches", 4))
        self.max_grad_norm = float(learn.get("max_grad_norm", 1.0))
        self.init_lr = float(learn.get("optim_stepsize", 3e-4))
        self.desired_kl = learn.get("desired_kl", None)
        self.schedule = learn.get("schedule", "adaptive"
                                  if self.desired_kl else "fixed")
        self.save_interval = int(learn.get("save_interval", 50))
        self.activation = policy_cfg.get("activation", "elu")
        pi_hid = policy_cfg.get("pi_hid_sizes", [64, 64])
        vf_hid = policy_cfg.get("vf_hid_sizes", [64, 64])
        init_noise_std = float(policy_cfg.get("init_noise_std", 1.0))
        if seed is None:
            seed = int(cfg_train.get("seed", 0))
        self._key = jax.random.PRNGKey(seed + 12345)
        self._key, init_key = jax.random.split(self._key)
        # Asymmetric actor-critic (reference `asymmetric_observations`,
        # cfg/shadow_hand.yaml:43): the critic reads the privileged
        # simulator state (task.privileged_state / vec_env.get_state),
        # the actor only the DR-noised observations.
        self.asymmetric = bool(getattr(self.task,
                                       "asymmetric_observations", False))
        state_dim = (int(getattr(self.task, "state_dim", 0))
                     if self.asymmetric else 0)
        self._net_spec = (self.task.obs_dim, self.task.act_dim, pi_hid,
                          vf_hid, init_noise_std, state_dim)
        params = networks.init_actor_critic(init_key, *self._net_spec)
        # The lr is folded in manually after opt.update (updates below are
        # the negated Adam direction), so the KL-adaptive schedule can change
        # it without rebuilding optimizer state.
        self._opt = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm),
            optax.scale_by_adam(),
            optax.scale(-1.0),
        )
        # Replicated over the global mesh when one is installed — the env
        # axis must never split the policy (parallel/mesh.py).
        self.train_state = replicate(PPOTrainState(
            params=params, opt_state=self._opt.init(params),
            lr=jnp.asarray(self.init_lr)))
        self.actor_critic = _ActorCriticHandle(self)
        self.current_learning_iteration = 0
        self._train_iter_fn = None
        self._act_fn = jax.jit(
            lambda p, o, k: networks.sample_action(p, o, k,
                                                   self.activation))
        # Stable (per-instance) pure policy fn for jitted collection loops.
        activation = self.activation
        self.policy_apply = (
            lambda p, o, k: networks.sample_action(p, o, k, activation)[0])
        self._mean_fn = jax.jit(
            lambda p, o: networks.policy_mean(p, o, self.activation))

    def reinit(self, seed: int, logdir: Optional[str] = None, writer=None):
        """Fresh policy/optimizer/iteration counter, reusing the compiled
        rollout/update programs (same shapes -> jit cache hits). The ADR
        loop restarts RL every iteration when ftuneRL is off; re-creating
        the PPO instance instead recompiles the (large) physics programs
        each time, which is slow and eventually crashed the remote TPU
        runtime."""
        self._key = jax.random.PRNGKey(seed + 12345)
        self._key, init_key = jax.random.split(self._key)
        fresh = networks.init_actor_critic(init_key, *self._net_spec)
        self.train_state = replicate(PPOTrainState(
            params=fresh, opt_state=self._opt.init(fresh),
            lr=jnp.asarray(self.init_lr)))
        self.current_learning_iteration = 0
        if logdir is not None:
            self.logdir = logdir
        if writer is not None:
            self.writer = writer

    # ------------------------------------------------------------------ #
    def act(self, obs, deterministic=False):
        """Policy action in [-1, 1]-ish (unsquashed Gaussian, clipped by the
        env); returns (action, log_prob)."""
        if deterministic:
            a = self._mean_fn(self.train_state.params, obs)
            return a, None
        self._key, k = jax.random.split(self._key)
        return self._act_fn(self.train_state.params, obs, k)

    # ------------------------------------------------------------------ #
    def _build_train_iteration(self):
        task = self.task
        opt = self._opt
        activation = self.activation
        gamma, lam = self.gamma, self.lam
        cliprange, ent_coef, vf_coef = (self.cliprange, self.ent_coef,
                                        self.vf_coef)
        nsteps, noptepochs = self.nsteps, self.noptepochs
        nminibatches = self.nminibatches
        desired_kl = self.desired_kl
        adaptive = self.schedule == "adaptive" and desired_kl is not None
        asym = self.asymmetric  # static: trace-time branch only

        def rollout(params, distr, env_state, obs, key):
            def body(carry, step_key):
                env_state, obs = carry
                k_act, k_env = jax.random.split(step_key)
                act, logp = networks.sample_action(params, obs, k_act,
                                                   activation)
                # Asymmetric: the critic values the PRIVILEGED state of
                # the env the obs came from; symmetric path banks
                # nothing extra (identical HLO to before).
                cin = (task.privileged_state(env_state.task_state,
                                             env_state.params)
                       if asym else obs)
                val = networks.value(params, cin, activation)
                env_state, obs2, rew, done = env_step(task, distr,
                                                      env_state, act)
                out = (obs, act, logp, val, rew,
                       done.astype(jnp.float32))
                if asym:
                    out = out + (cin,)
                return (env_state, obs2), out

            keys = jax.random.split(key, nsteps)
            (env_state, obs), traj = jax.lax.scan(body, (env_state, obs),
                                                  keys)
            last_cin = (task.privileged_state(env_state.task_state,
                                              env_state.params)
                        if asym else obs)
            last_val = networks.value(params, last_cin, activation)
            return env_state, obs, traj, last_val

        def compute_gae(vals, rews, dones, last_val):
            return gae_advantages(vals, rews, dones, last_val, gamma, lam)

        def loss_fn(params, batch):
            if asym:
                obs, act, logp_old, val_old, adv, ret, cin = batch
            else:
                obs, act, logp_old, val_old, adv, ret = batch
                cin = obs
            mean = networks.policy_mean(params, obs, activation)
            logp = networks.gaussian_logp(act, mean, params["log_std"])
            ratio = jnp.exp(logp - logp_old)
            pg1 = -adv * ratio
            pg2 = -adv * jnp.clip(ratio, 1.0 - cliprange, 1.0 + cliprange)
            pg_loss = jnp.maximum(pg1, pg2).mean()
            v = networks.value(params, cin, activation)
            v_clipped = val_old + jnp.clip(v - val_old, -cliprange,
                                           cliprange)
            vf_loss = 0.5 * jnp.maximum((v - ret) ** 2,
                                        (v_clipped - ret) ** 2).mean()
            ent = networks.entropy(params["log_std"])
            total = pg_loss + vf_coef * vf_loss - ent_coef * ent
            approx_kl = ((ratio - 1.0) - jnp.log(ratio)).mean()
            return total, (pg_loss, vf_loss, approx_kl)

        def update_from_traj(train_state: PPOTrainState, traj, last_val,
                             k_perm):
            if asym:
                obs_t, act_t, logp_t, val_t, rew_t, done_t, cin_t = traj
            else:
                obs_t, act_t, logp_t, val_t, rew_t, done_t = traj
            advs = compute_gae(val_t, rew_t, done_t, last_val)
            rets = advs + val_t
            n = nsteps * task.num_envs

            def flat(x):
                return x.reshape((n,) + x.shape[2:])

            adv_flat = flat(advs)
            adv_flat = ((adv_flat - adv_flat.mean())
                        / (adv_flat.std() + 1e-8))
            data = (flat(obs_t), flat(act_t), flat(logp_t), flat(val_t),
                    adv_flat, flat(rets))
            if asym:
                data = data + (flat(cin_t),)

            def epoch(carry, ep_key):
                params, opt_state = carry
                perm = jax.random.permutation(ep_key, n)
                shuffled = jax.tree_util.tree_map(
                    lambda x: x[perm].reshape(
                        (nminibatches, n // nminibatches) + x.shape[1:]),
                    data)

                def minibatch(carry, mb):
                    params, opt_state = carry
                    (loss, aux), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params, mb)
                    # Skip non-finite updates: one bad minibatch (extreme-DR
                    # reward spike) must not NaN the policy for good.
                    ok = jnp.isfinite(loss)
                    for g in jax.tree_util.tree_leaves(grads):
                        ok &= jnp.isfinite(g).all()
                    new_upd, new_opt = opt.update(grads, opt_state, params)
                    opt_state = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(ok, a, b), new_opt, opt_state)
                    new_params = optax.apply_updates(
                        params, jax.tree_util.tree_map(
                            lambda u: u * train_state.lr, new_upd))
                    params = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(ok, a, b), new_params, params)
                    return (params, opt_state), (loss, *aux)

                (params, opt_state), metrics = jax.lax.scan(
                    minibatch, (params, opt_state), shuffled)
                return (params, opt_state), metrics

            ep_keys = jax.random.split(k_perm, noptepochs)
            (params, opt_state), metrics = jax.lax.scan(
                epoch, (train_state.params, train_state.opt_state), ep_keys)
            loss_m, pg_m, vf_m, kl_m = [m.mean() for m in metrics]
            lr = train_state.lr
            if adaptive:
                kl_last = metrics[3][-1].mean()
                lr = jnp.where(kl_last > desired_kl * 2.0,
                               jnp.maximum(lr / 1.5, 1e-6), lr)
                lr = jnp.where(kl_last < desired_kl / 2.0,
                               jnp.minimum(lr * 1.5, 1e-2), lr)
            new_state = PPOTrainState(params=params, opt_state=opt_state,
                                      lr=lr)
            iter_metrics = {
                "loss": loss_m, "pg_loss": pg_m, "vf_loss": vf_m,
                "approx_kl": kl_m, "lr": lr,
                "mean_reward": rew_t.mean(),
                "mean_episode_done": done_t.mean(),
            }
            return new_state, iter_metrics

        def train_iteration(train_state: PPOTrainState, distr, env_state,
                            obs, key):
            k_roll, k_perm = jax.random.split(key)
            env_state, obs, traj, last_val = rollout(
                train_state.params, distr, env_state, obs, k_roll)
            new_state, iter_metrics = update_from_traj(
                train_state, traj, last_val, k_perm)
            return new_state, env_state, obs, iter_metrics

        return jax.jit(train_iteration)

    # ------------------------------------------------------------------ #
    def run(self, num_learning_iterations, log_interval=1):
        """Trains until ``current_learning_iteration`` reaches
        ``num_learning_iterations`` (the reference continues the counter in
        ftuneRL mode, bayes_sim_main.py:118-122)."""
        assert self.vec_env._distr is not None, \
            "set the env sampling distribution before training"
        if self._train_iter_fn is None:
            self._train_iter_fn = self._build_train_iteration()
        obs = self.vec_env.reset()
        env_state = self.vec_env.state
        distr = self.vec_env._distr
        it = self.current_learning_iteration
        import time
        while it < num_learning_iterations:
            t0 = time.perf_counter()
            self._key, k = jax.random.split(self._key)
            self.train_state, env_state, obs, metrics = self._train_iter_fn(
                self.train_state, distr, env_state, obs, k)
            jax.block_until_ready(metrics["loss"])
            dt = time.perf_counter() - t0
            metrics["env_steps_per_sec"] = (
                self.nsteps * self.task.num_envs / dt)
            it += 1
            self.current_learning_iteration = it
            if self.writer is not None and (it % log_interval == 0
                                            or it == num_learning_iterations):
                for name, v in metrics.items():
                    self.writer.add_scalar(f"rl/{name}", float(v), it)
            if it % self.save_interval == 0 or it == num_learning_iterations:
                self.save(os.path.join(self.logdir,
                                       f"model_{it}.ckpt"))
        self.vec_env.state = env_state  # hand the env back
        return self

    # ------------------------------------------------------------------ #
    def save(self, path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        payload = {
            "params": jax.tree_util.tree_map(np.asarray,
                                             self.train_state.params),
            "lr": float(self.train_state.lr),
            "iteration": self.current_learning_iteration,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load(self, path):
        """Warm start from a checkpoint (bayessim.policyCheckpt,
        bayes_sim_main.py:87-88)."""
        with open(path, "rb") as f:
            payload = pickle.load(f)
        params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
        self.train_state = replicate(PPOTrainState(
            params=params, opt_state=self._opt.init(params),
            lr=jnp.asarray(payload.get("lr", self.init_lr))))
        self.current_learning_iteration = payload.get("iteration", 0)
        return self


def process_ppo(vec_env, cfg_train, logdir, writer=None, seed=None) -> PPO:
    """Factory matching the reference call shape (bayes_sim_main.py:81)."""
    return PPO(vec_env, cfg_train, logdir, writer=writer, seed=seed)
