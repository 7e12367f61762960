"""Actor-critic networks for PPO, as plain parameter pytrees + pure apply
functions (replaces the policy half of IG's closed-source ``rlgpu`` PPO,
used by the reference at bayes_sim_main.py:81 and
collect_trajectories.py:47-50)."""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

import jax
import jax.numpy as jnp

_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
}


def _orthogonal_init(key, fan_in, fan_out, gain, dtype=jnp.float32):
    w = jax.nn.initializers.orthogonal(gain)(key, (fan_in, fan_out), dtype)
    return {"w": w, "b": jnp.zeros((fan_out,), dtype)}


def init_actor_critic(key, obs_dim: int, act_dim: int,
                      pi_hid_sizes: Sequence[int],
                      vf_hid_sizes: Sequence[int],
                      init_noise_std: float = 1.0,
                      state_dim: int = 0) -> Dict:
    """Separate actor and critic MLPs + state-independent log-std.

    ``state_dim`` > 0 gives the critic a different input width than the
    actor — the asymmetric actor-critic layout where the critic reads
    the privileged simulator state (reference `asymmetric_observations`;
    collect_trajectories.py:47-50)."""
    n_pi, n_vf = len(pi_hid_sizes), len(vf_hid_sizes)
    keys = jax.random.split(key, n_pi + n_vf + 2)
    actor, last = [], obs_dim
    for i, h in enumerate(pi_hid_sizes):
        actor.append(_orthogonal_init(keys[i], last, h, np.sqrt(2.0)))
        last = h
    actor.append(_orthogonal_init(keys[n_pi], last, act_dim, 0.01))
    critic, last = [], (state_dim if state_dim > 0 else obs_dim)
    for i, h in enumerate(vf_hid_sizes):
        critic.append(_orthogonal_init(keys[n_pi + 1 + i], last, h,
                                       np.sqrt(2.0)))
        last = h
    critic.append(_orthogonal_init(keys[n_pi + n_vf + 1], last, 1, 1.0))
    return {"actor": actor, "critic": critic,
            "log_std": jnp.full((act_dim,), float(np.log(init_noise_std)))}


def _mlp(layers, x, act):
    for layer in layers[:-1]:
        x = act(x @ layer["w"] + layer["b"])
    return x @ layers[-1]["w"] + layers[-1]["b"]


def policy_mean(params, obs, activation: str):
    return _mlp(params["actor"], obs, _ACTIVATIONS[activation])


def value(params, obs, activation: str):
    return _mlp(params["critic"], obs, _ACTIVATIONS[activation])[..., 0]


def sample_action(params, obs, key, activation: str):
    """Stochastic action + its log-prob under the diagonal Gaussian."""
    mean = policy_mean(params, obs, activation)
    std = jnp.exp(params["log_std"])
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    action = mean + std * eps
    logp = gaussian_logp(action, mean, params["log_std"])
    return action, logp


def gaussian_logp(action, mean, log_std):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return (-0.5 * jnp.sum(z ** 2, axis=-1)
            - jnp.sum(log_std)
            - 0.5 * action.shape[-1] * jnp.log(2.0 * jnp.pi))


def entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e))
