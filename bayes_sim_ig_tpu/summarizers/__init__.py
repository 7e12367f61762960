"""Trajectory summarizers: compress (states, actions) rollouts to fixed-size
feature vectors for BayesSim inference.

JAX re-implementations of the reference summarizers
(``/root/reference/bayes_sim_ig/utils/summarizers.py``). All functions are
pure, shape-static, jittable, vmappable and differentiable (the reference
README advertises backprop through summarizers). Inputs are
``states (N, T, S)`` and ``actions (N, T', A)``; outputs are ``(N, F)``.

Behavioral notes mirrored from the reference:
  * ``summary_waypts`` (summarizers.py:73-87) first chops/pads trajectories
    to exactly ``n_waypts`` steps, so its "evenly spaced waypoints" degenerate
    to the first ``n_waypts`` steps (chunk size is always 1 after the chop).
    We reproduce this exactly for parity.
  * ``cross_correlation`` (summarizers.py:90-122) diffs/drops along the
    FEATURE dimension (``states[:, :, 1:] - states[:, :, :-1]``), not time —
    reproduced exactly.
  * std uses ddof=1 (torch default) and is zeroed when fewer than 2 entries.
"""

from __future__ import annotations

import jax.numpy as jnp

from .signature import path_signature, signature_depth

__all__ = [
    "pad_states_actions", "summary_start", "summary_waypts",
    "cross_correlation", "summary_corr", "summary_corrdiff",
    "summary_signatory", "signature_depth", "path_signature",
    "get_summarizer",
]


def _pad_or_chop(x: jnp.ndarray, tgt_len: int) -> jnp.ndarray:
    """Chops ``x (N, T, D)`` to ``tgt_len`` steps, or pads by repeating the
    last frame (summarizers.py:47-60)."""
    t = x.shape[1]
    if t >= tgt_len:
        return x[:, :tgt_len]
    pad = jnp.repeat(x[:, -1:], tgt_len - t, axis=1)
    return jnp.concatenate([x, pad], axis=1)


def pad_states_actions(states, actions, tgt_actions_len=None):
    """Makes states and actions the same (target) length by chopping or
    repeat-last-frame padding (summarizers.py:20-62)."""
    assert states.ndim == 3, "Need states: ntraj x n_steps x state_dim"
    assert actions.ndim == 3, "Need actions: ntraj x n_steps x action_dim"
    if tgt_actions_len is None:
        tgt_actions_len = states.shape[1]
    states = _pad_or_chop(states, tgt_actions_len)
    actions = _pad_or_chop(actions, tgt_actions_len)
    return states, actions


def summary_start(states, actions, max_t=10):
    """Flattened initial snippet [s_t || a_t] for t < max_t
    (summarizers.py:65-70)."""
    states, actions = pad_states_actions(states, actions, max_t)
    feats = jnp.concatenate([states, actions], axis=-1)
    return feats.reshape(feats.shape[0], -1)


def summary_waypts(states, actions, n_waypts=10):
    """States/actions at waypoints (summarizers.py:73-87). Per the reference,
    trajectories are first chopped/padded to ``n_waypts`` steps, after which
    every step is a waypoint — output equals ``summary_start`` with
    ``max_t=n_waypts``."""
    states, actions = pad_states_actions(states, actions, n_waypts)
    feats = jnp.concatenate([states, actions], axis=-1)
    return feats.reshape(feats.shape[0], -1)


def cross_correlation(states, actions, use_state_diff=False):
    """Cross-correlation summaries (BayesSim RSS2019 Sec. IV.F; reference
    summarizers.py:90-122): outer product of state features and action
    features plus mean/std statistics of the state features."""
    states, actions = pad_states_actions(states, actions)
    ntraj, traj_len, state_dim = states.shape
    assert traj_len > 1, "empty episodes are problematic"
    assert actions.shape[1] == traj_len
    max_traj_len = 10 if state_dim <= 50 else 5
    if traj_len > max_traj_len:
        sa = summary_waypts(states, actions, n_waypts=max_traj_len)
        sa = sa.reshape(ntraj, max_traj_len, -1)
        states = sa[:, :, :state_dim]
        actions = sa[:, :, state_dim:]
    if use_state_diff:  # diff over FEATURE dims (reference behavior)
        state_feats = states[:, :, 1:] - states[:, :, :-1]
    else:
        state_feats = states[:, :, :-1]
    state_feats = state_feats.reshape(ntraj, -1)
    action_feats = actions.reshape(ntraj, -1)
    cross_corr = jnp.einsum("ni,nj->nij", state_feats, action_feats, precision="highest")
    cross_corr = cross_corr.reshape(ntraj, -1)
    mu = state_feats.mean(axis=-1, keepdims=True)
    if state_feats.shape[1] < 2:
        std = jnp.zeros_like(mu)
    else:
        std = state_feats.std(axis=-1, ddof=1, keepdims=True)
    return jnp.concatenate([cross_corr, mu, std], axis=-1)


def summary_corrdiff(states, actions):
    return cross_correlation(states, actions, use_state_diff=True)


def summary_corr(states, actions):
    return cross_correlation(states, actions, use_state_diff=False)


def summary_signatory(states, actions):
    """Truncated path signatures of time-augmented (state, action) paths
    (summarizers.py:144-168), computed natively in JAX (replaces the
    ``signatory`` C++/CUDA dependency). Depth via ``signature_depth``."""
    assert states.ndim == 3, "states should be batch x time x state_dim"
    bsz, path_len, _ = states.shape
    states, actions = pad_states_actions(states, actions, path_len)
    time_ids = jnp.broadcast_to(
        jnp.arange(1, path_len + 1, dtype=states.dtype)[None, :, None],
        (bsz, path_len, 1))
    paths = jnp.concatenate([time_ids, states, actions], axis=-1)
    depth = signature_depth(paths.shape[-1])
    return path_signature(paths, depth=depth)


_REGISTRY = {
    "summary_start": summary_start,
    "summary_waypts": summary_waypts,
    "summary_corr": summary_corr,
    "summary_corrdiff": summary_corrdiff,
    "summary_signatory": summary_signatory,
}


def get_summarizer(name: str):
    """Resolves a summarizer by config name (replaces the reference's
    ``eval()`` of config strings, bayes_sim.py:56)."""
    if name not in _REGISTRY:
        raise KeyError(f"Unknown summarizer '{name}'. "
                       f"Available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]
