"""Observation/action domain-randomization noise with schedules.

Rebuild of the nonphysical-parameter randomization in the reference
(``/root/reference/bayes_sim_ig/sim/apply_randomizations.py:62-132``):
gaussian or uniform noise, additive or scaling, with 'linear'/'constant'
schedules over global frame count, plus a correlated component that is drawn
once per randomization refresh and held fixed (apply_randomizations.py:96-104).

Here the noise is a pure function: the correlated draw lives in the env
state pytree (redrawn at full randomization events inside jit), and the
schedule scaling is a traced scalar computed from the frame counter.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class NoiseConfig(NamedTuple):
    """Static config for one noise channel ('observations' or 'actions')."""
    distribution: str          # 'gaussian' | 'uniform'
    operation: str             # 'additive' | 'scaling'
    lo_or_mu: float            # range[0]
    hi_or_var: float           # range[1]
    lo_or_mu_corr: float       # range_correlated[0] (default 0)
    hi_or_var_corr: float      # range_correlated[1] (default 0)
    schedule: Optional[str]    # None | 'linear' | 'constant'
    schedule_steps: int
    has_correlated: bool       # range_correlated was configured


def make_noise_config(cfg: dict) -> NoiseConfig:
    """Parses one 'observations'/'actions' subtree of randomization_params."""
    rc = cfg.get("range_correlated", [0.0, 0.0])
    return NoiseConfig(
        distribution=cfg["distribution"],
        operation=cfg["operation"],
        lo_or_mu=float(cfg["range"][0]),
        hi_or_var=float(cfg["range"][1]),
        lo_or_mu_corr=float(rc[0]),
        hi_or_var_corr=float(rc[1]),
        schedule=cfg.get("schedule"),
        schedule_steps=int(cfg.get("schedule_steps", 0)),
        has_correlated="range_correlated" in cfg)


def schedule_scaling(cfg: NoiseConfig, frame_count) -> jnp.ndarray:
    """Schedule multiplier per apply_randomizations.py:70-76."""
    frame = jnp.asarray(frame_count, jnp.float32)
    if cfg.schedule == "linear":
        if cfg.schedule_steps <= 0:
            # 'linear' with no/zero schedule_steps would otherwise pin
            # the multiplier at 0 FOREVER — silently disabling the
            # configured noise (the reference hard-requires the key and
            # KeyErrors instead). Treat it as fully ramped.
            return jnp.asarray(1.0)
        return jnp.minimum(frame, cfg.schedule_steps) / cfg.schedule_steps
    if cfg.schedule == "constant":
        return jnp.where(frame < cfg.schedule_steps, 0.0, 1.0)
    return jnp.asarray(1.0)


def apply_noise(cfg: NoiseConfig, key: jax.Array, tensor: jnp.ndarray,
                corr: jnp.ndarray, frame_count) -> jnp.ndarray:
    """Applies scheduled correlated + white noise to ``tensor``.

    ``corr`` is a standard-normal draw with ``tensor``'s shape held fixed
    between randomization refreshes (the reference caches it in
    ``dr_randomizations['corr']``).
    """
    s = schedule_scaling(cfg, frame_count)
    # With 'scaling', the correlated term's identity interpolation is only
    # applied when range_correlated was actually configured — the reference
    # always interpolates it toward 1 (apply_randomizations.py:92-94),
    # which would make the combined multiplier 2 at schedule start for an
    # unset correlated range. No reference config exercises scaling
    # nonphysical noise, so this divergence fixes a latent bug only.
    if cfg.distribution == "gaussian":
        mu, var = cfg.lo_or_mu, cfg.hi_or_var
        mu_c, var_c = cfg.lo_or_mu_corr, cfg.hi_or_var_corr
        if cfg.operation == "additive":
            mu, var, mu_c, var_c = mu * s, var * s, mu_c * s, var_c * s
        elif cfg.operation == "scaling":
            var = var * s
            mu = mu * s + 1.0 * (1.0 - s)
            var_c = var_c * s
            if cfg.has_correlated:
                mu_c = mu_c * s + 1.0 * (1.0 - s)
        corr_term = corr * var_c + mu_c
        noise = corr_term + jax.random.normal(
            key, tensor.shape, tensor.dtype) * var + mu
    elif cfg.distribution == "uniform":
        lo, hi = cfg.lo_or_mu, cfg.hi_or_var
        lo_c, hi_c = cfg.lo_or_mu_corr, cfg.hi_or_var_corr
        if cfg.operation == "additive":
            lo, hi, lo_c, hi_c = lo * s, hi * s, lo_c * s, hi_c * s
        elif cfg.operation == "scaling":
            lo = lo * s + 1.0 * (1.0 - s)
            hi = hi * s + 1.0 * (1.0 - s)
            if cfg.has_correlated:
                lo_c = lo_c * s + 1.0 * (1.0 - s)
                hi_c = hi_c * s + 1.0 * (1.0 - s)
        # Note: the reference feeds a *normal* draw into the correlated
        # uniform range (apply_randomizations.py:126-129); reproduced.
        corr_term = corr * (hi_c - lo_c) + lo_c
        noise = corr_term + jax.random.uniform(
            key, tensor.shape, tensor.dtype) * (hi - lo) + lo
    else:
        raise ValueError(f"Unknown noise distribution {cfg.distribution}")
    if cfg.operation == "additive":
        return tensor + noise
    return tensor * noise
