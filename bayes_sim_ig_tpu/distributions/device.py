"""Device-side (JAX pytree) forms of the sampling distributions.

The reference samples one flat param vector per env on the host at each env
reset (params_generator.py:115-118 ``sample()``, called from
apply_randomizations.py:153-158 and openai_env_wrappers.py:78) — a Python
loop crossing the host<->device boundary thousands of times per rollout.

TPU-first inversion: the current sampling distribution (uniform prior or MoG
posterior) is converted ONCE per ADR iteration into arrays, and the
jit-compiled rollout samples whole batches of param vectors on device at
reset steps. Samples are clipped to [lows, highs], matching
``ParamsGenerator.sample`` semantics.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import pdf


class DeviceUniform(NamedTuple):
    """Box uniform over params; all fields shaped (P,)."""
    lows: jax.Array
    highs: jax.Array


class DeviceMoG(NamedTuple):
    """Mixture of Gaussians over params, plus clip bounds.

    log_weights: (K,); means: (K, P); chols: (K, P, P) lower-triangular
    covariance factors (L L' = S); lows/highs: (P,) clip bounds.
    """
    log_weights: jax.Array
    means: jax.Array
    chols: jax.Array
    lows: jax.Array
    highs: jax.Array


DeviceDistr = Union[DeviceUniform, DeviceMoG]


def to_device_distr(distr, lows=None, highs=None,
                    dtype=jnp.float32) -> DeviceDistr:
    """Converts a host ``pdf.Uniform``/``pdf.Gaussian``/``pdf.MoG`` into its
    device array form. ``lows``/``highs`` are the param bounds used for
    clipping (default: the Uniform's own bounds; required for MoG/Gaussian).
    """
    if isinstance(distr, pdf.Uniform):
        lo = distr.lb_array if lows is None else lows
        hi = distr.ub_array if highs is None else highs
        return DeviceUniform(jnp.asarray(lo, dtype), jnp.asarray(hi, dtype))
    if isinstance(distr, pdf.Gaussian):
        distr = pdf.MoG(a=np.ones(1), xs=[distr])
    if isinstance(distr, pdf.MoG):
        assert lows is not None and highs is not None, \
            "MoG device sampling needs clip bounds"
        means = np.stack([g.m for g in distr.xs])
        # g.C is upper triangular with S = C'C, so C' is the lower factor.
        chols = np.stack([g.C.T for g in distr.xs])
        return DeviceMoG(
            log_weights=jnp.asarray(np.log(distr.a), dtype),
            means=jnp.asarray(means, dtype),
            chols=jnp.asarray(chols, dtype),
            lows=jnp.asarray(lows, dtype),
            highs=jnp.asarray(highs, dtype))
    raise TypeError(f"Cannot convert {type(distr)} to a device distribution")


def sample_distr(distr: DeviceDistr, key: jax.Array, n: int) -> jax.Array:
    """Draws ``n`` param vectors from a device distribution, clipped to the
    param box. Traceable under jit/vmap/scan."""
    if isinstance(distr, DeviceUniform):
        u = jax.random.uniform(key, (n, distr.lows.shape[0]),
                               dtype=distr.lows.dtype)
        return distr.lows + u * (distr.highs - distr.lows)
    k_comp, k_norm = jax.random.split(key)
    comp = jax.random.categorical(k_comp, distr.log_weights, shape=(n,))
    z = jax.random.normal(k_norm, (n, distr.means.shape[1]),
                          dtype=distr.means.dtype)
    smpl = distr.means[comp] + jnp.einsum("nij,nj->ni", distr.chols[comp], z)
    return jnp.clip(smpl, distr.lows, distr.highs)
