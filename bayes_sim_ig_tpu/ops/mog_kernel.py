"""Pallas kernel: diagonal mixture-density log-likelihood.

The MDN training loss evaluates, for every batch row, K Gaussian
log-probs followed by a logsumexp over components
(models/mdnn.py ``mdn_loss``). For the (default) diagonal-covariance
case this kernel fuses the whole reduction — z-scores, per-component
log-dets, weight clamping, logsumexp — into one VMEM pass over a batch
tile, avoiding the K intermediate (B,) arrays the lax version
materializes.

Layout: mu and L_d come in as (B, D, K); y as (B, D); weights (B, K).
Output: (B,) mixture log-likelihoods (clamped to +-1e5 per component,
matching the reference semantics mdnn.py:158-161).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LL_LIMIT = 1.0e5
MIN_WEIGHT = 1.0e-5
TILE_B = 256


def diag_mixture_logprob_reference(weights, mu, l_d, y):
    """Pure-jnp fallback: (B,) mixture log-likelihoods."""
    b, d, k = mu.shape
    log2pi = jnp.log(2.0 * jnp.pi)
    z = (y[:, :, None] - mu) / l_d
    lp = (-0.5 * jnp.sum(z * z, axis=1)
          - jnp.sum(jnp.log(l_d), axis=1)
          - 0.5 * d * log2pi)
    lp = jnp.clip(lp, -LL_LIMIT, LL_LIMIT)
    w = jnp.clip(weights, MIN_WEIGHT, 1.0)
    return jax.scipy.special.logsumexp(lp + jnp.log(w), axis=1)


def _kernel(w_ref, mu_ref, ld_ref, y_ref, out_ref, *, d, k):
    """All-2D formulation (Mosaic rejects 3-D reshapes): mu/ld arrive
    flattened (B, D*K) in d-major layout; loop over the small D statically
    and accumulate the quadratic form and log-det per component."""
    log2pi = jnp.log(2.0 * jnp.pi).astype(jnp.float32)
    b = y_ref.shape[0]
    acc = jnp.zeros((b, k), jnp.float32)
    logdet = jnp.zeros((b, k), jnp.float32)
    for di in range(d):
        mu_d = mu_ref[:, di * k:(di + 1) * k]
        ld_d = ld_ref[:, di * k:(di + 1) * k]
        y_d = y_ref[:, di:di + 1]
        z = (y_d - mu_d) / ld_d
        acc = acc + z * z
        logdet = logdet + jnp.log(ld_d)
    lp = -0.5 * acc - logdet - 0.5 * d * log2pi
    lp = jnp.clip(lp, -LL_LIMIT, LL_LIMIT)
    w = jnp.clip(w_ref[:], MIN_WEIGHT, 1.0)
    t = lp + jnp.log(w)
    t_max = jnp.max(t, axis=1, keepdims=True)
    out = t_max[:, 0] + jnp.log(jnp.sum(jnp.exp(t - t_max), axis=1))
    out_ref[:] = out[:, None]


def _round_up(n, m):
    return (n + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def diag_mixture_logprob_pallas(weights, mu, l_d, y, interpret=False):
    b, d, k = mu.shape
    bp = _round_up(max(b, 8), 8)

    def pad(x, fill=0.0):
        out = jnp.full((bp,) + x.shape[1:], fill, jnp.float32)
        return out.at[:b].set(x)

    # Pad L_d with ones (log 1 = 0) and weights with MIN_WEIGHT so padded
    # rows stay finite.
    w_p = pad(weights, MIN_WEIGHT)
    mu_p = pad(mu).reshape(bp, d * k)
    ld_p = pad(l_d, 1.0).reshape(bp, d * k)
    y_p = pad(y)
    tile_b = min(TILE_B, bp)
    out = pl.pallas_call(
        functools.partial(_kernel, d=d, k=k),
        grid=(pl.cdiv(bp, tile_b),),
        in_specs=[
            pl.BlockSpec((tile_b, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, d * k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, d * k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        interpret=interpret,
    )(w_p, mu_p, ld_p, y_p)
    return out[:b, 0]


def diag_mixture_logprob(weights, mu, l_d, y):
    from . import use_pallas
    if use_pallas():
        return diag_mixture_logprob_pallas(weights, mu, l_d, y)
    return diag_mixture_logprob_reference(weights, mu, l_d, y)
