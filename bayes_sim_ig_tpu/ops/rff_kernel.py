"""Pallas kernel: random-Fourier-feature projection.

Computes ``a * [cos(x @ coeff), sin(x @ coeff)]`` in one pass: the matmul
runs on the MXU and the transcendentals + concat are fused in VMEM, so the
(B, m) inner product never round-trips through HBM (the jnp version
materializes it between the dot and the cos/sin).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 256


def rff_features_reference(x, coeff, a):
    """Pure-jnp fallback (identical math to models/rff.py)."""
    inner = jnp.dot(x, coeff)
    return a * jnp.concatenate([jnp.cos(inner), jnp.sin(inner)], axis=-1)


def _kernel(x_ref, coeff_ref, out_ref, *, a, m):
    inner = jnp.dot(x_ref[:], coeff_ref[:],
                    preferred_element_type=jnp.float32)
    out_ref[:, :m] = a * jnp.cos(inner)
    out_ref[:, m:] = a * jnp.sin(inner)


def _round_up(n, k):
    return (n + k - 1) // k * k


@functools.partial(jax.jit, static_argnames=("a", "interpret"))
def rff_features_pallas(x, coeff, a, interpret=False):
    """x (B, d) @ coeff (d, m) -> (B, 2m) fused cos/sin features."""
    b, d = x.shape
    m = coeff.shape[1]
    bp = _round_up(max(b, 8), 8)
    dp = _round_up(d, 128)
    mp = _round_up(m, 128)
    x_pad = jnp.zeros((bp, dp), jnp.float32).at[:b, :d].set(x)
    coeff_pad = jnp.zeros((dp, mp), jnp.float32).at[:d, :m].set(coeff)
    grid_b = pl.cdiv(bp, TILE_B)
    tile_b = min(TILE_B, bp)
    out = pl.pallas_call(
        functools.partial(_kernel, a=a, m=mp),
        grid=(grid_b,),
        in_specs=[
            pl.BlockSpec((tile_b, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, mp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, 2 * mp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 2 * mp), jnp.float32),
        interpret=interpret,
    )(x_pad, coeff_pad)
    # Unpad: cos block then sin block.
    return jnp.concatenate([out[:b, :m], out[:b, mp:mp + m]], axis=-1)


def rff_features(x, coeff, a):
    """Dispatches to the Pallas kernel on TPU, jnp fallback elsewhere."""
    from . import use_pallas
    if use_pallas():
        return rff_features_pallas(x, coeff, float(a))
    return rff_features_reference(x, coeff, a)
