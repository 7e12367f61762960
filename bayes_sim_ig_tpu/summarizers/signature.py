"""Truncated path signatures in pure JAX (replaces the ``signatory``
C++/CUDA dependency used at reference summarizers.py:144-168).

The signature of a path x: [0,T] -> R^d truncated at depth m is the
concatenation of iterated integrals of levels 1..m (sizes d, d^2, ..., d^m).
For the piecewise-linear paths used here it satisfies Chen's relation
S(x) = exp(dx_1) (x) exp(dx_2) (x) ... in the truncated tensor algebra,
where dx_t are the path increments.

Instead of a sequential scan (the GPU library's approach), we use closed
forms over increment prefix-sums so every level is a batched
matmul/einsum — the idiomatic TPU (MXU) formulation:

  L1 = sum_t dx_t
  L2 = sum_t c_{t-1} (x) dx_t + 1/2 sum_t dx_t (x) dx_t
  L3 = sum_t L2prefix_{t-1} (x) dx_t + 1/2 sum_t c_{t-1} (x) dx_t (x) dx_t
       + 1/6 sum_t dx_t (x) dx_t (x) dx_t

with c_t the exclusive prefix sum of increments and L2prefix the running
level-2 (a cumulative sum of outer products). Depths are capped at 3, as in
the reference (``signature_depth``, summarizers.py:133-141). Differentiable
by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_SIGNATURE_OUTPUT_DIM = 110 ** 2  # reference summarizers.py:137

# Large batches are processed in fixed-size chunks (lax.map keeps ONE
# compiled body): the depth-3 path materializes a (chunk, T, d, d)
# prefix-sum intermediate, ~1 GB-class at the reference's 10k x 50-step,
# d~22 scale if unchunked (the reference chunks too, summarizers.py:157-168).
SIGNATURE_CHUNK = 1024


def signature_depth(ndim: int) -> int:
    """Largest depth in {3, 2} with ndim^depth <= 110^2, else 1
    (summarizers.py:133-141)."""
    for depth in (3, 2):
        if ndim ** depth <= MAX_SIGNATURE_OUTPUT_DIM:
            return depth
    return 1


def path_signature(paths: jnp.ndarray, depth: int,
                   chunk_size: int = SIGNATURE_CHUNK) -> jnp.ndarray:
    """Computes truncated signatures for a batch of paths.

    Parameters
    ----------
    paths : (batch, path_len, d) array
    depth : truncation depth in {1, 2, 3}
    chunk_size : batches larger than this are processed in equal chunks
        under ``lax.map`` to bound the (chunk, T, d, d) peak memory.

    Returns
    -------
    (batch, d + d^2 + ... + d^depth) array — levels concatenated in
    signatory's layout (level 1 first, row-major within each level).
    """
    assert paths.ndim == 3, "paths should be batch x time x channels"
    assert depth in (1, 2, 3), f"depth must be 1, 2 or 3, got {depth}"
    bsz = paths.shape[0]
    if bsz > chunk_size:
        n_chunks = -(-bsz // chunk_size)
        pad = n_chunks * chunk_size - bsz
        padded = paths if pad == 0 else jnp.concatenate(
            [paths, jnp.zeros((pad,) + paths.shape[1:], paths.dtype)])
        chunks = padded.reshape((n_chunks, chunk_size) + paths.shape[1:])
        sigs = jax.lax.map(
            lambda p: _signature_impl(p, depth), chunks)
        return sigs.reshape(n_chunks * chunk_size, -1)[:bsz]
    return _signature_impl(paths, depth)


def _signature_impl(paths: jnp.ndarray, depth: int) -> jnp.ndarray:
    dx = paths[:, 1:] - paths[:, :-1]  # (B, T, d) increments
    bsz, _, d = dx.shape

    lvl1 = dx.sum(axis=1)  # (B, d)
    out = [lvl1]
    if depth >= 2:
        # Exclusive prefix sums c_{t-1} = sum_{i<t} dx_i.
        c_excl = jnp.cumsum(dx, axis=1) - dx  # (B, T, d)
        lvl2 = (jnp.einsum("bti,btj->bij", c_excl, dx, precision="highest")
                + 0.5 * jnp.einsum("bti,btj->bij", dx, dx, precision="highest"))
        out.append(lvl2.reshape(bsz, -1))
    if depth >= 3:
        # Running level-2 after each step, exclusive: L2prefix_{t-1}.
        step_l2 = (jnp.einsum("bti,btj->btij", c_excl, dx, precision="highest")
                   + 0.5 * jnp.einsum("bti,btj->btij", dx, dx, precision="highest"))
        l2_excl = jnp.cumsum(step_l2, axis=1) - step_l2  # (B, T, d, d)
        lvl3 = (jnp.einsum("btij,btk->bijk", l2_excl, dx, precision="highest")
                + 0.5 * jnp.einsum("bti,btj,btk->bijk", c_excl, dx, dx, precision="highest")
                + (1.0 / 6.0) * jnp.einsum("bti,btj,btk->bijk", dx, dx, dx, precision="highest"))
        out.append(lvl3.reshape(bsz, -1))
    return jnp.concatenate(out, axis=-1)
