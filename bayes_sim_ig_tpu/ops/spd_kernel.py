"""Batched small-SPD linear solve (general dense op).

Round 3: the physics engine's forward-dynamics path no longer uses this
dense solver — it builds mass-matrix entries only at dof-tree ancestor
pairs and solves with the branch-sparse LTDL in ops/tree_solve.py (~14x
fewer factorization flops for ShadowHand). This op remains the public
batched dense-SPD solve (and the Pallas-kernel reference) for systems
without tree structure.

Every articulated forward-dynamics step solves (M + diag) qdd = rhs with
one small SPD matrix per env (nv = 14..30, N = 512..16k envs). XLA's
``cholesky`` + ``triangular_solve`` lowering is catastrophically slow for
these shapes on TPU — measured in a dependent chain (the rollout regime):
4.4 ms at (1024, 30, 30) and 56 ms at (16384, 30, 30) per solve.

The fix is a LAYOUT inversion: systems are held as (n, n, N) with the env
batch on the minor (vector-lane) axis, so every step of an unrolled
column-Cholesky is a dense (j, N)/(n, N) vector op with zero padding waste,
and the whole factorization+substitution is ~3n fused XLA vector ops.
Measured: 0.59 ms at (1024, 30, 30) and ~2 ms at (16384, 30, 30) — and the
cost is op-count-bound, so it grows only ~2x while N grows 16x.

A Pallas kernel (`BSIM_SPD_PALLAS=1`) implements the same elimination as
ONE fused kernel: its pure compute throughput is ~26 us per (1024, 30, 30)
batch, but on this environment's tunneled TPU runtime every pallas custom
call carries ~420 us of dependent-chain dispatch latency (measured on a
trivial copy kernel too), which makes it a wash in rollouts here. On a
directly-attached TPU the kernel path should win; it is kept correct,
tested, and opt-in.

Everything is differentiable: the jnp path natively, the pallas path via
custom_vjp (x = A^-1 b: db = A^-1 g, dA = -db x^T). On CPU (tests) the
standard-layout path falls back to XLA cholesky (fast there via LAPACK).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _use_tpu_path() -> bool:
    return jax.default_backend() == "tpu"


def _use_pallas_solver() -> bool:
    return os.environ.get("BSIM_SPD_PALLAS", "0") == "1"


def _solve_xla(A, b):
    """Standard-layout XLA cholesky path: A (..., n, n), b (..., n)."""
    chol = jnp.linalg.cholesky(A)
    return jax.scipy.linalg.cho_solve((chol, True), b)


def _chol_lanes_factor(At):
    """Unrolled column-Cholesky in lanes layout: At (n, n, N) SPD ->
    Lt (n, n, N) with Lt[k] holding column k of L as an (n, N) row-block;
    each column step is one einsum over the already-built columns plus
    one fused sqrt/mask/scale — all dense over the N lanes. The factor is
    reusable across right-hand sides (``_chol_lanes_substitute``)."""
    n = At.shape[0]
    Lt = jnp.zeros_like(At)
    rows = jnp.arange(n)[:, None]
    for j in range(n):
        raw = At[:, j]
        if j:
            raw = raw - jnp.einsum("kn,kin->in", Lt[:j, j], Lt[:j])
        # Non-positive pivot => indefinite/NaN-adjacent LHS: propagate NaN
        # (instead of clamping to a finite wrong solve) so the env-step
        # non-finite quarantine catches divergence (ADVICE round 2).
        d = jnp.where(raw[j] > 0.0, jnp.sqrt(jnp.maximum(raw[j], 1e-30)),
                      jnp.nan)
        Lt = Lt.at[j].set(jnp.where(rows >= j, raw / d, 0.0))
    return Lt


def _chol_lanes_substitute(Lt, bt):
    """Forward+back substitution against a ``_chol_lanes_factor`` result:
    (n, n, N) x (n, N) -> (n, N)."""
    n = Lt.shape[0]
    y = jnp.zeros_like(bt)
    for i in range(n):
        acc = bt[i]
        if i:
            acc = acc - jnp.sum(Lt[:i, i] * y[:i], 0)
        y = y.at[i].set(acc / Lt[i, i])
    x = jnp.zeros_like(y)
    for i in range(n - 1, -1, -1):
        acc = y[i]
        if i < n - 1:
            acc = acc - jnp.sum(Lt[i, i + 1:] * x[i + 1:], 0)
        x = x.at[i].set(acc / Lt[i, i])
    return x


def _chol_lanes_core(At, bt):
    """Factor + substitute in one call (see the two halves above)."""
    return _chol_lanes_substitute(_chol_lanes_factor(At), bt)


# --------------------------------------------------------------------- #
# Pallas kernel (opt-in): one fused Gauss elimination per 128-env block.
# --------------------------------------------------------------------- #
def _spd_kernel(a_ref, b_ref, x_ref, A, r):
    """One block of B systems: a_ref (n, n, B), b_ref (n, B) -> x (n, B).

    In-kernel Gauss elimination (no pivoting — safe for SPD), unrolled over
    the static n. Rows <= k carry a zeroed multiplier column, so the
    full-matrix rank-1 update leaves them untouched."""
    n = a_ref.shape[0]
    A[:] = a_ref[:]
    r[:] = b_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for k in range(n):
        inv_d = 1.0 / A[k, k, :]
        lcol = jnp.where(rows > k, A[:, k, :] * inv_d[None, :], 0.0)
        A[:] = A[:] - lcol[:, None, :] * A[k, :, :][None, :, :]
        r[:] = r[:] - lcol * r[k, :][None, :]
    for i in range(n - 1, -1, -1):
        acc = r[i, :]
        if i < n - 1:
            acc = acc - jnp.sum(A[i, i + 1:, :] * x_ref[i + 1:, :], axis=0)
        x_ref[i, :] = acc / A[i, i, :]


def _pallas_lanes(At, bt):
    """At (n, n, N), bt (n, N) -> (n, N); N padded to 128-lane blocks with
    identity systems, n padded to fp32 sublanes."""
    n, _, N = At.shape
    n_pad = max(8, -(-n // 8) * 8)
    N_pad = -(-N // _LANES) * _LANES
    A_p = jnp.zeros((n_pad, n_pad, N_pad), At.dtype)
    A_p = A_p.at[jnp.arange(n_pad), jnp.arange(n_pad), :].set(1.0)
    A_p = A_p.at[:n, :n, :N].set(At)
    b_p = jnp.zeros((n_pad, N_pad), At.dtype).at[:n, :N].set(bt)
    x = pl.pallas_call(
        _spd_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, N_pad), At.dtype),
        grid=(N_pad // _LANES,),
        in_specs=[
            pl.BlockSpec((n_pad, n_pad, _LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad, _LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_pad, n_pad, _LANES), At.dtype),
            pltpu.VMEM((n_pad, _LANES), At.dtype),
        ],
    )(A_p, b_p)
    return x[:n, :N]


@jax.custom_vjp
def _pallas_lanes_vjp(At, bt):
    return _pallas_lanes(At, bt)


def _pallas_fwd(At, bt):
    x = _pallas_lanes(At, bt)
    return x, (At, x)


def _pallas_bwd(res, g):
    At, x = res
    y = _pallas_lanes(At, g)  # A symmetric: A^-T = A^-1
    # dA[i, j, n] = -y[i, n] x[j, n]
    dA = -y[:, None, :] * x[None, :, :]
    return dA, y


_pallas_lanes_vjp.defvjp(_pallas_fwd, _pallas_bwd)


# --------------------------------------------------------------------- #
# Public API
# --------------------------------------------------------------------- #
def spd_solve_lanes(At, bt):
    """x = A^-1 b in lanes layout: At (n, n, N), bt (n, N) -> (n, N).

    The physics hot path builds its systems directly in this layout (the
    env axis never leaves the vector lanes)."""
    if not _use_tpu_path():
        A = jnp.transpose(At, (2, 0, 1))
        return _solve_xla(A, bt.T).T
    if _use_pallas_solver():
        return _pallas_lanes_vjp(At, bt)
    return _chol_lanes_core(At, bt)


def spd_factor_lanes(At):
    """Factorizes At (n, n, N) once for reuse against multiple right-hand
    sides via ``spd_substitute_lanes`` (e.g. across physics substeps).
    The payload is backend-specific: the Cholesky columns on the TPU jnp
    path, the raw systems where refactorization is the only option
    (pallas opt-in, CPU LAPACK)."""
    if not _use_tpu_path() or _use_pallas_solver():
        return ("raw", At)
    return ("chol_lanes", _chol_lanes_factor(At))


def spd_substitute_lanes(factor, bt):
    """Solves against an ``spd_factor_lanes`` result: (n, N) rhs -> x."""
    kind, payload = factor
    if kind == "raw":
        return spd_solve_lanes(payload, bt)
    return _chol_lanes_substitute(payload, bt)


def spd_solve(A, b):
    """x = A^-1 b for batched small SPD systems: A (..., n, n), b (..., n).

    Standard-layout convenience wrapper (transposes into the lanes layout
    on TPU; XLA cholesky elsewhere)."""
    if not _use_tpu_path():
        return _solve_xla(A, b)
    batch = b.shape[:-1]
    n = b.shape[-1]
    At = jnp.transpose(A.reshape((-1, n, n)), (1, 2, 0))
    bt = b.reshape((-1, n)).T
    return spd_solve_lanes(At, bt).T.reshape(batch + (n,))
