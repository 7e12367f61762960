"""Tree-sparse LTDL factorization/solve for articulated mass matrices,
env-last (lanes) layout.

The CRBA mass matrix of a kinematic tree is nonzero only at ancestor
pairs of the expanded dof tree (M[k, i] != 0 iff i is an ancestor-or-self
of k), and — with dofs ordered so parents precede children — its
M = L^T D L factorization fills in ONLY at those same pairs
(Featherstone, Rigid Body Dynamics Algorithms ch. 6: branch-induced
sparsity; the dof tree is the elimination tree). So instead of the dense
lanes-layout column Cholesky in ops/spd_kernel.py (O(nv^3/3) multiplies
per env — ~4.5k for ShadowHand's nv=30 — with every column step reading
all previously built columns, ~0.9 GB of HBM reads per 16k-env solve),
this solver touches only the E ancestor pairs:

  * ShadowHand (4 nearly independent finger chains + LF + thumb + wrist
    + a free cube): E = 128 of 465 lower-triangle entries, ~330 multiply
    -adds per env in the factorization — ~14x fewer flops and ~40x less
    HBM traffic than the dense elimination;
  * every value is an (N,)-lane vector held in a Python dict keyed by the
    static (k, i) pair, so the unrolled update graph is a DAG of fused
    VPU ops with zero padding waste and no scatters.

The factorization is the classic sparse LTDL (RBDA Table 6.3/6.5,
expanded-loop form), differentiable end to end (plain jnp ops). Non
-positive pivots propagate NaN — same policy as spd_kernel.py — so
indefinite systems surface through the env non-finite quarantine instead
of silently solving a clamped wrong system.

Reference context: the reference's engine outsources this solve to
PhysX's articulation solver (closed source); SURVEY.md §2.2.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp


def ancestor_pairs(chains: Sequence[Sequence[int]]) -> List[Tuple[int, int]]:
    """All (k, i) with i an ancestor-or-self of k, k major order.
    ``chains[k]`` lists k's proper ancestors (model.dof_anc_chains)."""
    pairs = []
    for k, ch in enumerate(chains):
        pairs.append((k, k))
        pairs.extend((k, i) for i in ch)
    return pairs


def ltdl_factor(chains: Sequence[Sequence[int]],
                M: Dict[Tuple[int, int], jnp.ndarray]):
    """Factorizes M = L^T D L for an SPD tree-sparse system in lanes
    layout. Returns (L, D): L a dict {(k, i): (N,)} over the off-diagonal
    ancestor pairs, D a length-nv list of (N,) pivots (NaN where the
    pivot is non-positive — the NaN-propagating policy of the module
    docstring). The factor is reusable across multiple right-hand sides
    (``ltdl_substitute``), e.g. across a step's physics substeps."""
    nv = len(chains)
    H = dict(M)
    parent = [ch[0] if ch else -1 for ch in chains]
    for k in range(nv - 1, -1, -1):
        i = parent[k]
        while i >= 0:
            a = H[(k, i)] / H[(k, k)]
            j = i
            while j >= 0:
                H[(i, j)] = H[(i, j)] - a * H[(k, j)]
                j = parent[j]
            H[(k, i)] = a
            i = parent[i]
    D = [jnp.where(H[(k, k)] > 0.0, H[(k, k)], jnp.nan)
         for k in range(nv)]
    return H, D


def ltdl_factor_ll(chains: Sequence[Sequence[int]],
                   M: Dict[Tuple[int, int], jnp.ndarray]):
    """Left-looking column-slab form of ``ltdl_factor`` — same factor,
    same (H, D) result contract, restructured for op-granularity-bound
    models (long chains, e.g. Humanoid's depth-15 dof tree).

    The right-looking loop above updates every affected pair the moment a
    dof is eliminated: each update is its own (N,)-lane fusion, and on
    deep chains that unrolls into hundreds of sub-microsecond ops whose
    fixed per-op cost dominates (the round-4 Humanoid trace: 290 us of a
    713 us step in tree_solve lines 64/67 across ~300 fusions). Here each
    dof's factor column is instead assembled ONCE, when the dof is
    eliminated, from the already-final columns of its descendants:

        col(k) = M[k, anc-or-self(k)]
                 - sum_{c in desc(k)} a_c[t] * v_c[t:]        (t = k's
                   position in c's chain; v_c = c's final column, a_c =
                   v_c[1:] / pivot_c)

    — one stacked multiply-reduce over the descendant axis per dof
    (~4 fused ops) instead of O(depth^2) scalar-row ops. Chain suffix
    structure makes the gathered slices static: anc(k) == chains[c][t+1:]
    whenever k == chains[c][t]. Summation order differs from the
    right-looking form, so results agree to f32 roundoff (exact in f64;
    tested in tests/test_ops.py)."""
    nv = len(chains)
    # contributors[k] = [(c, t)] with k == chains[c][t]
    contributors: List[List[Tuple[int, int]]] = [[] for _ in range(nv)]
    for c in range(nv):
        for t, k in enumerate(chains[c]):
            contributors[k].append((c, t))
    v: List[jnp.ndarray] = [None] * nv   # final columns, (1+d_k, N)
    a: List[jnp.ndarray] = [None] * nv   # v[1:]/pivot, (d_k, N)
    for k in range(nv - 1, -1, -1):
        col = jnp.stack([M[(k, j)] for j in (k, *chains[k])])
        if contributors[k]:
            w = jnp.stack([a[c][t] for (c, t) in contributors[k]])
            src = jnp.stack([v[c][1 + t:] for (c, t) in contributors[k]])
            col = col - (w[:, None] * src).sum(0)
        v[k] = col
        if chains[k]:
            a[k] = col[1:] / col[0]
    H: Dict[Tuple[int, int], jnp.ndarray] = {}
    for k in range(nv):
        H[(k, k)] = v[k][0]
        for t, i in enumerate(chains[k]):
            H[(k, i)] = a[k][t]
    D = [jnp.where(v[k][0] > 0.0, v[k][0], jnp.nan) for k in range(nv)]
    return H, D


def ltdl_substitute(chains: Sequence[Sequence[int]], factor,
                    b_rows: Sequence[jnp.ndarray]):
    """Solves (L^T D L) x = b given an ``ltdl_factor`` result:
    z = L^-T b; z /= D; x = L^-1 z. Returns the list of nv (N,) rows."""
    H, D = factor
    nv = len(chains)
    x = list(b_rows)
    for k in range(nv - 1, -1, -1):
        for i in chains[k]:
            x[i] = x[i] - H[(k, i)] * x[k]
    x = [x[k] / D[k] for k in range(nv)]
    for k in range(nv):
        acc = x[k]
        for i in chains[k]:
            acc = acc - H[(k, i)] * x[i]
        x[k] = acc
    return x


def ltdl_upsolve(chains: Sequence[Sequence[int]], H,
                 x: Dict[int, jnp.ndarray], dofs: Sequence[int]):
    """Applies L^-T only (the UP-fill substitution pass of
    ``ltdl_substitute``) to rows supported on the ancestor-CLOSED static
    dof set ``dofs`` — x: {dof: (..., N)}. Because fill spreads only
    from a dof to its ancestors, restricting the pass to the closure is
    exact: every update's source and target lie inside ``dofs``. This is
    the half-solve behind the contact pass's compact Delassus factors
    (contact.py): Y = L^-T J^T keeps J's per-row support closure, unlike
    the full M^-1 J^T whose second (down) pass densifies every row over
    its whole subtree. Mutates and returns ``x``."""
    for k in sorted(dofs, reverse=True):
        for i in chains[k]:
            x[i] = x[i] - H[(k, i)] * x[k]
    return x


def ltdl_downsolve(chains: Sequence[Sequence[int]], H,
                   rows: Sequence[jnp.ndarray]):
    """Applies L^-1 only (the DOWN-fill pass of ``ltdl_substitute``) to
    a full nv-row vector: x[k] = rows[k] - sum_i H[(k,i)] x[i] in
    ascending dof order. With z = D^-1 L^-T J^T lam accumulated by the
    contact sweeps, ``L^-1 z`` is the final generalized-velocity
    correction — ONE cheap (N,)-row pass per apply call instead of a
    dense (R, nv, N) down-solve per prepared row."""
    x = list(rows)
    for k in range(len(chains)):
        acc = x[k]
        for i in chains[k]:
            acc = acc - H[(k, i)] * x[i]
        x[k] = acc
    return x


def ltdl_solve(chains: Sequence[Sequence[int]],
               M: Dict[Tuple[int, int], jnp.ndarray],
               b_rows: Sequence[jnp.ndarray]):
    """Solves M x = b for SPD tree-sparse systems in lanes layout.

    chains: per-dof proper-ancestor lists (static python structure).
    M: dict {(k, i): (N,) value} over exactly ``ancestor_pairs(chains)``
    (lower triangle incl. diagonal; the caller builds CRBA entries only
    at these pairs). b_rows: length-nv sequence of (N,) rows. Returns the
    list of nv (N,) solution rows. Consumes its inputs functionally (the
    dict is copied)."""
    return ltdl_substitute(chains, ltdl_factor(chains, M), b_rows)
