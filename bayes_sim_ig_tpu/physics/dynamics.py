"""Forward dynamics for articulated trees: FK, RNEA bias, CRBA mass matrix,
tree-sparse LTDL solve, semi-implicit integration.

Replaces the PhysX reduced-coordinate articulation solver the reference
drives through Isaac Gym (SURVEY.md §2.2). TPU-first design, validated by
measurement on the target chip:

  * ENV-LAST ("structure of arrays") layout: inside the engine every
    tensor carries the env batch on the MINOR axis — R_w is (nb, 3, 3, N),
    joint subspaces are (nv, 6, N). The vector lanes are fully used by
    envs; structure dims (3, 6, nv) live on leading axes. The env-first
    layout ((N, nb, 3, 3), batched matmuls) measures 15x slower at 16k
    envs — every op pads its tiny minor dims to the 128-lane tile and
    wastes ~40x HBM bandwidth;
  * small fixed-size contractions (3x3, 6x6) are UNROLLED into sums of
    elementwise products on (.., N) slices — they fuse into a few VPU
    kernels. einsums with a trailing batch axis are NOT used: XLA
    re-transposes them into batch-major dot_generals (measured 20x slower
    than the unrolled form);
  * tree-structure contractions (ancestor masks, one-hot scatter/gather,
    contact-point accumulation) are dot_generals with TRAILING FREE dims
    (``_fold``) — never reshape-merged into the minor axis (merging
    tile-padded middle dims with the lane axis is a physical relayout;
    profiling showed reshape+copy ops eating ~40% of the ShadowHand step
    until round 3 removed every hot-path reshape and ``.at[]`` row
    write), and never TPU scatters (serial lowering);
  * spatial inertias ride in a PACKED 10-parameter form (symmetric 3x3
    block, first moment, mass — see ``_i10_direct``): composite-inertia
    accumulation stays a linear fold and no (.., 6, 6, N) tensor exists
    in the hot path;
  * spatial quantities live in world Plücker coordinates about a floating
    reference point (the first root's position), where the tree structure
    enters only through those static 0/1 masks; the reference point keeps
    float32 moment arms bounded when locomoting bodies wander;
  * FK composes transforms by POINTER JUMPING (parallel prefix over the
    tree): ceil(log2(depth+1)) rounds of one-hot-gather + unrolled
    compose instead of `depth` sequential levels — Humanoid's
    phantom-link chains give depth 10, which collapses to 4 rounds;
  * the (M + ...) qdd = rhs solve builds CRBA entries ONLY at dof-tree
    ancestor pairs and runs the branch-sparse LTDL of ops/tree_solve.py
    (ShadowHand: 128 of 465 lower-triangle entries, ~14x fewer
    factorization flops than a dense elimination; XLA's own cholesky/
    triangular_solve custom calls cost 4.4-56 ms per rollout step at
    these shapes);
  * joint damping (and PD derivative gains) are handled implicitly by
    folding ``dt * d`` into the LHS, which keeps large randomized
    damping/stiffness draws stable at 1/60 s steps;
  * everything is a pure function of (q, v, tau, params), so domain
    randomization is just batched parameter arrays.

Public functions accept single-env ``(nq,)`` arrays or env-first batched
``(N, nq)`` ones (the task-state layout); the env-last form is internal,
with one cheap 2D transpose per boundary array. ``Kinematics`` fields are
env-last (trailing N), squeezed for single-env calls.
"""

from __future__ import annotations

import os

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .model import ArticulatedModel, DynParams
from .spatial import hat
from ..ops.spd_kernel import (spd_factor_lanes, spd_solve_lanes,
                              spd_substitute_lanes)
from ..ops.tree_solve import (ancestor_pairs, ltdl_factor, ltdl_factor_ll,
                              ltdl_substitute)

_HI = jax.lax.Precision.HIGHEST


# --------------------------------------------------------------------- #
# Env-last helpers: arrays are (.., structure dims .., N); fixed-size
# contractions unroll into elementwise products of (.., N) slices.
# --------------------------------------------------------------------- #
def _mm(A, B, n=3):
    """Unrolled matmul over two structure axes: A, B are (.., n, n, N)
    (structure axes at positions -3, -2). Returns (.., n, n, N)."""
    rows = []
    for i in range(n):
        row = []
        for j in range(n):
            row.append(sum(A[..., i, k, :] * B[..., k, j, :]
                           for k in range(n)))
        rows.append(jnp.stack(row, -2))
    return jnp.stack(rows, -3)


def _mmT(A, B, n=3):
    """A^T @ B, unrolled: (.., n, n, N) x (.., n, n, N)."""
    rows = []
    for i in range(n):
        row = []
        for j in range(n):
            row.append(sum(A[..., k, i, :] * B[..., k, j, :]
                           for k in range(n)))
        rows.append(jnp.stack(row, -2))
    return jnp.stack(rows, -3)


def _mv(A, x, n=3):
    """Unrolled matvec: (.., n, n, N) x (.., n, N) -> (.., n, N)."""
    return jnp.stack([sum(A[..., i, k, :] * x[..., k, :]
                          for k in range(n)) for i in range(n)], -2)


def _mvT(A, x, n=3):
    """A^T x, unrolled."""
    return jnp.stack([sum(A[..., k, i, :] * x[..., k, :]
                          for k in range(n)) for i in range(n)], -2)


def _cross(a, b):
    """Cross product over the second-to-last (3-sized) axis: (.., 3, N)."""
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack([a1 * b2 - a2 * b1,
                      a2 * b0 - a0 * b2,
                      a0 * b1 - a1 * b0], -2)


def _phys_bf16() -> bool:
    """Opt-out bf16 for bandwidth-bound inertia/bias intermediates
    (BSIM_PHYS_BF16: '1' = on TPU [default], 'force' = everywhere [tests],
    '0' = off). The remaining hot ops measure at ~peak HBM bandwidth
    (round-3 trace), so halving their bytes is the lever; every
    contraction still ACCUMULATES in f32 and the mass matrix, LTDL solve
    and integration stay f32 (a ~0.4% relative perturbation of inertia
    and bias terms — far below the DR parameter ranges the engine is
    randomized over — in exchange for ~2x on those ops)."""
    v = os.environ.get("BSIM_PHYS_BF16", "1")
    return v == "force" or (v == "1" and jax.default_backend() == "tpu")


def _fold(mat, x, out_dtype=None):
    """Static-mask contraction over the leading axis: mat (r, s)
    numpy/const, x (s, d1, .., N) -> (r, d1, .., N), as ONE dot_general
    with trailing free dims. No reshape: merging the tile-padded middle
    dims (3, 4, 6, ..) with the minor lane axis forces a PHYSICAL
    relayout on TPU — profiling round 3 showed reshape+copy ops eating
    ~40% of the ShadowHand step before this change.

    bf16 inputs accumulate in f32 on the MXU (default precision — HIGHEST
    would trigger multi-pass emulation) and return bf16 unless
    ``out_dtype`` overrides. f32 inputs use HIGH (3-pass bf16x3) on TPU:
    ~6e-5 relative vs HIGHEST's exact f32 — two orders below the default
    bf16 storage path's own perturbation — for half the MXU passes on
    what the round-3 trace shows as the single largest per-step op class
    (the dynamics folds). ``BSIM_FOLD_HIGHEST=1`` restores 6-pass."""
    if x.dtype == jnp.bfloat16:
        out = jax.lax.dot_general(
            jnp.asarray(mat, jnp.bfloat16), x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out if out_dtype == jnp.float32 \
            else out.astype(jnp.bfloat16)
    prec = _HI if os.environ.get("BSIM_FOLD_HIGHEST", "0") == "1" \
        else jax.lax.Precision.HIGH
    return jax.lax.dot_general(jnp.asarray(mat, x.dtype), x,
                               (((1,), (0,)), ((), ())), precision=prec)


def _c16(x):
    """Casts a fold operand to bf16 when the bf16 path is on (the convert
    fuses into the producer fusion's output, halving its HBM write and
    the consumer dot's read)."""
    return x.astype(jnp.bfloat16) if _phys_bf16() else x


def _quat_to_rot_rows(q4):
    """(4, N) quaternion rows -> (3, 3, N) rotation (body->world)."""
    w, x, y, z = q4[0], q4[1], q4[2], q4[3]
    rows = [
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], 0),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], 0),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], 0),
    ]
    return jnp.stack(rows, 0)


def _quat_mul_rows(a, b):
    """(4, N) x (4, N) Hamilton product."""
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw], 0)


def _rot_axis(axis, angle):
    """Rotation matrix about a fixed unit axis (Rodrigues), single-env."""
    a = jnp.asarray(axis)
    K = hat(a)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def _el(x):
    """Boundary transpose env-first (N, d) -> env-last (d, N)."""
    return x.T


class Kinematics(NamedTuple):
    """Per-link world poses and world-Plücker velocity-level quantities,
    ENV-LAST (trailing N; squeezed away for single-env calls)."""
    R_w: jnp.ndarray   # (nb, 3, 3, N) link->world rotations
    p_w: jnp.ndarray   # (nb, 3, N) link origins in world
    v: jnp.ndarray     # (nb, 6, N) link spatial velocities [w; vl], BODY
    #                    coords at the link origin (contacts/tasks read it)
    S_o: jnp.ndarray   # (nv, 6, N) world-Plücker dof motion subspaces
    Sv_o: jnp.ndarray  # (nv, 6, N) S_o rows scaled by the dof velocities
    V_o: jnp.ndarray   # (nb, 6, N) world-Plücker link velocities
    o: jnp.ndarray     # (3, N) floating reference point (first root)


def _promote(x):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None], x)


def _squeeze_last(tree):
    return jax.tree_util.tree_map(lambda a: a[..., 0], tree)


def _structure(model: ArticulatedModel):
    """Cached static one-hot matrices for the fold contractions."""
    s = getattr(model, "_el_structure", None)
    if s is not None:
        return s
    nb, nv = model.nb, model.nv
    nj = model.j1_links.size
    # Pointer-jumping FK: after round k every link's accumulated
    # transform covers 2^k ancestors, so the tree composes in
    # ceil(log2(depth+1)) rounds instead of `depth` sequential levels
    # (Humanoid's phantom chains make depth 10; 4 rounds suffice). The
    # per-round ancestor pointers are static, so each round is one
    # one-hot gather matmul + one unrolled transform composition.
    depth_max = int(model.depth.max())
    ptr = np.append(model.parent_pad, nb)  # virtual root nb -> itself
    jump_gathers = []
    covered = 1
    while covered < depth_max + 1:
        g = np.zeros((nb + 1, nb + 1), np.float32)
        g[np.arange(nb + 1), ptr] = 1.0
        jump_gathers.append(g)
        ptr = ptr[ptr]
        covered *= 2
    # Chain-aware 1-dof scatters: only the LAST dof of each joint chain
    # scatters its composed (G, u) product to its owning link row (for
    # single-dof joints — every model without phantom links — the chain
    # has length 1 and this is the plain per-joint scatter).
    j1_to_links = np.zeros((nb, nj), np.float32)
    last = np.flatnonzero(model.j1_last)
    j1_to_links[model.j1_links[last], last] = 1.0
    j1_to_v = np.zeros((nv, nj), np.float32)             # dof rows scatter
    j1_to_v[model.j1_v, np.arange(nj)] = 1.0
    # Chain compose: previous-dof gather + per-position row masks.
    j1_prev_gather = np.zeros((nj, nj), np.float32)
    j1_prev_gather[np.arange(nj), np.maximum(model.j1_prev, 0)] = 1.0
    chain_masks = [
        (model.j1_chain_pos == p).astype(np.float32)
        for p in range(model.j1_chain_maxpos + 1)]
    # Parent-link gather for the dof subspace anchors/axes (row nb of
    # the padded pose arrays is the identity virtual root).
    j1_par_gather = np.zeros((nj, nb + 1), np.float32)
    j1_par_gather[np.arange(nj),
                  np.append(model.parent_pad, nb)[model.j1_links]] = 1.0
    # Free-joint scatters + static row masks (fold-adds replace .at[]
    # row writes, which copy the whole destination array per write).
    free = model.free_list
    free_to_links = np.zeros((nb, len(free)), np.float32)
    free_to_v = np.zeros((nv, 6 * len(free)), np.float32)
    for f_i, (i, qi, vi) in enumerate(free):
        free_to_links[i, f_i] = 1.0
        free_to_v[vi:vi + 6, 6 * f_i:6 * (f_i + 1)] = np.eye(6)
    fixed_rows = np.ones(nb, np.float32)                 # neither j1 nor free
    fixed_rows[model.j1_links] = 0.0
    nonfree_rows = np.ones(nb, np.float32)
    for (i, qi, vi) in free:
        fixed_rows[i] = 0.0
        nonfree_rows[i] = 0.0
    s = dict(jump_gathers=jump_gathers,
             j1_to_links=j1_to_links, j1_to_v=j1_to_v,
             j1_prev_gather=j1_prev_gather, chain_masks=chain_masks,
             j1_par_gather=j1_par_gather,
             free_to_links=free_to_links, free_to_v=free_to_v,
             fixed_rows=fixed_rows, nonfree_rows=nonfree_rows)
    model._el_structure = s
    return s


def forward_kinematics(model: ArticulatedModel, q, v_dof,
                       params: DynParams) -> Kinematics:
    """Computes per-link world poses, world-Plücker joint subspaces and
    link velocities. Pointer-jumping propagation; env-last throughout.

    Link translations scale with ``params.scale`` (uniform geometry scale —
    the 'scale' DR operation changes limb lengths, not just collision
    radii)."""
    if q.ndim == 1:
        return _squeeze_last(forward_kinematics(
            model, q[None], v_dof[None], _promote(params)))
    n = q.shape[0]
    nb, nv = model.nb, model.nv
    st = _structure(model)
    qT = _el(q)                                           # (nq, N)
    vT = _el(v_dof)                                       # (nv, N)
    scale = jnp.broadcast_to(jnp.asarray(params.scale), (n,))  # (N,)

    # --- local child->parent transforms (R_loc = E^T, r_loc), env-last.
    # Base covers the static rows; 1-dof and free rows come in as
    # fold-ADDS over one-hot scatters (disjoint static rows — no .at[]
    # row writes, which copy the whole array per write). -------------- #
    E_tT = jnp.asarray(model.joint_rot_T, jnp.float32)    # (nb, 3, 3)
    fixed = st["fixed_rows"][:, None, None]
    R_loc = jnp.broadcast_to((E_tT * fixed)[..., None], (nb, 3, 3, n))
    # Base translations cover FIXED rows only: 1-dof rows route theirs
    # through the per-dof chain tables (u below), free rows through q.
    r_loc = jnp.asarray(model.joint_pos * st["fixed_rows"][:, None],
                        jnp.float32)[..., None] * scale   # (nb, 3, N)
    G = u = None
    if model.j1_links.size:
        nj = len(model.j1_links)
        q1 = qT[model.j1_q]                               # (nj, N)
        axes = jnp.asarray(model.j1_axis)[..., None]      # (nj, 3, 1)
        rev = jnp.asarray(model.j1_rev)[:, None]          # (nj, 1)
        ang = q1 * rev
        sin, cos = jnp.sin(ang), jnp.cos(ang)             # (nj, N)
        # Rodrigues, unrolled: R = I + sin K + (1-cos) K^2.
        ax, ay, az = axes[:, 0], axes[:, 1], axes[:, 2]   # (nj, 1)
        one = 1.0 - cos
        Rj = jnp.stack([
            jnp.stack([cos + ax * ax * one, ax * ay * one - az * sin,
                       ax * az * one + ay * sin], 1),
            jnp.stack([ay * ax * one + az * sin, cos + ay * ay * one,
                       ay * az * one - ax * sin], 1),
            jnp.stack([az * ax * one - ay * sin, az * ay * one + ax * sin,
                       cos + az * az * one], 1)], 1)      # (nj, 3, 3, N)
        E1 = jnp.broadcast_to(jnp.asarray(model.j1_E)[..., None],
                              (nj, 3, 3, n))
        # Per-dof local transform within its joint chain: rotation
        # G = E^T R(a, q) and translation u = t * scale (+ E^T a q for
        # prismatic rows, which is exact to add unconditionally since
        # the revolute mask zeroes it).
        G = _mm(E1, Rj)
        ax_par = np.einsum("jik,jk->ji", model.j1_E,
                           model.j1_axis)                 # (nj, 3) static
        pris = q1 * (1.0 - rev)                           # (nj, N)
        u = (jnp.asarray(model.j1_t, jnp.float32)[..., None] * scale
             + jnp.asarray(ax_par, jnp.float32)[..., None]
             * pris[:, None, :])                          # (nj, 3, N)
        # Joint-chain compose (phantom-collapsed multi-dof joints,
        # model.py _collapse_phantoms): round p folds every chain dof at
        # position p onto its predecessor's accumulated (G, u); chains
        # are <= 3 long, and models without phantom links skip this loop
        # entirely. After the loop G[i]/u[i] carry dof i's full rotation
        # / joint-origin offset expressed in the OWNING link's parent
        # frame.
        for p in range(1, model.j1_chain_maxpos + 1):
            Gp = _fold(st["j1_prev_gather"], G)
            up = _fold(st["j1_prev_gather"], u)
            m_p = jnp.asarray(st["chain_masks"][p])
            G = jnp.where(m_p[:, None, None, None] > 0, _mm(Gp, G), G)
            u = jnp.where(m_p[:, None, None] > 0, up + _mv(Gp, u), u)
        R_loc = R_loc + _fold(st["j1_to_links"], G)
        r_loc = r_loc + _fold(st["j1_to_links"], u)
    if model.free_list:
        R_free = jnp.concatenate(
            [_quat_to_rot_rows(qT[qi + 3:qi + 7])[None]
             for (i, qi, vi) in model.free_list], 0)      # (F, 3, 3, N)
        r_free = jnp.concatenate(
            [qT[qi:qi + 3][None] for (i, qi, vi) in model.free_list], 0)
        R_loc = R_loc + _fold(st["free_to_links"], R_free)
        r_loc = r_loc + _fold(st["free_to_links"], r_free)

    # --- pointer-jumping propagation (log-depth parallel prefix): ------- #
    # (R_i, p_i) accumulates the transform chain from each link toward
    # the root; round k composes every link with its 2^k-th ancestor's
    # accumulated segment ((R1,p1)∘(R2,p2) = (R1 R2, p1 + R1 p2) is
    # associative). Virtual root nb = identity. R and p stay SEPARATE
    # arrays (concatenating into a (3, 4) block and re-slicing forced a
    # physical relayout per round).
    Rc = jnp.concatenate(
        [R_loc, jnp.broadcast_to(jnp.eye(3)[None, ..., None],
                                 (1, 3, 3, n))], 0)        # (nb+1,3,3,N)
    pc = jnp.concatenate([r_loc, jnp.zeros((1, 3, n))], 0)
    # The one-hot fold IS the fastest ancestor lookup here: a static
    # leading-axis jnp.take measured 4.09M vs the fold's 4.66M steps/s
    # end-to-end (ShadowHand@16k) — XLA lowers the take to per-row
    # async copies whose dispatch overhead exceeds the fold's 3 MXU
    # passes.
    for g in st["jump_gathers"]:
        A_R = _fold(g, Rc)
        A_p = _fold(g, pc)
        Rc = _mm(A_R, Rc)
        pc = A_p + _mv(A_R, pc)
    R_w, p_w = Rc[:nb], pc[:nb]

    # --- world-Plücker dof subspaces about o = first root position. ----- #
    o = p_w[0]                                            # (3, N)
    rel = p_w - o[None]                                   # (nb, 3, N)
    S_o = jnp.zeros((nv, 6, n))
    if model.j1_links.size:
        nj = len(model.j1_links)
        # Axis and joint anchor of every chain dof, via the OWNING
        # link's parent pose (padded row nb = identity virtual root):
        # world axis = R_par (G a) (R(a,q) a = a keeps this exact for
        # revolute; prismatic G carries no own rotation), anchor =
        # p_par + R_par u. For single-dof joints this equals the old
        # own-link form R_w[link] a / p_w[link] exactly.
        axes = jnp.broadcast_to(
            jnp.asarray(model.j1_axis, jnp.float32)[..., None],
            (nj, 3, n))
        A = _mv(G, axes)                                  # (nj, 3, N)
        R_par = _fold(st["j1_par_gather"], Rc)            # (nj, 3, 3, N)
        p_par = _fold(st["j1_par_gather"], pc)            # (nj, 3, N)
        aw = _mv(R_par, A)
        anchor = p_par + _mv(R_par, u)
        mom = _cross(anchor - o[None], aw)
        rev = jnp.asarray(model.j1_rev)[:, None, None]
        rows = jnp.concatenate([aw * rev,
                                mom * rev + aw * (1.0 - rev)], 1)
        S_o = _fold(st["j1_to_v"], rows)
    if model.free_list:
        free_rows = []
        for (i, qi, vi) in model.free_list:
            # Angular dof k: [R e_k; (p-o) x R e_k]; linear: [0; R e_k].
            RT = jnp.swapaxes(R_w[i], 0, 1)               # rows e_k (3,3,N)
            momf = _cross(jnp.broadcast_to(rel[i][None], (3, 3, n)), RT)
            free_rows.append(jnp.concatenate([RT, momf], 1))
            free_rows.append(jnp.concatenate([jnp.zeros_like(RT), RT], 1))
        S_o = S_o + _fold(st["free_to_v"],
                          jnp.concatenate(free_rows, 0))

    # --- link velocities: V_b = sum_m anc[b, m] S_o[m] v[m]. ------------ #
    Sv_o = S_o * vT[:, None, :]
    V_o = _fold(model.anc_dof, Sv_o)

    # Body-frame [w; vl] at each link origin for contacts/tasks.
    w_w = V_o[:, :3]
    v_pt = V_o[:, 3:] + _cross(w_w, rel)
    w_b = _mvT(R_w, w_w)
    vl_b = _mvT(R_w, v_pt)
    v_body = jnp.concatenate([w_b, vl_b], 1)
    return Kinematics(R_w=R_w, p_w=p_w, v=v_body, S_o=S_o, Sv_o=Sv_o,
                      V_o=V_o, o=o)


def _link_inertias(model: ArticulatedModel, params: DynParams):
    """(nb, 6, 6, N) body-frame spatial inertias at the link origins from
    per-env mass/com/inertia, env-last (COM offsets and inertias scale
    with the geometry scale). Accepts single-env or (N, ..)-batched
    params."""
    mass = jnp.asarray(params.mass)
    single = mass.ndim == 1
    if single:
        params = _promote(params)
    n = jnp.asarray(params.mass).shape[0]
    nb = model.nb
    s = jnp.broadcast_to(jnp.asarray(params.scale), (n,))
    com = jnp.moveaxis(jnp.asarray(params.com), 0, -1) * s  # (nb, 3, N)
    diag = jnp.moveaxis(jnp.asarray(params.inertia), 0, -1) * s ** 2
    m = jnp.asarray(params.mass).T[:, None, None, :]        # (nb,1,1,N)
    cx, cy, cz = com[:, 0], com[:, 1], com[:, 2]
    zero = jnp.zeros_like(cx)
    c = jnp.stack([jnp.stack([zero, -cz, cy], 1),
                   jnp.stack([cz, zero, -cx], 1),
                   jnp.stack([-cy, cx, zero], 1)], 1)       # (nb,3,3,N)
    ccT = _mm(c, jnp.swapaxes(c, 1, 2))
    I_com = jnp.eye(3)[None, :, :, None] * \
        diag[:, None, :, :]                                  # diag embed
    tl = I_com + m * ccT
    eye3 = jnp.broadcast_to(jnp.eye(3)[None, :, :, None], (nb, 3, 3, n))
    top = jnp.concatenate([tl, m * c], 2)
    bot = jnp.concatenate([m * jnp.swapaxes(c, 1, 2), m * eye3], 2)
    out = jnp.concatenate([top, bot], 1)                     # (nb,6,6,N)
    return out[..., 0] if single else out


def _hat_rows(c):
    """(.., 3, N) -> (.., 3, 3, N) skew matrices (env-last)."""
    cx, cy, cz = c[..., 0, :], c[..., 1, :], c[..., 2, :]
    zero = jnp.zeros_like(cx)
    return jnp.stack([jnp.stack([zero, -cz, cy], -2),
                      jnp.stack([cz, zero, -cx], -2),
                      jnp.stack([-cy, cx, zero], -2)], -3)


def _plucker_inertia_direct(kin: Kinematics, params: DynParams):
    """(nb, 6, 6, N) spatial inertias about the reference point o, built
    DIRECTLY from world quantities: for COM position c = p_w + R com - o
    and world rotational inertia I_c = R diag(inertia s^2) R^T,

        I_o = [[I_c + m c^ c^T, m c^], [m c^T, m 1]].

    Identical to _inertia_to_plucker(_link_inertias(...)) (the spatial
    inertia of a rigid body about any frame depends only on mass, COM
    offset and COM inertia in that frame's coordinates) but needs only
    3x3 contractions instead of two 6x6 congruence matmuls per link —
    the hot path's single largest op-count/bandwidth sink."""
    R = kin.R_w                                            # (nb, 3, 3, N)
    n = R.shape[-1]
    nb = R.shape[0]
    s = jnp.broadcast_to(jnp.asarray(params.scale), (n,))
    com_l = jnp.moveaxis(jnp.asarray(params.com), 0, -1) * s  # (nb, 3, N)
    c = kin.p_w + _mv(R, com_l) - kin.o[None]              # world COM - o
    diag = jnp.moveaxis(jnp.asarray(params.inertia), 0, -1) * s ** 2
    m = jnp.asarray(params.mass).T[:, None, None, :]       # (nb, 1, 1, N)
    # I_c = R diag R^T, unrolled over the contraction index.
    RIcR = jnp.stack([jnp.stack([
        sum(R[:, i, k] * diag[:, k] * R[:, j, k] for k in range(3))
        for j in range(3)], 1) for i in range(3)], 1)
    ch = _hat_rows(c)
    tl = RIcR + m * _mm(ch, jnp.swapaxes(ch, 1, 2))
    eye3 = jnp.broadcast_to(jnp.eye(3)[None, :, :, None], (nb, 3, 3, n))
    top = jnp.concatenate([tl, m * ch], 2)
    bot = jnp.concatenate([m * jnp.swapaxes(ch, 1, 2), m * eye3], 2)
    return jnp.concatenate([top, bot], 1)


# --------------------------------------------------------------------- #
# 10-parameter symmetric spatial inertia (the hot-path representation).
#
# A spatial inertia about the shared reference point o is fully determined
# by 10 scalars: the symmetric 3x3 rotational block A = I_c + m chat chat^T
# (6), the first moment h = m c (3), and the mass m (1):
#
#     I_o = [[A, hat(h)], [hat(h)^T, m 1]].
#
# Storing (nb, 10, N) instead of (nb, 6, 6, N) cuts the HBM footprint of
# the engine's largest tensors 3.6x, composite-inertia accumulation (CRBA)
# stays a plain linear fold over the 10 rows, and every I_o @ V product
# needs 24 multiplies instead of 36 with no 6x6 materialization.
# Row layout: [Axx, Ayy, Azz, Axy, Axz, Ayz, hx, hy, hz, m].
# --------------------------------------------------------------------- #
def _i10_direct(kin: Kinematics, params: DynParams):
    """(nb, 10, N) spatial inertias about o from world COM/world-rotated
    inertia diagonals (same math as ``_plucker_inertia_direct``, packed).

    Returns f32 ALWAYS — the caller casts to bf16 for the bias path
    only. Rationale (round 5): the rotational block about the shared
    point o carries m|c|^2 terms that mostly CANCEL when CRBA projects
    through S onto a light distal dof, so the factorization pivot is a
    small difference of large products; bf16's ~0.4% relative error on
    I10 becomes an ABSOLUTE error on that scale, flips marginal pivots
    negative, and the LTDL/Cholesky non-positive-pivot NaN policy then
    (correctly) poisons the env. Measured on Humanoid, mid-range DR
    params, 16 envs: bf16 I10 into CRBA NaN'd 3/16 envs at step 1 and
    15/16 by step 5 (the env_step quarantine was absorbing a ~50%
    higher reset rate, 71 vs 48 per 960 env-steps); f32 I10 into CRBA
    eliminates the class. The bias path keeps bf16 I10 — its error is
    bounded force noise, not sign-critical."""
    R = kin.R_w                                            # (nb, 3, 3, N)
    n = R.shape[-1]
    s = jnp.broadcast_to(jnp.asarray(params.scale), (n,))
    com_l = jnp.moveaxis(jnp.asarray(params.com), 0, -1) * s  # (nb, 3, N)
    c = kin.p_w + _mv(R, com_l) - kin.o[None]              # (nb, 3, N)
    diag = jnp.moveaxis(jnp.asarray(params.inertia), 0, -1) * s ** 2
    mass = jnp.asarray(params.mass).T                      # (nb, N)

    def ric(i, j):  # (R diag R^T)[i, j]
        return sum(R[:, i, k] * diag[:, k] * R[:, j, k] for k in range(3))

    cx, cy, cz = c[:, 0], c[:, 1], c[:, 2]
    c2 = cx * cx + cy * cy + cz * cz
    rows = [ric(0, 0) + mass * (c2 - cx * cx),
            ric(1, 1) + mass * (c2 - cy * cy),
            ric(2, 2) + mass * (c2 - cz * cz),
            ric(0, 1) - mass * cx * cy,
            ric(0, 2) - mass * cx * cz,
            ric(1, 2) - mass * cy * cz,
            mass * cx, mass * cy, mass * cz,
            jnp.broadcast_to(mass, c2.shape)]
    return jnp.stack(rows, 1)                              # (nb, 10, N)


def _i10_mv(I10, V):
    """I_o @ V for packed inertias: I10 (.., 10, N), V (.., 6, N) motion
    [w; u] -> force [A w + h x u; -h x w + m u], (.., 6, N)."""
    axx, ayy, azz = I10[..., 0, :], I10[..., 1, :], I10[..., 2, :]
    axy, axz, ayz = I10[..., 3, :], I10[..., 4, :], I10[..., 5, :]
    h = I10[..., 6:9, :]
    m = I10[..., 9, :]
    w, u = V[..., :3, :], V[..., 3:, :]
    wx, wy, wz = w[..., 0, :], w[..., 1, :], w[..., 2, :]
    aw = jnp.stack([axx * wx + axy * wy + axz * wz,
                    axy * wx + ayy * wy + ayz * wz,
                    axz * wx + ayz * wy + azz * wz], -2)
    top = aw + _cross(h, u)
    bot = m[..., None, :] * u - _cross(h, w)
    return jnp.concatenate([top, bot], -2)


def _bias_from_i10(model: ArticulatedModel, kin: Kinematics, I10,
                   params: DynParams, f_ext_world=None):
    """RNEA bias (qdd = 0) like ``_bias_from_plucker`` but on packed
    inertias. Returns (nv, N)."""
    nv, nb = model.nv, model.nb
    n = kin.V_o.shape[-1]
    # Velocity of each dof's OWN joint frame (its subspace is fixed
    # there): a per-dof ancestry fold over Sv_o — exact through phantom
    # collapse, where intermediate chain links have no V_o row.
    Vd = _fold(model.dof_vd_mask, _c16(kin.Sv_o), out_dtype=jnp.float32)
    Sv = kin.Sv_o
    dSa = _cross(Vd[:, :3], Sv[:, :3])
    dSl = _cross(Vd[:, :3], Sv[:, 3:]) + _cross(Vd[:, 3:], Sv[:, :3])
    Sdot_v = jnp.concatenate([dSa, dSl], 1)               # (nv, 6, N)
    grav = jnp.broadcast_to(jnp.asarray(params.gravity).T.reshape(3, -1),
                            (3, n))
    a = _fold(model.anc_dof, _c16(Sdot_v), out_dtype=jnp.float32)
    a = a.at[:, 3:].add(-grav[None])
    IV = _i10_mv(I10, kin.V_o)
    Ia = _i10_mv(I10, a)
    w, vl = kin.V_o[:, :3], kin.V_o[:, 3:]
    vxf = jnp.concatenate([_cross(w, IV[:, :3]) + _cross(vl, IV[:, 3:]),
                           _cross(w, IV[:, 3:])], 1)
    f = Ia + vxf                                          # (nb, 6, N)
    if f_ext_world is not None:
        rel = kin.p_w - kin.o[None]
        n_o = f_ext_world[:, :3] + _cross(rel, f_ext_world[:, 3:])
        f = f - jnp.concatenate([n_o, f_ext_world[:, 3:]], 1)
    F = _fold(model.anc_dof.T, _c16(f), out_dtype=jnp.float32)
    return jnp.sum(F * kin.S_o, 1)                        # (nv, N)


def external_generalized_force(model: ArticulatedModel, kin: Kinematics,
                               f_ext_world):
    """Generalized force tau = J^T f from per-link world wrenches,
    (nv, N). ``f_ext_world`` is env-last (nb, 6, N) with rows
    [torque@link-origin; force] — the contact functions' output
    convention. Same projection ``_bias_from_i10`` folds into the RHS;
    exposed standalone for dof-force sensor observations (IG's
    dof_force_tensor analogue in ShadowHand full_state obs)."""
    rel = kin.p_w - kin.o[None]
    n_o = f_ext_world[:, :3] + _cross(rel, f_ext_world[:, 3:])
    f = jnp.concatenate([n_o, f_ext_world[:, 3:]], 1)
    F = _fold(model.anc_dof.T, _c16(f), out_dtype=jnp.float32)
    return jnp.sum(F * kin.S_o, 1)                        # (nv, N)


def _mass_factors_i10(model: ArticulatedModel, kin: Kinematics, I10):
    """CRBA left factor F[m] = IC_m S_m from packed composite inertias
    (IC_m = subtree sum of I10 — the 10-vector is linear in the bodies).
    Returns (nv, 6, N)."""
    nb, nv = model.nb, model.nv
    n = I10.shape[-1]
    IC = _fold(model.anc_dof.T, I10)
    return _i10_mv(IC, kin.S_o)


def _inertia_to_plucker(kin: Kinematics, I_sp):
    """Re-expresses body-frame spatial inertias (at link origins) in the
    shared world-Plücker frame about o: I_o = X^{-T} I X^{-1} with
    X = [[R, 0], [hat(p-o) R, R]] the body->Plücker motion transform.
    All (nb, 6, 6, N), env-last."""
    RT = jnp.swapaxes(kin.R_w, 1, 2)                      # (nb, 3, 3, N)
    rel = kin.p_w - kin.o[None]
    rx, ry, rz = rel[:, 0], rel[:, 1], rel[:, 2]
    zero = jnp.zeros_like(rx)
    rel_hat = jnp.stack([jnp.stack([zero, -rz, ry], 1),
                         jnp.stack([rz, zero, -rx], 1),
                         jnp.stack([-ry, rx, zero], 1)], 1)
    G = -_mm(RT, rel_hat)                                 # (nb, 3, 3, N)
    Z = jnp.zeros_like(RT)
    Xi = jnp.concatenate([
        jnp.concatenate([RT, Z], 2),
        jnp.concatenate([G, RT], 2)], 1)                  # (nb, 6, 6, N)
    IXi = _mm(I_sp, Xi, n=6)
    return _mmT(Xi, IXi, n=6)


def _bias_from_plucker(model: ArticulatedModel, kin: Kinematics, I_o,
                       params: DynParams, f_ext_world=None):
    """RNEA with qdd = 0 in env-last world-Plücker form: the bias
    acceleration of body b is sum_m anc[b, m] (V_{link(m)} x S_m v_m) —
    every joint subspace is constant in its child's frame, so
    S_dot = V_child x S uniformly — each body contributes
    f_b = I a_b + V x* (I V) - f_ext, and C[m] = S_m . sum_b anc[b, m] f_b.
    Returns (nv, N)."""
    nv, nb = model.nv, model.nb
    n = kin.V_o.shape[-1]
    Vd = _fold(model.dof_vd_mask, kin.Sv_o)
    Sv = kin.Sv_o
    dSa = _cross(Vd[:, :3], Sv[:, :3])
    dSl = _cross(Vd[:, :3], Sv[:, 3:]) + _cross(Vd[:, 3:], Sv[:, :3])
    Sdot_v = jnp.concatenate([dSa, dSl], 1)               # (nv, 6, N)
    grav = jnp.broadcast_to(jnp.asarray(params.gravity).T.reshape(3, -1),
                            (3, n))
    a = _fold(model.anc_dof, Sdot_v)
    a = a.at[:, 3:].add(-grav[None])
    IV = _mv(I_o, kin.V_o, n=6)
    Ia = _mv(I_o, a, n=6)
    w, vl = kin.V_o[:, :3], kin.V_o[:, 3:]
    vxf = jnp.concatenate([_cross(w, IV[:, :3]) + _cross(vl, IV[:, 3:]),
                           _cross(w, IV[:, 3:])], 1)
    f = Ia + vxf                                          # (nb, 6, N)
    if f_ext_world is not None:
        rel = kin.p_w - kin.o[None]
        n_o = f_ext_world[:, :3] + _cross(rel, f_ext_world[:, 3:])
        f = f - jnp.concatenate([n_o, f_ext_world[:, 3:]], 1)
    F = _fold(model.anc_dof.T, f)
    return jnp.sum(F * kin.S_o, 1)                        # (nv, N)


def _mass_factors_plucker(model: ArticulatedModel, kin: Kinematics, I_o):
    """CRBA left factor F[m] = IC_dof[m] S_m where IC_dof[m] =
    sum_b anc[b, m] I_o[b] is the composite inertia of dof m's subtree.
    Returns (nv, 6, N)."""
    nb, nv = model.nb, model.nv
    n = I_o.shape[-1]
    IC = _fold(model.anc_dof.T, I_o)
    return _mv(IC, kin.S_o, n=6)


def _mass_from_plucker(model: ArticulatedModel, kin: Kinematics, I_o):
    """CRBA in env-last world-Plücker form: M[m, l] = S_m^T
    IC_{deeper(m, l)} S_l on ancestor-related pairs (static mask), then
    symmetrized. Returns (nv, nv, N) — the solver's lanes layout."""
    nv = model.nv
    F = _mass_factors_plucker(model, kin, I_o)
    Ml = sum(F[:, None, k, :] * kin.S_o[None, :, k, :] for k in range(6))
    Ml = Ml * jnp.asarray(model.crba_mask)[:, :, None]
    diag = Ml * jnp.eye(nv)[:, :, None]
    return Ml + jnp.swapaxes(Ml, 0, 1) - diag


def bias_forces(model: ArticulatedModel, kin: Kinematics, I_sp,
                params: DynParams, f_ext_world=None):
    """RNEA with qdd = 0: C(q, v) - tau_ext, including gravity (as a base
    acceleration) and optional world-frame external forces per link
    ((nb, 6, N) [torque; force] about each link origin, env-last).
    Returns env-first (N, nv) / single-env (nv,)."""
    single = kin.p_w.ndim == 2
    if single:
        kin = _promote_kin(kin)
        I_sp = I_sp[..., None]
        params = _promote(params)
        if f_ext_world is not None:
            f_ext_world = f_ext_world[..., None]
    C = _bias_from_plucker(model, kin, _inertia_to_plucker(kin, I_sp),
                           params, f_ext_world)
    return C[:, 0] if single else C.T


def mass_matrix(model: ArticulatedModel, kin: Kinematics, I_sp):
    """CRBA composite-rigid-body mass matrix: (nv, nv) single-env or
    (N, nv, nv) batched."""
    single = kin.p_w.ndim == 2
    if single:
        kin = _promote_kin(kin)
        I_sp = I_sp[..., None]
    M = _mass_from_plucker(model, kin,
                           _inertia_to_plucker(kin, I_sp))
    return M[..., 0] if single else jnp.moveaxis(M, -1, 0)


def _promote_kin(kin: Kinematics) -> Kinematics:
    return jax.tree_util.tree_map(lambda a: a[..., None], kin)


def carried_mass_factor(factor, default=False):
    """Gate for the frozen-mass-matrix substep scheme: returns the
    factor carried from the previous substep so ``forward_dynamics``
    skips the CRBA build + factorization, or None for a fresh
    factorization every substep. ``default`` is the calling TASK's
    preference; ``BSIM_FROZEN_MASS=1``/``=0`` force it either way.

    The tradeoff moved across rounds. Round 3 (pre-collapse): freezing
    LOST on throughput everywhere (ShadowHand@16k 229 vs 198 ms/round,
    Humanoid@4096 62 vs 47) — the carried ~|pairs| factor rows cost
    more buffer traffic than the refactorization saved. Round 5 (post
    phantom-link collapse, which halved the streamed link rows and FK
    depth) the throughput sign flipped: Humanoid@4096 measures 8.62M
    frozen vs 6.99M fresh env-steps/s (+23%, K-slope protocol), Ant
    13.4M vs 12.7M (+5%). But a 400-iteration PPO learnability A/B
    (identical seeds/protocol) splits the defaults by TASK STABILITY,
    not actuation: frozen-mass Ant matches fresh (final mean step
    reward 10.6 vs 10.4), while frozen-mass Humanoid NEVER learns to
    run (stuck at -0.3..-0.6 vs 2.7 -> 9.0 fresh) — the O(h^2 |qd| dM)
    stale-M substep error concentrates on exactly the post-impact
    high-|qd| states a high-CoM gait must recover from, while the
    sprawled Ant tolerates it. So: Ant defaults ON (throughput for
    free), Humanoid and every stiff-implicit-PD task defaults OFF
    (for those, stale M + stiff drives additionally pumps energy —
    FrankaCabinet's tracking test fails frozen). The env knob forces
    either way for A/Bs. Accuracy contract tested in test_physics.py
    (step-1 deviation O(h^2 |qd| dM))."""
    v = os.environ.get("BSIM_FROZEN_MASS", "")
    frozen = default if v == "" else v == "1"
    return factor if frozen else None


def joint_passive_torque(model: ArticulatedModel, params: DynParams, q_dof,
                         v_dof):
    """Parallel joint springs toward 0, viscous damping handled implicitly
    elsewhere, and smooth dry friction. Layout follows the inputs."""
    tau = -params.stiffness * q_dof
    tau = tau - params.friction * jnp.tanh(v_dof / 0.05)
    return tau


def dof_positions(model: ArticulatedModel, q):
    """Extracts the 1-dof joint positions as an (.., nv) vector (zeros on
    free-joint dof slots)."""
    out = jnp.zeros(q.shape[:-1] + (model.nv,))
    if model.j1_links.size:
        out = out.at[..., model.j1_v].set(q[..., model.j1_q])
    return out


def forward_dynamics(model: ArticulatedModel, q, v, tau,
                     params: DynParams, f_ext_world=None, dt=None,
                     kin: Optional[Kinematics] = None,
                     factor=None, return_factor: bool = False,
                     drive_kp=None, drive_kd=None, drive_target=None,
                     drive_effort=None):
    """qdd = (M + diag(armature) + dt*diag(damping))^-1 (tau - C - d v).

    Viscous joint damping is integrated implicitly (see module docstring):
    the damping torque at the NEW velocity is -d (v + dt qdd), which moves
    ``dt*d`` onto the LHS and ``-d v`` into the RHS. Pass a precomputed
    ``kin`` (e.g. the one used for contact forces) to skip recomputing FK.
    ``f_ext_world`` is env-last (nb, 6, N) for batched calls, (nb, 6) for
    single-env ones (matching the contact functions' output).

    ``drive_kp``/``drive_kd``/``drive_target`` (broadcastable to ``v``'s
    (N, nv) shape; zero kp on undriven dofs) add a PD *position drive*
    solved IMPLICITLY, the way PhysX solves joint drives (the reference's
    tasks set dof_properties stiffness/damping as drive gains on top of
    exactly this semantics). Explicit PD — adding the drive torque to
    ``tau`` — is numerically unstable whenever h*kd/I or h^2*kp/I is
    O(1), which holds for every stiff servo on a small-inertia link
    (Franka fingers: kd/I*h ~ 30; ShadowHand distal joints likewise);
    the velocity clamps then mask the blow-up as a dithering joint that
    tracks nothing. Implicit expansion about the NEW state (q_new = q +
    h v_new, v_new = v + h qdd):
        tau_drive = kp (target - q_new) - kd v_new
                  = kp (target - q) - (kd + h kp)(v + h qdd)
    so ``kp (target - q) - (kd + h kp) v`` joins the RHS and
    ``h (kd + h kp)`` joins the LHS diagonal — unconditionally stable.
    ``drive_effort`` clamps the proportional term (the engine-limit
    analogue of IG's per-dof effort; the implicit damping part is the
    solver's, not the motor's).

    ``factor``/``return_factor`` let a caller reuse the mass-matrix
    factorization across a step's physics substeps (M varies only by
    O(h |qd|) between substeps while bias/contact forces are recomputed
    fresh — the standard frozen-mass-matrix substep scheme): pass
    ``return_factor=True`` to get ``(qdd, kin, factor)`` and feed that
    ``factor`` back in on the next substep, skipping the CRBA build and
    the factorization (the round-3 trace's largest post-FK cost). The
    payload is solver-specific and opaque."""
    if q.ndim == 1:
        out = forward_dynamics(
            model, q[None], v[None], tau[None], _promote(params),
            None if f_ext_world is None else f_ext_world[..., None], dt,
            None if kin is None else _promote_kin(kin),
            factor=factor, return_factor=return_factor,
            drive_kp=drive_kp, drive_kd=drive_kd,
            drive_target=drive_target, drive_effort=drive_effort)
        if return_factor:
            qdd, kin1, factor = out
            return qdd[0], _squeeze_last(kin1), factor
        qdd, kin1 = out
        return qdd[0], _squeeze_last(kin1)
    if kin is None:
        kin = forward_kinematics(model, q, v, params)
    I10 = _i10_direct(kin, params)                       # f32 (M path)
    C = _bias_from_i10(model, kin, _c16(I10), params,
                       f_ext_world)                       # (nv, N)
    vT = _el(v)
    q_dofT = _el(dof_positions(model, q))
    stiffT = _el(jnp.broadcast_to(jnp.asarray(params.stiffness),
                                  v.shape))
    fricT = _el(jnp.broadcast_to(jnp.asarray(params.friction), v.shape))
    dampT = _el(jnp.broadcast_to(jnp.asarray(params.damping), v.shape))
    armT = _el(jnp.broadcast_to(jnp.asarray(params.armature), v.shape))
    passive = -stiffT * q_dofT - fricT * jnp.tanh(vT / 0.05)
    rhs = _el(tau) + passive - C - dampT * vT              # (nv, N)
    diag_extra = armT + 1e-6
    if dt is not None:
        diag_extra = diag_extra + dt * dampT
    if drive_kp is not None:
        kpT = _el(jnp.broadcast_to(jnp.asarray(drive_kp), v.shape))
        kdT = (_el(jnp.broadcast_to(jnp.asarray(drive_kd), v.shape))
               if drive_kd is not None else jnp.zeros_like(kpT))
        tgtT = _el(jnp.broadcast_to(jnp.asarray(drive_target), v.shape))
        p_term = kpT * (tgtT - q_dofT)
        if drive_effort is not None:
            p_term = jnp.clip(p_term, -drive_effort, drive_effort)
        h_drv = dt if dt is not None else 0.0
        gain = kdT + h_drv * kpT
        rhs = rhs + p_term - gain * vT
        diag_extra = diag_extra + h_drv * gain
    # Mass matrix + solve, picked by the tree's measured sparsity
    # (BSIM_TREE_SOLVE=auto|1|0): CRBA entries exist only at dof-tree
    # ancestor pairs, and when they are sparse enough — ShadowHand: 128
    # of 465 lower-triangle entries, ~14x fewer factorization flops —
    # the branch-sparse LTDL of ops/tree_solve.py wins decisively. For
    # near-dense trees (Ant: a 6-dof free-base block + shallow 2-dof
    # legs = 77% of the triangle) the column-blocked dense lanes
    # Cholesky is faster than the LTDL's many tiny lane ops. A/B on the
    # v5e through the full collection path placed the crossover between
    # Humanoid (0.643 dense pairs: tree 3.63M vs dense 3.35M steps/s)
    # and Anymal (0.684: tree 2.87M vs dense 6.34M); Ant (0.771) dense
    # 6.8M vs tree 4.4M, ShadowHand (0.275) tree 3.4-3.7M vs 2.3M-era
    # dense. Threshold 0.66 picks the measured winner for every model.
    chains = model.dof_anc_chains
    pairs = ancestor_pairs(chains)
    mode = os.environ.get("BSIM_TREE_SOLVE", "auto")
    n_tri = model.nv * (model.nv + 1) // 2
    use_tree = (mode == "1" or
                (mode == "auto" and len(pairs) <= 0.66 * n_tri))
    if factor is None:
        F = _mass_factors_i10(model, kin, I10)             # (nv, 6, N)
        S = kin.S_o
        if use_tree:
            # Kept as the per-pair fusion DAG deliberately: a row-form
            # rewrite (stacked (1+|chain|, 6, N) S gathers + wave
            # -scheduled 2D fold substitution) measured SLOWER end to
            # end (4.46M vs 4.66M ShadowHand@16k steps/s) — XLA keeps
            # these per-pair slices virtual inside fusions, while
            # stack/concat row materialization pays real copies.
            M = {}
            for (k, i) in pairs:
                M[(k, i)] = sum(F[k, c] * S[i, c] for c in range(6))
            for k in range(model.nv):
                M[(k, k)] = M[(k, k)] + diag_extra[k]
            # Factorization form: the left-looking column-slab variant
            # wins when chains are deep (few big fused ops beat many
            # sub-microsecond per-pair ops); per-pair right-looking wins
            # on shallow wide trees (ShadowHand) where slab stacking
            # overhead exceeds the op-count savings. auto picks by mean
            # proper-ancestor chain depth (Humanoid ~8.0, ShadowHand
            # ~3.3; A/B on the v5e: see PARITY.md round-4 solver table).
            ll_mode = os.environ.get("BSIM_TREE_LL", "auto")
            mean_depth = sum(len(c) for c in chains) / max(len(chains), 1)
            use_ll = (ll_mode == "1" or
                      (ll_mode == "auto" and mean_depth >= 5.0))
            fac_fn = ltdl_factor_ll if use_ll else ltdl_factor
            factor = ("tree", fac_fn(chains, M))
        else:
            Ml = sum(F[:, None, c, :] * S[None, :, c, :] for c in range(6))
            Ml = Ml * jnp.asarray(model.crba_mask)[:, :, None]
            diag = Ml * jnp.eye(model.nv)[:, :, None]
            Ml = Ml + jnp.swapaxes(Ml, 0, 1) - diag
            lhs = Ml + jnp.eye(model.nv)[:, :, None] * diag_extra[None, :, :]
            factor = ("dense", spd_factor_lanes(lhs))
    kind, payload = factor
    if kind == "tree":
        qdd = jnp.stack(
            ltdl_substitute(chains, payload,
                            [rhs[k] for k in range(model.nv)]), 0).T
    else:
        qdd = spd_substitute_lanes(payload, rhs).T
    if return_factor:
        return qdd, kin, factor
    return qdd, kin


def mass_factor_solve(model: ArticulatedModel, factor, rhs):
    """Solves (M + diag_extra) X = rhs against a ``forward_dynamics``
    factor (``return_factor=True``) for K extra right-hand sides in lanes
    layout: rhs (K, nv, N) -> X (K, nv, N). Lets the velocity-level
    contact impulse pass (contact.py) build the M^-1 J^T columns of the
    Delassus operator from the factorization the dynamics solve already
    paid for. Works for both factor kinds (tree LTDL rows broadcast the K
    axis; the dense Cholesky substitutes per column, unrolled over the
    static K).

    The solve runs in the dtype of ``rhs``: the impulse pass passes bf16
    under the engine's standard bf16 policy (_phys_bf16) — the K-RHS
    substitution is pure bandwidth, a ~0.4% perturbation of an impulse
    the LCP sweep iterates on anyway (the dynamics solve itself stays
    f32). The tree factor's (N,)-rows are cast once per call (tiny)."""
    kind, payload = factor
    if kind == "tree":
        if rhs.dtype != jnp.float32:
            H, D = payload
            payload = ({k: v.astype(rhs.dtype) for k, v in H.items()},
                       [d.astype(rhs.dtype) for d in D])
        rows = ltdl_substitute(model.dof_anc_chains, payload,
                               [rhs[:, k] for k in range(model.nv)])
        return jnp.stack(rows, 1)                          # (K, nv, N)
    return jnp.stack([spd_substitute_lanes(payload,
                                           rhs[k].astype(jnp.float32))
                      for k in range(rhs.shape[0])], 0)


# Rigid-body velocity caps (PhysX defaults the reference's engine runs
# with: maxLinearVelocity 1e2-class, maxAngularVelocity 64 rad/s).
MAX_LIN_VEL = 100.0
MAX_ANG_VEL = 64.0


def _clamp_norm_rows(vec, vmax):
    """(3, N): rescales so the norm over axis 0 is at most vmax."""
    nrm = jnp.sqrt(jnp.sum(vec * vec, 0, keepdims=True))
    return vec * (vmax / jnp.maximum(nrm, vmax))


def integrate(model: ArticulatedModel, q, v, qdd, dt):
    """Semi-implicit Euler; free-joint velocities are advanced in the WORLD
    frame and re-expressed in the rotated body frame.

    The body-coordinate velocity derivative contains the transport term
    -w x v; integrating it with explicit Euler inflates |v| by
    sqrt(1 + (|w| dt)^2) per step — an energy pump that blows up spinning
    free bodies. Advancing in world coordinates makes the frame-rotation
    part of the update an exact re-projection (norm-preserving).

    Velocities are clamped after the advance, mirroring the engine limits
    the reference relies on (PhysX maxJointVelocity per dof and the rigid
    -body max linear/angular velocities): under extreme DR (ultra-light
    links with strong actuators) accelerations are enormous and the
    unclamped semi-implicit update diverges to NaN within an episode."""
    if q.ndim == 1:
        qn, vn = integrate(model, q[None], v[None], qdd[None], dt)
        return qn[0], vn[0]
    qT, vT, qddT = _el(q), _el(v), _el(qdd)
    v_new = vT + dt * qddT
    q_new = qT
    if model.j1_links.size:
        maxv = jnp.asarray(model.j1_maxv)[:, None]
        v1 = jnp.clip(v_new[model.j1_v], -maxv, maxv)
        v_new = v_new.at[model.j1_v].set(v1)
        q_new = q_new.at[model.j1_q].set(qT[model.j1_q] + dt * v1)
    for (i, qi, vi) in model.free_list:
        w_body = vT[vi:vi + 3]
        vl_body = vT[vi + 3:vi + 6]
        quat = qT[qi + 3:qi + 7]                          # (4, N)
        R = _quat_to_rot_rows(quat)                       # (3, 3, N)

        def rot(Rm, x):
            return jnp.stack([sum(Rm[i_, k_] * x[k_] for k_ in range(3))
                              for i_ in range(3)], 0)
        # Classical (world-frame) accelerations of the link origin: the
        # spatial qdd is the body-coords derivative of v, so add back the
        # transport terms before rotating to world.
        aw_lin = rot(R, qddT[vi + 3:vi + 6] +
                     _cross(w_body[None], vl_body[None])[0])
        aw_ang = rot(R, qddT[vi:vi + 3])
        vw = _clamp_norm_rows(rot(R, vl_body) + dt * aw_lin, MAX_LIN_VEL)
        ww = _clamp_norm_rows(rot(R, w_body) + dt * aw_ang, MAX_ANG_VEL)
        pos = qT[qi:qi + 3] + dt * vw
        # Quaternion integration by the world angular velocity.
        omega4 = jnp.concatenate([jnp.zeros_like(ww[:1]), ww], 0)
        dq = 0.5 * _quat_mul_rows(omega4, quat)
        quat_n = quat + dt * dq
        quat_n = quat_n / (jnp.sqrt(jnp.sum(quat_n ** 2, 0,
                                            keepdims=True)) + 1e-12)
        R_n = _quat_to_rot_rows(quat_n)

        def rotT(Rm, x):
            return jnp.stack([sum(Rm[k_, i_] * x[k_] for k_ in range(3))
                              for i_ in range(3)], 0)
        q_new = q_new.at[qi:qi + 3].set(pos)
        q_new = q_new.at[qi + 3:qi + 7].set(quat_n)
        v_new = v_new.at[vi:vi + 3].set(rotT(R_n, ww))
        v_new = v_new.at[vi + 3:vi + 6].set(rotT(R_n, vw))
    return q_new.T, v_new.T


def clamp_limits(model: ArticulatedModel, q, v, stiffness=200.0):
    """Hard-clamps 1-dof joints to their limits, zeroing inward velocity."""
    if not model.j1_links.size:
        return q, v
    if q.ndim == 1:
        qn, vn = clamp_limits(model, q[None], v[None])
        return qn[0], vn[0]
    lo = jnp.asarray(model.j1_lo)[:, None]
    hi = jnp.asarray(model.j1_hi)[:, None]
    qT, vT = _el(q), _el(v)
    q1 = qT[model.j1_q]
    v1 = vT[model.j1_v]
    v1n = jnp.where(q1 < lo, jnp.maximum(v1, 0.0),
                    jnp.where(q1 > hi, jnp.minimum(v1, 0.0), v1))
    qT = qT.at[model.j1_q].set(jnp.clip(q1, lo, hi))
    vT = vT.at[model.j1_v].set(v1n)
    return qT.T, vT.T
