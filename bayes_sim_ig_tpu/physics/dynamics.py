"""Forward dynamics for articulated trees: FK, RNEA bias, CRBA mass matrix,
dense SPD solve, semi-implicit integration.

Replaces the PhysX reduced-coordinate articulation solver the reference
drives through Isaac Gym (SURVEY.md §2.2). Design choices for TPU:

  * the engine is NATIVELY BATCHED over the env axis (params-as-data):
    every public function accepts single-env ``(nq,)``-style arrays or
    batched ``(N, nq)`` ones. Tasks call it on whole env batches, so the
    hot ops are big regular tensor contractions, not vmapped scalar code;
  * all per-link/per-dof loops are replaced by batched tensor ops over the
    whole link axis: spatial quantities live in world Plücker coordinates
    about a floating reference point (the first root's position), where the
    tree structure enters only through static 0/1 ancestor masks — so RNEA
    bias forces, body velocities and the CRBA mass matrix are a handful of
    masked matmuls/einsums instead of thousands of unrolled 6x6 ops. This
    keeps the per-step HLO small (fast compiles, lax.scan-friendly) and
    maps the contraction work onto the MXU;
  * FK is level-batched: links at equal tree depth propagate together, so
    the only sequential dependency is the tree depth (<= ~7);
  * the reference point o = p_w[root] (not the world origin) keeps Plücker
    moment arms bounded by the mechanism size, so float32 stays accurate
    when locomoting bodies wander far from the origin;
  * the (M + ...) qdd = rhs solve uses a custom batched small-SPD kernel
    (ops/spd_kernel.py): XLA's cholesky/triangular_solve custom calls cost
    ~2-4 ms for (1024, 14..30) systems on TPU — 10-100x the rest of the
    step — while one Pallas Gauss-elimination kernel with envs on the
    vector lanes runs the whole batch in tens of microseconds;
  * joint damping (and PD derivative gains) are handled implicitly by
    folding ``dt * d`` into the LHS, which keeps large randomized
    damping/stiffness draws stable at 1/60 s steps — important because the
    DR configs sample damping up to 100x defaults;
  * everything is a pure function of (q, v, tau, params), so domain
    randomization is just batched parameter arrays.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .model import ArticulatedModel, DynParams
from .spatial import hat, quat_to_rot, quat_integrate
from ..ops.spd_kernel import spd_solve_lanes

_HI = jax.lax.Precision.HIGHEST


def _hat_batch(v):
    """(..., 3) -> (..., 3, 3) skew-symmetric cross-product matrices."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1)], -2)


def _rodrigues(axes, angles):
    """(..., 3) unit axes + (...,) angles -> (..., 3, 3) rotations."""
    K = _hat_batch(axes)
    s = jnp.sin(angles)[..., None, None]
    c = jnp.cos(angles)[..., None, None]
    KK = jnp.matmul(K, K, precision=_HI)
    return jnp.eye(3) + s * K + (1.0 - c) * KK


def _rot_axis(axis, angle):
    """Rotation matrix about a fixed unit axis (Rodrigues)."""
    a = jnp.asarray(axis)
    K = hat(a)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def _promote(x):
    """Adds a leading batch axis to an array or DynParams pytree."""
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None], x)


def _squeeze0(x):
    return jax.tree_util.tree_map(lambda a: a[0], x)


class Kinematics(NamedTuple):
    """Per-link world poses and world-Plücker velocity-level quantities.
    Shapes shown for the batched form; single-env calls return them without
    the leading N."""
    R_w: jnp.ndarray   # (N, nb, 3, 3) link->world rotations
    p_w: jnp.ndarray   # (N, nb, 3) link origins in world
    v: jnp.ndarray     # (N, nb, 6) link spatial velocities [w; vl], BODY
    #                    coords at the link origin (contacts/tasks read it)
    S_o: jnp.ndarray   # (N, nv, 6) world-Plücker dof motion subspaces
    Sv_o: jnp.ndarray  # (N, nv, 6) S_o rows scaled by the dof velocities
    V_o: jnp.ndarray   # (N, nb, 6) world-Plücker link velocities
    o: jnp.ndarray     # (N, 3) floating reference point (first root)


def forward_kinematics(model: ArticulatedModel, q, v_dof,
                       params: DynParams) -> Kinematics:
    """Computes per-link world poses, world-Plücker joint subspaces and
    link velocities. Level-batched: one gather+matmul per tree depth.

    Link translations scale with ``params.scale`` (uniform geometry scale —
    the 'scale' DR operation changes limb lengths, not just collision
    radii)."""
    if q.ndim == 1:
        return _squeeze0(forward_kinematics(
            model, q[None], v_dof[None], _promote(params)))
    n = q.shape[0]
    nb, nv = model.nb, model.nv
    # --- local child->parent transforms for every link, batched. -------- #
    R_loc = jnp.broadcast_to(jnp.asarray(model.joint_rot_T, jnp.float32),
                             (n, nb, 3, 3))
    scale = jnp.reshape(
        jnp.broadcast_to(jnp.asarray(params.scale), (n,)), (n, 1, 1))
    r_loc = jnp.asarray(model.joint_pos, jnp.float32) * scale  # (n, nb, 3)
    if model.j1_links.size:
        q1 = q[:, model.j1_q]                                  # (n, nj)
        axes = jnp.asarray(model.j1_axis)                      # (nj, 3)
        rev = jnp.asarray(model.j1_rev)
        Rj = _rodrigues(jnp.broadcast_to(axes, (n,) + axes.shape),
                        q1 * rev)                              # (n, nj, 3, 3)
        E_tT = jnp.asarray(model.joint_rot_T)[model.j1_links]  # (nj, 3, 3)
        R1 = jnp.matmul(E_tT, Rj, precision=_HI)
        R_loc = R_loc.at[:, model.j1_links].set(R1)
        # Prismatic joints translate along E_t^T @ axis by q.
        ax_par = jnp.einsum("jik,jk->ji", E_tT, axes, precision=_HI)
        r1 = r_loc[:, model.j1_links] + \
            ax_par * (q1 * (1.0 - rev))[..., None]
        r_loc = r_loc.at[:, model.j1_links].set(r1)
    for (i, qi, vi) in model.free_list:
        R_loc = R_loc.at[:, i].set(quat_to_rot(q[:, qi + 3:qi + 7]))
        r_loc = r_loc.at[:, i].set(q[:, qi:qi + 3])

    # --- level-batched propagation (virtual world node at index nb). ---- #
    R_w = jnp.zeros((n, nb + 1, 3, 3)).at[:, nb].set(jnp.eye(3))
    p_w = jnp.zeros((n, nb + 1, 3))
    par = model.parent_pad
    for lvl in model.levels:
        Rp = R_w[:, par[lvl]]                                  # (n, l, 3, 3)
        pp = p_w[:, par[lvl]]
        R_w = R_w.at[:, lvl].set(
            jnp.matmul(Rp, R_loc[:, lvl], precision=_HI))
        p_w = p_w.at[:, lvl].set(
            pp + jnp.einsum("nlij,nlj->nli", Rp, r_loc[:, lvl],
                            precision=_HI))
    R_w, p_w = R_w[:, :nb], p_w[:, :nb]

    # --- world-Plücker dof subspaces about o = first root position. ----- #
    o = p_w[:, 0]
    rel = p_w - o[:, None]                                     # (n, nb, 3)
    S_o = jnp.zeros((n, nv, 6))
    if model.j1_links.size:
        aw = jnp.einsum("njik,jk->nji", R_w[:, model.j1_links],
                        jnp.asarray(model.j1_axis), precision=_HI)
        mom = jnp.cross(rel[:, model.j1_links], aw)
        rev = jnp.asarray(model.j1_rev)[:, None]
        # revolute: [a; (p-o) x a]; prismatic: [0; a].
        S_o = S_o.at[:, model.j1_v].set(
            jnp.concatenate([aw * rev, mom * rev + aw * (1.0 - rev)], -1))
    for (i, qi, vi) in model.free_list:
        # Body-coordinate basis mapped to Plücker-about-o: angular dof k is
        # [R e_k; (p-o) x R e_k], linear dof k is [0; R e_k].
        RT = jnp.swapaxes(R_w[:, i], -1, -2)                   # rows: e_k
        momf = jnp.cross(rel[:, i][:, None, :], RT)
        S_o = S_o.at[:, vi:vi + 3].set(jnp.concatenate([RT, momf], -1))
        S_o = S_o.at[:, vi + 3:vi + 6].set(
            jnp.concatenate([jnp.zeros_like(RT), RT], -1))

    # --- link velocities: V_b = sum_m anc[b, m] S_o[m] v[m]. ------------ #
    anc = jnp.asarray(model.anc_dof)                           # (nb, nv)
    Sv_o = S_o * v_dof[..., None]
    V_o = jnp.matmul(anc, Sv_o, precision=_HI)                 # (n, nb, 6)

    # Body-frame [w; vl] at each link origin for contacts/tasks.
    w_w = V_o[..., :3]
    v_pt = V_o[..., 3:] + jnp.cross(w_w, rel)
    w_b = jnp.einsum("nbij,nbi->nbj", R_w, w_w, precision=_HI)
    vl_b = jnp.einsum("nbij,nbi->nbj", R_w, v_pt, precision=_HI)
    v_body = jnp.concatenate([w_b, vl_b], -1)
    return Kinematics(R_w=R_w, p_w=p_w, v=v_body, S_o=S_o, Sv_o=Sv_o,
                      V_o=V_o, o=o)


def _link_inertias(model: ArticulatedModel, params: DynParams):
    """(..., nb, 6, 6) body-frame spatial inertias at the link origins from
    per-env mass/com/inertia (COM offsets and inertias scale with the
    geometry scale)."""
    s = params.scale[..., None, None]
    com = params.com * s                                       # (.., nb, 3)
    diag = params.inertia * s ** 2
    I_com = jnp.eye(3) * diag[..., None, :]  # wrong axis placement? no:
    # eye[i, j] * diag[..., j] puts diag[j] at (j, j) and 0 elsewhere.
    c = _hat_batch(com)
    m = params.mass[..., None, None]
    tl = I_com + m * jnp.matmul(c, jnp.swapaxes(c, -1, -2), precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3), c.shape)
    top = jnp.concatenate([tl, m * c], -1)
    bot = jnp.concatenate([m * jnp.swapaxes(c, -1, -2), m * eye], -1)
    return jnp.concatenate([top, bot], -2)


def _inertia_to_plucker(kin: Kinematics, I_sp):
    """Re-expresses body-frame spatial inertias (at link origins) in the
    shared world-Plücker frame about o: I_o = X^{-T} I X^{-1} with
    X = [[R, 0], [hat(p-o) R, R]] the body->Plücker motion transform."""
    RT = jnp.swapaxes(kin.R_w, -1, -2)
    rel_hat = _hat_batch(kin.p_w - kin.o[..., None, :])
    Z = jnp.zeros_like(RT)
    # X^{-1} = [[R^T, 0], [-R^T hat(rel), R^T]]
    Xi = jnp.concatenate([
        jnp.concatenate([RT, Z], -1),
        jnp.concatenate([-jnp.matmul(RT, rel_hat, precision=_HI), RT],
                        -1)], -2)
    IXi = jnp.matmul(I_sp, Xi, precision=_HI)
    return jnp.matmul(jnp.swapaxes(Xi, -1, -2), IXi, precision=_HI)


def _bias_from_plucker(model: ArticulatedModel, kin: Kinematics, I_o,
                       params: DynParams, f_ext_world=None):
    """RNEA with qdd = 0 in batched world-Plücker form: the bias
    acceleration of body b is sum_m anc[b, m] (V_{link(m)} x S_m v_m) —
    every joint subspace is constant in its child's frame, so
    S_dot = V_child x S uniformly — each body contributes
    f_b = I a_b + V x* (I V) - f_ext, and C[m] = S_m . sum_b anc[b, m] f_b.
    """
    anc = jnp.asarray(model.anc_dof)                           # (nb, nv)
    Vd = kin.V_o[..., jnp.asarray(model.dof_link), :]          # (.., nv, 6)
    Sv = kin.Sv_o
    dSa = jnp.cross(Vd[..., :3], Sv[..., :3])
    dSl = jnp.cross(Vd[..., :3], Sv[..., 3:]) + \
        jnp.cross(Vd[..., 3:], Sv[..., :3])
    Sdot_v = jnp.concatenate([dSa, dSl], -1)                   # (.., nv, 6)
    a_grav = jnp.concatenate(
        [jnp.zeros_like(params.gravity), -params.gravity], -1)
    a = jnp.matmul(anc, Sdot_v, precision=_HI) + a_grav[..., None, :]
    IV = jnp.matmul(I_o, kin.V_o[..., None], precision=_HI)[..., 0]
    Ia = jnp.matmul(I_o, a[..., None], precision=_HI)[..., 0]
    w, vl = kin.V_o[..., :3], kin.V_o[..., 3:]
    vxf = jnp.concatenate([jnp.cross(w, IV[..., :3]) +
                           jnp.cross(vl, IV[..., 3:]),
                           jnp.cross(w, IV[..., 3:])], -1)
    f = Ia + vxf                                               # (.., nb, 6)
    if f_ext_world is not None:
        rel = kin.p_w - kin.o[..., None, :]
        n_o = f_ext_world[..., :3] + jnp.cross(rel, f_ext_world[..., 3:])
        f = f - jnp.concatenate([n_o, f_ext_world[..., 3:]], -1)
    return jnp.sum(jnp.matmul(anc.T, f, precision=_HI) * kin.S_o, -1)


def _mass_factors_plucker(model: ArticulatedModel, kin: Kinematics, I_o):
    """CRBA left factor: F[m] = IC_dof[m] S_m where IC_dof[m] =
    sum_b anc[b, m] I_o[b] is the composite inertia of dof m's subtree."""
    anc = jnp.asarray(model.anc_dof)                           # (nb, nv)
    IC = jnp.einsum("bm,...bkl->...mkl", anc, I_o, precision=_HI)
    return jnp.matmul(IC, kin.S_o[..., None], precision=_HI)[..., 0]


def _mass_from_plucker(model: ArticulatedModel, kin: Kinematics, I_o):
    """CRBA in batched world-Plücker form:
    M[m, n] = S_m^T IC_{deeper(m, n)} S_n on ancestor-related pairs
    (static mask), then symmetrized."""
    F = _mass_factors_plucker(model, kin, I_o)
    Mraw = jnp.matmul(F, jnp.swapaxes(kin.S_o, -1, -2), precision=_HI)
    Ml = Mraw * jnp.asarray(model.crba_mask)
    diag = Ml * jnp.eye(model.nv)
    return Ml + jnp.swapaxes(Ml, -1, -2) - diag


def bias_forces(model: ArticulatedModel, kin: Kinematics, I_sp,
                params: DynParams, f_ext_world=None):
    """RNEA with qdd = 0: C(q, v) - tau_ext, including gravity (as a base
    acceleration) and optional world-frame external forces per link
    ((.., nb, 6) [torque; force] about each link origin)."""
    return _bias_from_plucker(model, kin, _inertia_to_plucker(kin, I_sp),
                              params, f_ext_world)


def mass_matrix(model: ArticulatedModel, kin: Kinematics, I_sp):
    """CRBA composite-rigid-body mass matrix (.., nv, nv)."""
    return _mass_from_plucker(model, kin, _inertia_to_plucker(kin, I_sp))


def joint_passive_torque(model: ArticulatedModel, params: DynParams, q_dof,
                         v_dof):
    """Parallel joint springs toward 0, viscous damping handled implicitly
    elsewhere, and smooth dry friction."""
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
                     kin: Optional[Kinematics] = None):
    """qdd = (M + diag(armature) + dt*diag(damping))^-1 (tau - C - d v).

    Viscous joint damping is integrated implicitly (see module docstring):
    the damping torque at the NEW velocity is -d (v + dt qdd), which moves
    ``dt*d`` onto the LHS and ``-d v`` into the RHS. Pass a precomputed
    ``kin`` (e.g. the one used for contact forces) to skip recomputing FK.
    """
    if q.ndim == 1:
        qdd, kin1 = forward_dynamics(
            model, q[None], v[None], tau[None], _promote(params),
            None if f_ext_world is None else f_ext_world[None], dt,
            None if kin is None else _promote(kin))
        return qdd[0], _squeeze0(kin1)
    if kin is None:
        kin = forward_kinematics(model, q, v, params)
    I_o = _inertia_to_plucker(kin, _link_inertias(model, params))
    C = _bias_from_plucker(model, kin, I_o, params, f_ext_world)
    q_dof = dof_positions(model, q)
    rhs = tau + joint_passive_torque(model, params, q_dof, v) - C \
        - params.damping * v
    # Assemble the LHS directly in the solver's lanes layout (nv, nv, N):
    # the env axis goes to the vector lanes and never transposes back in
    # (ops/spd_kernel.py docstring has the measurements).
    F = _mass_factors_plucker(model, kin, I_o)
    eye_l = jnp.eye(model.nv)[:, :, None]
    Ml = jnp.einsum("nmk,nlk->mln", F, kin.S_o, precision=_HI) \
        * jnp.asarray(model.crba_mask)[:, :, None]
    M_l = Ml + jnp.transpose(Ml, (1, 0, 2)) - Ml * eye_l
    diag_extra = params.armature + 1e-6
    if dt is not None:
        diag_extra = diag_extra + dt * params.damping
    lhs_l = M_l + eye_l * diag_extra.T[None, :, :]
    qdd = spd_solve_lanes(lhs_l, rhs.T).T
    return qdd, kin


# Rigid-body velocity caps (PhysX defaults the reference's engine runs
# with: maxLinearVelocity 1e2-class, maxAngularVelocity 64 rad/s).
MAX_LIN_VEL = 100.0
MAX_ANG_VEL = 64.0


def _clamp_norm(vec, vmax):
    """Rescales ``vec`` so its norm is at most ``vmax`` (direction kept)."""
    nrm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
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
    v_new = v + dt * qdd
    q_new = q
    if model.j1_links.size:
        maxv = jnp.asarray(model.j1_maxv)
        v1 = jnp.clip(v_new[..., model.j1_v], -maxv, maxv)
        v_new = v_new.at[..., model.j1_v].set(v1)
        q_new = q_new.at[..., model.j1_q].set(q[..., model.j1_q] + dt * v1)
    for (i, qi, vi) in model.free_list:
        w_body = v[..., vi:vi + 3]
        vl_body = v[..., vi + 3:vi + 6]
        quat = q[..., qi + 3:qi + 7]
        R = quat_to_rot(quat)

        def rot(Rm, x):
            return jnp.matmul(Rm, x[..., None], precision=_HI)[..., 0]
        # Classical (world-frame) accelerations of the link origin: the
        # spatial qdd is the body-coords derivative of v, so add back the
        # transport terms before rotating to world.
        aw_lin = rot(R, qdd[..., vi + 3:vi + 6] +
                     jnp.cross(w_body, vl_body))
        aw_ang = rot(R, qdd[..., vi:vi + 3])
        vw = _clamp_norm(rot(R, vl_body) + dt * aw_lin, MAX_LIN_VEL)
        ww = _clamp_norm(rot(R, w_body) + dt * aw_ang, MAX_ANG_VEL)
        pos = q[..., qi:qi + 3] + dt * vw
        quat_n = quat_integrate(quat, ww, dt)
        R_nT = jnp.swapaxes(quat_to_rot(quat_n), -1, -2)
        q_new = q_new.at[..., qi:qi + 3].set(pos)
        q_new = q_new.at[..., qi + 3:qi + 7].set(quat_n)
        v_new = v_new.at[..., vi:vi + 3].set(rot(R_nT, ww))
        v_new = v_new.at[..., vi + 3:vi + 6].set(rot(R_nT, vw))
    return q_new, v_new


def clamp_limits(model: ArticulatedModel, q, v, stiffness=200.0):
    """Hard-clamps 1-dof joints to their limits, zeroing inward velocity."""
    if not model.j1_links.size:
        return q, v
    lo, hi = jnp.asarray(model.j1_lo), jnp.asarray(model.j1_hi)
    q1 = q[..., model.j1_q]
    v1 = v[..., model.j1_v]
    v1n = jnp.where(q1 < lo, jnp.maximum(v1, 0.0),
                    jnp.where(q1 > hi, jnp.minimum(v1, 0.0), v1))
    q = q.at[..., model.j1_q].set(jnp.clip(q1, lo, hi))
    v = v.at[..., model.j1_v].set(v1n)
    return q, v
