"""Forward dynamics for articulated trees: FK, RNEA bias, CRBA mass matrix,
dense SPD solve, semi-implicit integration.

Replaces the PhysX reduced-coordinate articulation solver the reference
drives through Isaac Gym (SURVEY.md §2.2). Design choices for TPU:

  * static topology loops are unrolled at trace time (<= ~25 links), so
    one env's step is a fully fused XLA computation; envs batch via vmap;
  * the mass matrix is built with CRBA and solved densely with Cholesky —
    for nv <= ~30 a batched dense solve beats sparse factorization on the
    MXU and is simple to differentiate through;
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

from .model import ArticulatedModel, DynParams, JOINT_DOF
from .spatial import (
    hat, quat_to_rot, quat_integrate, spatial_inertia,
)


def _rot_axis(axis, angle):
    """Rotation matrix about a fixed unit axis (Rodrigues)."""
    a = jnp.asarray(axis)
    K = hat(a)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def _motion_matrix(E, r):
    """6x6 spatial motion transform for X = (E, r)."""
    Z = jnp.zeros((3, 3))
    return jnp.block([[E, Z], [-E @ hat(r), E]])


class Kinematics(NamedTuple):
    X_up: jnp.ndarray     # (nb, 6, 6) parent->link motion transforms
    S: jnp.ndarray        # (nb, 6, 6) motion subspaces (cols used: dof)
    R_w: jnp.ndarray      # (nb, 3, 3) link->world rotations
    p_w: jnp.ndarray      # (nb, 3) link origins in world
    v: jnp.ndarray        # (nb, 6) link spatial velocities (body coords)


def forward_kinematics(model: ArticulatedModel, q, v_dof,
                       params: DynParams) -> Kinematics:
    """Computes per-link transforms, world poses and spatial velocities.

    Link translations scale with ``params.scale`` (uniform geometry scale —
    the 'scale' DR operation changes limb lengths, not just collision
    radii)."""
    X_up, S_list, R_list, p_list, v_list = [], [], [], [], []
    for i in range(model.nb):
        jt = model.joint_types[i]
        qi = model.q_off[i]
        vi = model.v_off[i]
        E_t = jnp.asarray(model.joint_rot[i], jnp.float32)
        r_t = jnp.asarray(model.joint_pos[i], jnp.float32) * params.scale
        axis = jnp.asarray(model.joint_axis[i], jnp.float32)
        if jt == "free":
            pos = q[qi:qi + 3]
            quat = q[qi + 3:qi + 7]
            E = quat_to_rot(quat).T  # world -> body
            r = pos
            S = jnp.eye(6)
            vj = v_dof[vi:vi + 6]
        elif jt == "revolute":
            E = _rot_axis(axis, q[qi]).T @ E_t
            r = r_t
            S = jnp.zeros((6, 6)).at[:3, 0].set(axis)
            vj = S[:, 0] * v_dof[vi]
        elif jt == "prismatic":
            E = E_t
            r = r_t + E_t.T @ (axis * q[qi])
            S = jnp.zeros((6, 6)).at[3:, 0].set(axis)
            vj = S[:, 0] * v_dof[vi]
        else:  # fixed
            E, r = E_t, r_t
            S = jnp.zeros((6, 6))
            vj = jnp.zeros(6)
        X = _motion_matrix(E, r)
        p = model.parent[i]
        if p < 0:
            R_w = E.T
            p_w = r if jt == "free" else r
            v_link = vj
        else:
            R_w = R_list[p] @ E.T
            p_w = p_list[p] + R_list[p] @ r
            v_link = X @ v_list[p] + vj
        X_up.append(X)
        S_list.append(S)
        R_list.append(R_w)
        p_list.append(p_w)
        v_list.append(v_link)
    return Kinematics(X_up=jnp.stack(X_up), S=jnp.stack(S_list),
                      R_w=jnp.stack(R_list), p_w=jnp.stack(p_list),
                      v=jnp.stack(v_list))


def _link_inertias(model: ArticulatedModel, params: DynParams):
    """(nb, 6, 6) spatial inertias from per-env mass/com/inertia (COM
    offsets and inertias scale with the geometry scale)."""
    out = []
    s = params.scale
    for i in range(model.nb):
        I_com = jnp.diag(params.inertia[i] * s ** 2)
        out.append(spatial_inertia(params.mass[i], params.com[i] * s,
                                   I_com))
    return jnp.stack(out)


def bias_forces(model: ArticulatedModel, kin: Kinematics, I_sp,
                params: DynParams, f_ext_world=None):
    """RNEA with qdd = 0: C(q, v) - tau_ext, including gravity (as a base
    acceleration) and optional world-frame external forces per link
    ((nb, 6) [torque; force] about each link origin)."""
    nb = model.nb
    g = params.gravity
    a0 = jnp.concatenate([jnp.zeros(3), -g])  # world-frame base accel
    a_list, f_list = [], []
    for i in range(nb):
        p = model.parent[i]
        if p < 0:
            # World base acceleration into link coords; the angular part is
            # zero so the position offset contributes nothing.
            E_wi = kin.R_w[i].T
            a_par = jnp.concatenate([E_wi @ a0[:3], E_wi @ a0[3:]])
            v_par = jnp.zeros(6)
        else:
            a_par = kin.X_up[i] @ a_list[p]
            v_par = kin.v[p]
        # velocity-product term: crm(v_i) * v_joint
        v_joint = kin.v[i] - kin.X_up[i] @ v_par
        w, vl = kin.v[i][:3], kin.v[i][3:]
        mw, ml = v_joint[:3], v_joint[3:]
        cross = jnp.concatenate([jnp.cross(w, mw),
                                 jnp.cross(w, ml) + jnp.cross(vl, mw)])
        a_i = a_par + cross
        a_list.append(a_i)
        # f = I a + v x* (I v) - f_ext(body coords)
        Iv = I_sp[i] @ kin.v[i]
        n, fl = Iv[:3], Iv[3:]
        vxf = jnp.concatenate([jnp.cross(w, n) + jnp.cross(vl, fl),
                               jnp.cross(w, fl)])
        f_i = I_sp[i] @ a_i + vxf
        if f_ext_world is not None:
            # world [torque; force] about link origin -> body coords
            tw, fw = f_ext_world[i][:3], f_ext_world[i][3:]
            f_body = jnp.concatenate([kin.R_w[i].T @ tw,
                                      kin.R_w[i].T @ fw])
            f_i = f_i - f_body
        f_list.append(f_i)
    # Backward pass: accumulate into parents, project onto joint subspaces.
    C = jnp.zeros(model.nv)
    f_acc = list(f_list)
    for i in reversed(range(nb)):
        vi = model.v_off[i]
        nd = JOINT_DOF[model.joint_types[i]]
        if nd == 6:
            C = C.at[vi:vi + 6].set(f_acc[i])
        elif nd == 1:
            C = C.at[vi].set(kin.S[i][:, 0] @ f_acc[i])
        p = model.parent[i]
        if p >= 0:
            f_acc[p] = f_acc[p] + kin.X_up[i].T @ f_acc[i]
    return C


def mass_matrix(model: ArticulatedModel, kin: Kinematics, I_sp):
    """CRBA composite-rigid-body mass matrix (nv, nv)."""
    nb, nv = model.nb, model.nv
    Ic = [I_sp[i] for i in range(nb)]
    M = jnp.zeros((nv, nv))
    for i in reversed(range(nb)):
        p = model.parent[i]
        if p >= 0:
            Ic[p] = Ic[p] + kin.X_up[i].T @ Ic[i] @ kin.X_up[i]
        nd = JOINT_DOF[model.joint_types[i]]
        if nd == 0:
            continue
        vi = model.v_off[i]
        S_i = kin.S[i][:, :nd]                  # (6, nd)
        F = Ic[i] @ S_i                          # (6, nd)
        # All indices are static python ints: plain .at[] slices compile to
        # static updates.
        M = M.at[vi:vi + nd, vi:vi + nd].set(S_i.T @ F)
        j = i
        F_j = F
        while model.parent[j] >= 0:
            F_j = kin.X_up[j].T @ F_j
            j = model.parent[j]
            ndj = JOINT_DOF[model.joint_types[j]]
            if ndj == 0:
                continue
            vj = model.v_off[j]
            S_j = kin.S[j][:, :ndj]
            blk = F_j.T @ S_j                    # (nd, ndj)
            M = M.at[vi:vi + nd, vj:vj + ndj].set(blk)
            M = M.at[vj:vj + ndj, vi:vi + nd].set(blk.T)
    return M


def joint_passive_torque(model: ArticulatedModel, params: DynParams, q_dof,
                         v_dof):
    """Parallel joint springs toward 0, viscous damping handled implicitly
    elsewhere, and smooth dry friction."""
    tau = -params.stiffness * q_dof
    tau = tau - params.friction * jnp.tanh(v_dof / 0.05)
    return tau


def dof_positions(model: ArticulatedModel, q):
    """Extracts the 1-dof joint positions as an (nv,) vector (zeros on
    free-joint dof slots)."""
    out = jnp.zeros(model.nv)
    for i in range(model.nb):
        if JOINT_DOF[model.joint_types[i]] == 1:
            out = out.at[model.v_off[i]].set(q[model.q_off[i]])
    return out


def forward_dynamics(model: ArticulatedModel, q, v, tau,
                     params: DynParams, f_ext_world=None, dt=None):
    """qdd = (M + diag(armature) + dt*diag(damping))^-1 (tau - C - d v).

    Viscous joint damping is integrated implicitly (see module docstring):
    the damping torque at the NEW velocity is -d (v + dt qdd), which moves
    ``dt*d`` onto the LHS and ``-d v`` into the RHS.
    """
    kin = forward_kinematics(model, q, v, params)
    I_sp = _link_inertias(model, params)
    C = bias_forces(model, kin, I_sp, params, f_ext_world)
    M = mass_matrix(model, kin, I_sp)
    q_dof = dof_positions(model, q)
    rhs = tau + joint_passive_torque(model, params, q_dof, v) - C \
        - params.damping * v
    lhs = M + jnp.diag(params.armature)
    if dt is not None:
        lhs = lhs + dt * jnp.diag(params.damping)
    # SPD solve via Cholesky.
    lhs = lhs + 1e-6 * jnp.eye(model.nv)
    chol = jnp.linalg.cholesky(lhs)
    qdd = jax.scipy.linalg.cho_solve((chol, True), rhs)
    return qdd, kin


# Rigid-body velocity caps (PhysX defaults the reference's engine runs
# with: maxLinearVelocity 1e2-class, maxAngularVelocity 64 rad/s).
MAX_LIN_VEL = 100.0
MAX_ANG_VEL = 64.0


def _clamp_norm(vec, vmax):
    """Rescales ``vec`` so its norm is at most ``vmax`` (direction kept)."""
    n = jnp.linalg.norm(vec)
    return vec * (vmax / jnp.maximum(n, vmax))


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
    for i in range(model.nb):
        jt = model.joint_types[i]
        qi, vi = model.q_off[i], model.v_off[i]
        if jt == "free":
            w_body = v[vi:vi + 3]
            vl_body = v[vi + 3:vi + 6]
            quat = q[qi + 3:qi + 7]
            R = quat_to_rot(quat)
            # Classical (world-frame) accelerations of the link origin:
            # the spatial qdd is the body-coords derivative of v, so add
            # back the transport terms before rotating to world.
            aw_lin = R @ (qdd[vi + 3:vi + 6] +
                          jnp.cross(w_body, vl_body))
            aw_ang = R @ qdd[vi:vi + 3]
            vw = _clamp_norm(R @ vl_body + dt * aw_lin, MAX_LIN_VEL)
            ww = _clamp_norm(R @ w_body + dt * aw_ang, MAX_ANG_VEL)
            pos = q[qi:qi + 3] + dt * vw
            quat_n = quat_integrate(quat, ww, dt)
            R_n = quat_to_rot(quat_n)
            q_new = q_new.at[qi:qi + 3].set(pos)
            q_new = q_new.at[qi + 3:qi + 7].set(quat_n)
            v_new = v_new.at[vi:vi + 3].set(R_n.T @ ww)
            v_new = v_new.at[vi + 3:vi + 6].set(R_n.T @ vw)
        elif jt in ("revolute", "prismatic"):
            vmax = model.max_velocity[vi]
            v_new = v_new.at[vi].set(jnp.clip(v_new[vi], -vmax, vmax))
            q_new = q_new.at[qi].set(q[qi] + dt * v_new[vi])
    return q_new, v_new


def clamp_limits(model: ArticulatedModel, q, v, stiffness=200.0):
    """Hard-clamps 1-dof joints to their limits, zeroing inward velocity."""
    for i in range(model.nb):
        if JOINT_DOF[model.joint_types[i]] != 1:
            continue
        qi, vi = model.q_off[i], model.v_off[i]
        lo = model.limit_lower[model.v_off[i]]
        hi = model.limit_upper[model.v_off[i]]
        qc = jnp.clip(q[qi], lo, hi)
        hit_lo = q[qi] < lo
        hit_hi = q[qi] > hi
        v_new = jnp.where(hit_lo, jnp.maximum(v[vi], 0.0),
                          jnp.where(hit_hi, jnp.minimum(v[vi], 0.0),
                                    v[vi]))
        q = q.at[qi].set(qc)
        v = v.at[vi].set(v_new)
    return q, v
