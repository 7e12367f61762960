"""Spatial (Plücker) vector algebra for articulated rigid-body dynamics.

This is the foundation of the from-scratch TPU physics engine that replaces
the closed-source PhysX GPU simulator behind Isaac Gym in the reference
(SURVEY.md §2.2). Conventions follow Featherstone's "Rigid Body Dynamics
Algorithms": motion vectors are [angular; linear] 6-vectors expressed in
body coordinates; a coordinate transform ``X = (E, r)`` maps vectors from
frame A to frame B where ``E`` rotates A-coordinates into B-coordinates and
``r`` is the position of B's origin expressed in A.

All functions are single-env, pure jnp, and meant to be composed under
``vmap`` over the env axis; topology loops are unrolled at trace time (the
largest model here has ~25 links), letting XLA fuse the whole step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hat(v):
    """3-vector -> skew-symmetric matrix (cross-product operator)."""
    x, y, z = v[0], v[1], v[2]
    zero = jnp.zeros_like(x)
    return jnp.array([[zero, -z, y], [z, zero, -x], [-y, x, zero]])


# ----------------------------------------------------------------------- #
# Quaternions (w, x, y, z)
# ----------------------------------------------------------------------- #
def quat_to_rot(q):
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3) (maps body
    coords to world). Works on single quaternions and batches alike."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ]
    return jnp.stack(rows, -2)


def rot_to_quat(R):
    """Rotation matrix (3, 3, ...) -> unit quaternion (4, ...) in
    (w, x, y, z), leading-axes layout (the env-last Kinematics
    convention: pass kin.R_w[link] of shape (3, 3, N) and get (4, N)).
    Branchless max-pivot Shepperd construction — all four pivot
    candidates are computed and the numerically largest is selected
    per element, so it vectorizes with no data-dependent control flow
    (fingertip-orientation observations, ShadowHand full_state)."""
    r00, r01, r02 = R[0, 0], R[0, 1], R[0, 2]
    r10, r11, r12 = R[1, 0], R[1, 1], R[1, 2]
    r20, r21, r22 = R[2, 0], R[2, 1], R[2, 2]
    qw2 = jnp.maximum(1.0 + r00 + r11 + r22, 0.0)
    qx2 = jnp.maximum(1.0 + r00 - r11 - r22, 0.0)
    qy2 = jnp.maximum(1.0 - r00 + r11 - r22, 0.0)
    qz2 = jnp.maximum(1.0 - r00 - r11 + r22, 0.0)
    cand = jnp.stack([
        jnp.stack([qw2, r21 - r12, r02 - r20, r10 - r01]),
        jnp.stack([r21 - r12, qx2, r01 + r10, r02 + r20]),
        jnp.stack([r02 - r20, r01 + r10, qy2, r12 + r21]),
        jnp.stack([r10 - r01, r02 + r20, r12 + r21, qz2]),
    ])                                                    # (4, 4, ...)
    mags = jnp.stack([qw2, qx2, qy2, qz2])                # (4, ...)
    pick = jax.nn.one_hot(jnp.argmax(mags, 0), 4, axis=0,
                          dtype=R.dtype)                  # (4, ...)
    q = jnp.sum(cand * pick[:, None], 0)                  # (4, ...)
    q = q / (jnp.sqrt(jnp.sum(q * q, 0, keepdims=True)) + 1e-12)
    return jnp.where(q[0] < 0, -q, q)                     # canonical w>=0


def quat_mul(a, b):
    """Hamilton product; broadcasts over leading dims of (..., 4) inputs."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


def quat_integrate(q, omega_world, dt):
    """Integrates a unit quaternion by a world-frame angular velocity."""
    omega4 = jnp.concatenate(
        [jnp.zeros_like(omega_world[..., :1]), omega_world], -1)
    dq = 0.5 * quat_mul(omega4, q)
    q = q + dt * dq
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)


def quat_rotate(q, v):
    return quat_to_rot(q) @ v


def quat_rotate_inv(q, v):
    return quat_to_rot(q).T @ v


def quat_from_axis_angle(axis, angle):
    half = 0.5 * angle
    return jnp.concatenate([jnp.cos(half)[None],
                            jnp.sin(half) * axis])


# ----------------------------------------------------------------------- #
# Spatial transforms: represented as (E, r) pairs.
# ----------------------------------------------------------------------- #
def xform_motion(E, r, v):
    """Applies X = (E, r) to a motion vector [w; vl]."""
    w, vl = v[:3], v[3:]
    return jnp.concatenate([E @ w, E @ (vl - jnp.cross(r, w))])


def xform_force(E, r, f):
    """Applies the force transform X* to a force vector [n; f]."""
    n, fl = f[:3], f[3:]
    return jnp.concatenate([E @ (n - jnp.cross(r, fl)), E @ fl])


def inv_xform_motion(E, r, v):
    """Applies X^{-1} to a motion vector."""
    w, vl = v[:3], v[3:]
    w_p = E.T @ w
    return jnp.concatenate([w_p, E.T @ vl + jnp.cross(r, w_p)])


def inv_xform_force(E, r, f):
    """Applies (X*)^{-1}: brings a force from child coords back to parent."""
    n, fl = f[:3], f[3:]
    fl_p = E.T @ fl
    return jnp.concatenate([E.T @ n + jnp.cross(r, fl_p), fl_p])


def xform_compose(E1, r1, E2, r2):
    """(E2, r2) after (E1, r1): first A->B via 1, then B->C via 2; returns
    the A->C transform."""
    return E2 @ E1, r1 + E1.T @ r2


# ----------------------------------------------------------------------- #
# Spatial cross products and inertia.
# ----------------------------------------------------------------------- #
def crm(v, m):
    """Motion-cross-motion: v x m."""
    w, vl = v[:3], v[3:]
    mw, ml = m[:3], m[3:]
    return jnp.concatenate([jnp.cross(w, mw),
                            jnp.cross(w, ml) + jnp.cross(vl, mw)])


def crf(v, f):
    """Motion-cross-force: v x* f."""
    w, vl = v[:3], v[3:]
    n, fl = f[:3], f[3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(vl, fl),
                            jnp.cross(w, fl)])


def spatial_inertia(mass, com, inertia_com):
    """6x6 spatial inertia of a body about its frame origin, given mass,
    COM offset (3,) and rotational inertia about the COM (3,3)."""
    c = hat(com)
    eye = jnp.eye(3)
    top_left = inertia_com + mass * c @ c.T
    return jnp.block([[top_left, mass * c],
                      [mass * c.T, mass * eye]])


def mul_inertia(I, v):
    return I @ v
