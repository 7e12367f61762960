"""Penalty-based contacts against the ground plane (z = 0).

The reference's contact dynamics live inside PhysX; for the locomotion and
manipulation tasks here we use MJX-style soft contacts: contact points are
derived from per-link geoms (spheres, capsule endpoints, box corners), and
each penetrating point contributes a normal spring-damper force plus a
smooth Coulomb-capped tangential friction force. Forces are accumulated as
world-frame spatial forces about each link origin and fed to RNEA as
external forces.

Pure functions of (kinematics, params), batched over the leading env axis
like the rest of the engine (single-env inputs also work — everything uses
ellipsis dims); fully vectorized over contact points; differentiable. The
per-point wrench accumulation is a static one-hot (nb, P) matmul rather
than a scatter, which keeps it on the MXU and out of scatter lowering.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax.numpy as jnp

from .model import ArticulatedModel, DynParams


def contact_points(model: ArticulatedModel) -> Tuple[np.ndarray, np.ndarray,
                                                     np.ndarray]:
    """Static contact-point table: (link_idx (P,), offsets (P, 3),
    radii (P,), geom_idx (P,)). Boxes contribute 4 bottom + 4 top corners;
    capsules their two endpoint spheres."""
    links, offsets, radii, geom_ids = [], [], [], []
    for g_idx, g in enumerate(model.geoms):
        off = np.asarray(g.offset, np.float64)
        if g.kind == "sphere":
            links.append(g.link)
            offsets.append(off)
            radii.append(g.size[0])
            geom_ids.append(g_idx)
        elif g.kind == "point":
            links.append(g.link)
            offsets.append(off)
            radii.append(0.0)
            geom_ids.append(g_idx)
        elif g.kind == "capsule":
            r, hl = g.size
            ax = np.asarray(g.axis, np.float64)
            ax = ax / np.linalg.norm(ax)
            for s in (-1.0, 1.0):
                links.append(g.link)
                offsets.append(off + s * hl * ax)
                radii.append(r)
                geom_ids.append(g_idx)
        elif g.kind == "box":
            hx, hy, hz = g.size
            for sx in (-1.0, 1.0):
                for sy in (-1.0, 1.0):
                    for sz in (-1.0, 1.0):
                        links.append(g.link)
                        offsets.append(off + np.array(
                            [sx * hx, sy * hy, sz * hz]))
                        radii.append(0.0)
                        geom_ids.append(g_idx)
        else:
            raise ValueError(f"Unknown geom kind {g.kind}")
    if not links:
        return (np.zeros(0, np.int32), np.zeros((0, 3)), np.zeros(0),
                np.zeros(0, np.int32))
    return (np.asarray(links, np.int32), np.asarray(offsets),
            np.asarray(radii), np.asarray(geom_ids, np.int32))


def _point_scatter(model: ArticulatedModel, links) -> np.ndarray:
    """(nb, P) one-hot accumulation matrix: wrench sums become a matmul."""
    mat = np.zeros((model.nb, len(links)), np.float32)
    mat[links, np.arange(len(links))] = 1.0
    return mat


def sphere_plane_pair_forces(model: ArticulatedModel, kin,
                             params: DynParams, sphere_link: int,
                             sphere_offset, radius: float,
                             plane_link: int, plane_point, plane_normal,
                             mu: float = 1.0, dt=1.0 / 60.0, tau=0.02,
                             zeta=1.0, plane_halfsize=None):
    """Contact between a sphere on one body and a plane patch attached to
    another body (e.g. a ball on a tilting tray). Same mass-adaptive
    penalty model as the ground contacts; equal and opposite world-frame
    spatial forces are returned as a (..., nb, 6) array.

    ``plane_point``/``plane_normal`` are in the plane body's frame;
    ``plane_halfsize`` optionally deactivates the contact when the sphere
    center leaves a square patch of that half-extent around plane_point.
    """
    scale = params.scale[..., None]
    sphere_offset = jnp.asarray(sphere_offset, jnp.float32) * scale
    plane_point = jnp.asarray(plane_point, jnp.float32) * scale
    plane_normal = jnp.asarray(plane_normal, jnp.float32)

    def mv(R, x):
        return jnp.einsum("...ij,...j->...i", R, x)

    R_s, p_s = kin.R_w[..., sphere_link, :, :], kin.p_w[..., sphere_link, :]
    R_p, p_p = kin.R_w[..., plane_link, :, :], kin.p_w[..., plane_link, :]
    center = p_s + mv(R_s, sphere_offset)
    n_w = mv(R_p, jnp.broadcast_to(plane_normal, center.shape))
    pp_w = p_p + mv(R_p, plane_point)
    dist = jnp.sum((center - pp_w) * n_w, -1)
    r_scaled = radius * params.scale
    depth = r_scaled - dist
    contact_pt = center - n_w * r_scaled[..., None]

    def point_vel(link, pt):
        R = kin.R_w[..., link, :, :]
        w = mv(R, kin.v[..., link, :3])
        vl = mv(R, kin.v[..., link, 3:])
        return vl + jnp.cross(w, pt - kin.p_w[..., link, :])

    v_rel = point_vel(sphere_link, contact_pt) - point_vel(plane_link,
                                                           contact_pt)
    v_n = jnp.sum(v_rel * n_w, -1)
    m_s = params.mass[..., sphere_link]
    m_p = params.mass[..., plane_link]
    m_eff = 1.0 / (1.0 / m_s + 1.0 / jnp.maximum(m_p, 1e-6))
    f_n_mag = m_eff * (depth / tau ** 2 + 2.0 * zeta * (-v_n) / tau)
    active = depth > 0
    if plane_halfsize is not None:
        local = jnp.abs(mv(jnp.swapaxes(R_p, -1, -2), center - pp_w))
        active = active & (local[..., 0] < plane_halfsize) & \
            (local[..., 1] < plane_halfsize)
    f_n_mag = jnp.where(active, jnp.maximum(f_n_mag, 0.0), 0.0)
    v_t = v_rel - v_n[..., None] * n_w
    v_t_norm = jnp.linalg.norm(v_t, axis=-1) + 1e-8
    i_mean = jnp.mean(params.inertia[..., sphere_link, :], -1) + 1e-8
    m_eff_t = 1.0 / (1.0 / m_s + r_scaled ** 2 / i_mean)
    cap = jnp.minimum(mu * f_n_mag, m_eff_t * v_t_norm / dt)
    f_t = -v_t / v_t_norm[..., None] * cap[..., None]
    force = n_w * f_n_mag[..., None] + f_t  # on the sphere body
    f_ext = jnp.zeros(kin.p_w.shape[:-1] + (6,))
    arm_s = contact_pt - p_s
    f_ext = f_ext.at[..., sphere_link, :3].add(jnp.cross(arm_s, force))
    f_ext = f_ext.at[..., sphere_link, 3:].add(force)
    arm_p = contact_pt - p_p
    f_ext = f_ext.at[..., plane_link, :3].add(jnp.cross(arm_p, -force))
    f_ext = f_ext.at[..., plane_link, 3:].add(-force)
    return f_ext


def ground_contact_forces(model: ArticulatedModel, kin, params: DynParams,
                          dt=1.0 / 60.0, tau=0.02, zeta=1.0):
    """World-frame external spatial forces (..., nb, 6) from plane contacts.

    Mass-adaptive penalty model (stable under the DR configs' 100x mass
    randomization, where fixed spring constants would blow up light links):

      normal:     f_n = m_eff (depth / tau^2 + 2 zeta depth_dot / tau),
                  clamped >= 0 — a critically damped spring whose rest
                  penetration g*tau^2 is mass-independent;
      tangential: Coulomb cone mu*f_n, additionally capped by the
                  slip-stopping impulse m_eff_t |v_t| / dt so one step can
                  null the slip but never reverse it (no kt-gain
                  oscillation; sticking contacts roll cleanly).

    Smooth in all inputs; differentiable.
    """
    links, offsets, radii, geom_ids = contact_points(model)
    if links.shape[0] == 0:
        return jnp.zeros(kin.p_w.shape[:-1] + (6,))
    scale = params.scale[..., None, None]
    offsets_j = jnp.asarray(offsets, jnp.float32) * scale  # (.., P, 3)
    radii_j = jnp.asarray(radii, jnp.float32) * params.scale[..., None]
    mu = params.contact_friction[..., jnp.asarray(geom_ids)]

    R = jnp.take(kin.R_w, jnp.asarray(links), axis=-3)     # (.., P, 3, 3)
    p0 = jnp.take(kin.p_w, jnp.asarray(links), axis=-2)    # (.., P, 3)
    v_link = jnp.take(kin.v, jnp.asarray(links), axis=-2)  # (.., P, 6)
    centers = p0 + jnp.einsum("...pij,...pj->...pi", R, offsets_j)
    # Forces act at the sphere surface touching the plane, not the center —
    # the lever arm below the COM is what converts sliding into rolling.
    pts = centers.at[..., 2].add(-radii_j)
    # Point velocity: v_link is [w; vl] in body coords at link origin.
    w_world = jnp.einsum("...pij,...pj->...pi", R, v_link[..., :3])
    v_world = jnp.einsum("...pij,...pj->...pi", R, v_link[..., 3:])
    arm = pts - p0
    v_pt = v_world + jnp.cross(w_world, arm)

    # Per-point effective masses (link-local approximation).
    m_link = params.mass[..., jnp.asarray(links)]
    i_mean = jnp.mean(
        jnp.take(params.inertia, jnp.asarray(links), axis=-2)
        * params.scale[..., None, None] ** 2, -1)
    arm_sq = jnp.sum(arm * arm, -1)
    m_eff_n = m_link
    m_eff_t = 1.0 / (1.0 / m_link + arm_sq / (i_mean + 1e-8))

    depth = radii_j - centers[..., 2]
    depth_dot = -v_pt[..., 2]
    f_n = m_eff_n * (depth / tau ** 2 + 2.0 * zeta * depth_dot / tau)
    f_n = jnp.where(depth > 0, jnp.maximum(f_n, 0.0), 0.0)
    v_t = v_pt.at[..., 2].set(0.0)
    v_t_norm = jnp.linalg.norm(v_t, axis=-1) + 1e-8
    cap = jnp.minimum(mu * f_n, m_eff_t * v_t_norm / dt)
    f_t = -v_t / v_t_norm[..., None] * cap[..., None]
    force = f_t.at[..., 2].set(f_n)       # (.., P, 3) world force at pts
    torque = jnp.cross(arm, force)        # about link origin, world frame
    wrench = jnp.concatenate([torque, force], -1)          # (.., P, 6)
    scat = jnp.asarray(_point_scatter(model, links))       # (nb, P)
    return jnp.einsum("bp,...pk->...bk", scat, wrench)
