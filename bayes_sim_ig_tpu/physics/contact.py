"""Penalty-based contacts against the ground plane (z = 0).

The reference's contact dynamics live inside PhysX; for the locomotion and
manipulation tasks here we use MJX-style soft contacts: contact points are
derived from per-link geoms (spheres, capsule endpoints, box corners), and
each penetrating point contributes a normal spring-damper force plus a
smooth Coulomb-capped tangential friction force. Forces are accumulated as
world-frame spatial forces about each link origin and fed to RNEA as
external forces.

ENV-LAST layout like the rest of the engine (dynamics.py module
docstring): all per-point tensors are (P, 3, N) with the env batch on the
vector lanes; the per-point wrench accumulation is a static one-hot
(nb, P) fold-matmul rather than a scatter. Single-env calls (squeezed
Kinematics) work too and return (nb, 6). Pure, vectorized over contact
points, differentiable.
"""

from __future__ import annotations

import os

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .model import ArticulatedModel, DynParams
from .dynamics import _phys_bf16, mass_factor_solve
from ..ops.tree_solve import ltdl_upsolve, ltdl_downsolve

_HI = jax.lax.Precision.HIGHEST


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


def _fold(mat, x):
    """(r, s) static mask x (s, .., N) -> (r, .., N) as one dot_general
    with trailing free dims (no reshape — merging tile-padded middle dims
    with the minor axis forces a physical relayout on TPU). Same precision
    policy as dynamics._fold: HIGH (3-pass bf16x3, ~6e-5 rel) by default —
    contact forces are k*depth penalty terms, orders above that — with
    ``BSIM_FOLD_HIGHEST=1`` restoring exact-f32 6-pass."""
    prec = _HI if os.environ.get("BSIM_FOLD_HIGHEST", "0") == "1" \
        else jax.lax.Precision.HIGH
    return jax.lax.dot_general(jnp.asarray(mat, x.dtype), x,
                               (((1,), (0,)), ((), ())), precision=prec)


def _mv(A, x):
    """(.., 3, 3, N) x (.., 3, N) -> (.., 3, N) unrolled."""
    return jnp.stack([sum(A[..., i, k, :] * x[..., k, :]
                          for k in range(3)) for i in range(3)], -2)


def _mvT(A, x):
    return jnp.stack([sum(A[..., k, i, :] * x[..., k, :]
                          for k in range(3)) for i in range(3)], -2)


def _cross(a, b):
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack([a1 * b2 - a2 * b1,
                      a2 * b0 - a0 * b2,
                      a0 * b1 - a1 * b0], -2)


def _rows(x):
    """Normalizes a per-env 3-vector argument to (3, N): accepts a static
    (3,) vector or an env-last (3, N) array. Env-first (N, 3) input is
    REJECTED rather than inferred — an (3, 3) array is ambiguous between
    the two layouts and silently transposing produced wrong contact
    geometry for 3-env batches (ADVICE round 2)."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        return x[:, None]
    if x.shape[0] != 3:
        raise ValueError(
            f"per-env contact vectors must be env-last (3, N); got "
            f"{x.shape} — transpose env-first inputs at the call site")
    return x


def sphere_plane_pair_forces(model: ArticulatedModel, kin,
                             params: DynParams, sphere_link: int,
                             sphere_offset, radius: float,
                             plane_link: int, plane_point, plane_normal,
                             mu=1.0, dt=1.0 / 60.0, tau=0.02,
                             zeta=1.0, plane_halfsize=None):
    """Contact between a sphere on one body and a plane patch attached to
    another body (e.g. a ball on a tilting tray). Same mass-adaptive
    penalty model as the ground contacts; equal and opposite world-frame
    spatial forces are returned env-last as (nb, 6, N) (or (nb, 6) for
    single-env kinematics).

    ``plane_point``/``plane_normal`` are in the plane body's frame;
    ``sphere_offset``/``plane_point`` accept static 3-vectors or per-env
    ENV-LAST (3, N) arrays (env-first (N, 3) is rejected by ``_rows`` —
    transpose at the call site); ``plane_halfsize`` optionally
    deactivates the contact when the sphere center leaves a square patch
    of that half-extent around plane_point."""
    single = kin.p_w.ndim == 2
    if single:
        kin = jax.tree_util.tree_map(lambda a: a[..., None], kin)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[None], params)
    n = kin.p_w.shape[-1]
    scale = jnp.broadcast_to(jnp.asarray(params.scale), (n,))  # (N,)
    off_s = _rows(sphere_offset) * scale[None]                 # (3, N)
    pp = _rows(plane_point) * scale[None]
    nrm = _rows(plane_normal)

    R_s, p_s = kin.R_w[sphere_link], kin.p_w[sphere_link]      # (3,3,N)/(3,N)
    R_p, p_p = kin.R_w[plane_link], kin.p_w[plane_link]
    center = p_s + _mv(R_s, off_s)
    n_w = _mv(R_p, jnp.broadcast_to(nrm, (3, n)))
    pp_w = p_p + _mv(R_p, jnp.broadcast_to(pp, (3, n)))
    dist = jnp.sum((center - pp_w) * n_w, 0)                   # (N,)
    r_scaled = radius * scale
    depth = r_scaled - dist
    contact_pt = center - n_w * r_scaled[None]

    def point_vel(link, pt):
        R = kin.R_w[link]
        w = _mv(R, kin.v[link, :3])
        vl = _mv(R, kin.v[link, 3:])
        return vl + _cross(w, pt - kin.p_w[link])

    v_rel = point_vel(sphere_link, contact_pt) - \
        point_vel(plane_link, contact_pt)
    v_n = jnp.sum(v_rel * n_w, 0)
    mass = jnp.asarray(params.mass).T                          # (nb, N)
    m_s = mass[sphere_link]
    m_p = mass[plane_link]
    m_eff = 1.0 / (1.0 / m_s + 1.0 / jnp.maximum(m_p, 1e-6))
    f_n_mag = m_eff * (depth / tau ** 2 + 2.0 * zeta * (-v_n) / tau)
    active = depth > 0
    if plane_halfsize is not None:
        # Gate on the TANGENTIAL extent of the plane-frame offset (the
        # components orthogonal to the plane normal). Hardcoding
        # components 0/1 is only right for z-normal planes; for the
        # finger-pad (y-normal) and cube-face (x/y-normal) patches it
        # gated the normal distance — always tiny at contact — and left
        # one tangential axis unbounded (round-3 review finding).
        local = _mvT(R_p, center - pp_w)                   # (3, N)
        nrm_b = jnp.broadcast_to(nrm, (3, n))
        l_t = jnp.abs(local - jnp.sum(local * nrm_b, 0,
                                      keepdims=True) * nrm_b)
        active = active & (jnp.max(l_t, 0) < plane_halfsize)
    f_n_mag = jnp.where(active, jnp.maximum(f_n_mag, 0.0), 0.0)
    v_t = v_rel - v_n[None] * n_w
    v_t_norm = jnp.sqrt(jnp.sum(v_t * v_t, 0)) + 1e-8
    inertia = jnp.moveaxis(jnp.asarray(params.inertia), 0, -1)  # (nb,3,N)
    i_mean = jnp.mean(inertia[sphere_link], 0) + 1e-8
    # The rotational lever of the slip-stopping cap is the TRUE moment
    # arm |contact_pt - link origin| (like ground_contact_forces), not
    # the sphere radius: for a sphere mounted far from its link origin
    # (a cube corner point: 2 mm radius, 5.6 cm arm) the radius-based
    # cap overshot the rotation-stopping impulse ~30x, REVERSING the
    # angular velocity each step — a resting cube spun itself up to the
    # 64 rad/s clamp and walked off the palm (round-4 finding).
    arm_sq = jnp.sum((contact_pt - p_s) ** 2, 0)
    m_eff_t = 1.0 / (1.0 / m_s + arm_sq / i_mean)
    mu_n = jnp.broadcast_to(jnp.asarray(mu, jnp.float32), (n,))
    cap = jnp.minimum(mu_n * f_n_mag, m_eff_t * v_t_norm / dt)
    f_t = -v_t / v_t_norm[None] * cap[None]
    force = n_w * f_n_mag[None] + f_t                          # on sphere
    f_ext = jnp.zeros((model.nb, 6, n))
    arm_s = contact_pt - p_s
    f_ext = f_ext.at[sphere_link, :3].add(_cross(arm_s, force))
    f_ext = f_ext.at[sphere_link, 3:].add(force)
    arm_p = contact_pt - p_p
    f_ext = f_ext.at[plane_link, :3].add(_cross(arm_p, -force))
    f_ext = f_ext.at[plane_link, 3:].add(-force)
    return f_ext[..., 0] if single else f_ext


def sphere_plane_pairs_forces(model: ArticulatedModel, kin,
                              params: DynParams, sphere_links,
                              sphere_offsets, radii, plane_links,
                              plane_points, plane_normals, mu,
                              dt=1.0 / 60.0, tau=0.02, zeta=1.0,
                              plane_halfsizes=None,
                              return_geometry=False, forces=True):
    """Vectorized form of ``sphere_plane_pair_forces`` over P pairs at
    once — ONE set of tensor ops instead of P separate calls (ShadowHand
    runs tens of pairs per substep; separate calls blow the per-step HLO
    to ~100 s CPU compiles and pay P x the kernel launches).

    sphere_links/plane_links: static (P,) int arrays.
    sphere_offsets/plane_points: (P, 3) static or (P, 3, N) env-last (in
    the PLANE/SPHERE body frames; multiplied by params.scale like the
    single-pair function). plane_normals: (P, 3) static or (P, 3, N)
    env-last unit normals (NOT scaled — e.g. per-env selected cube
    faces). radii: (P,) or (P, N). mu: scalar, (P,), or (P, N).
    plane_halfsizes: None, (P,), or (P, N). Returns env-last (nb, 6, N)
    ((nb, 6) for single-env kin)."""
    single = kin.p_w.ndim == 2
    if single:
        kin = jax.tree_util.tree_map(lambda a: a[..., None], kin)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[None], params)
    n = kin.p_w.shape[-1]
    P = len(sphere_links)
    scale = jnp.broadcast_to(jnp.asarray(params.scale), (n,))

    def per_pair_vec(x):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 2:
            x = x[:, :, None]
        return jnp.broadcast_to(x, (P, 3, n)) * scale

    off_s = per_pair_vec(sphere_offsets)
    pp = per_pair_vec(plane_points)
    nrm_a = jnp.asarray(plane_normals, jnp.float32)
    nrm = jnp.broadcast_to(
        nrm_a[:, :, None] if nrm_a.ndim == 2 else nrm_a, (P, 3, n))
    radii_j = jnp.broadcast_to(
        jnp.asarray(radii, jnp.float32).reshape(P, -1), (P, n)) * scale
    mu_j = jnp.broadcast_to(
        jnp.asarray(mu, jnp.float32).reshape(-1, 1), (P, n)) \
        if jnp.asarray(mu).ndim <= 1 else jnp.asarray(mu, jnp.float32)

    g_s = np.zeros((P, model.nb), np.float32)
    g_s[np.arange(P), np.asarray(sphere_links)] = 1.0
    g_p = np.zeros((P, model.nb), np.float32)
    g_p[np.arange(P), np.asarray(plane_links)] = 1.0

    def gather(mat):
        R = _fold(mat, kin.R_w)
        p = _fold(mat, kin.p_w)
        vl = _fold(mat, kin.v)
        return R, p, vl

    R_s, p_s, v_s = gather(g_s)
    R_p, p_p, v_p = gather(g_p)
    center = p_s + _mv(R_s, off_s)
    n_w = _mv(R_p, nrm)
    pp_w = p_p + _mv(R_p, pp)
    dist = jnp.sum((center - pp_w) * n_w, 1)                  # (P, N)
    depth = radii_j - dist
    contact_pt = center - n_w * radii_j[:, None, :]
    patch_ok = jnp.ones((P, n), bool)
    if plane_halfsizes is not None:
        hs = jnp.broadcast_to(
            jnp.asarray(plane_halfsizes, jnp.float32).reshape(P, -1),
            (P, n))
        # Tangential-extent gate (see sphere_plane_pair_forces): project
        # out the normal component so the two in-plane axes are gated
        # whatever the face normal's plane-frame direction.
        local = _mvT(R_p, center - pp_w)                  # (P, 3, N)
        l_t = jnp.abs(local - jnp.sum(local * nrm, 1,
                                      keepdims=True) * nrm)
        patch_ok = jnp.max(l_t, 1) < hs
    if not forces:
        # Geometry-only mode for the velocity-level contact stack (the
        # impulse solver owns forces AND friction; see
        # contact_pairs_impulse_prepare): skip the penalty force math.
        assert return_geometry and not single
        depth_eff = jnp.where(patch_ok, depth, -1.0)
        return None, (n_w, depth_eff, contact_pt)

    def point_vel(R, p, v6, pt):
        w = _mv(R, v6[:, :3])
        vl = _mv(R, v6[:, 3:])
        return vl + _cross(w, pt - p)

    v_rel = point_vel(R_s, p_s, v_s, contact_pt) - \
        point_vel(R_p, p_p, v_p, contact_pt)
    v_n = jnp.sum(v_rel * n_w, 1)
    mass = jnp.asarray(params.mass).T                          # (nb, N)
    m_s = _fold(g_s, mass)
    m_p = _fold(g_p, mass)
    m_eff = 1.0 / (1.0 / m_s + 1.0 / jnp.maximum(m_p, 1e-6))
    f_n_mag = m_eff * (depth / tau ** 2 + 2.0 * zeta * (-v_n) / tau)
    active = (depth > 0) & patch_ok
    f_n_mag = jnp.where(active, jnp.maximum(f_n_mag, 0.0), 0.0)
    v_t = v_rel - v_n[:, None, :] * n_w
    v_t_norm = jnp.sqrt(jnp.sum(v_t * v_t, 1)) + 1e-8
    inertia = jnp.moveaxis(jnp.asarray(params.inertia), 0, -1)  # (nb,3,N)
    i_mean = _fold(g_s, jnp.mean(inertia, 1)) + 1e-8
    # True moment arm, not the sphere radius (see sphere_plane_pair_
    # forces: a far-mounted contact point otherwise over-reverses spin).
    arm_sq = jnp.sum((contact_pt - p_s) ** 2, 1)
    m_eff_t = 1.0 / (1.0 / m_s + arm_sq / i_mean)
    cap = jnp.minimum(mu_j * f_n_mag, m_eff_t * v_t_norm / dt)
    f_t = -v_t / v_t_norm[:, None, :] * cap[:, None, :]
    force = n_w * f_n_mag[:, None, :] + f_t                    # on spheres
    wr_s = jnp.concatenate([_cross(contact_pt - p_s, force), force], 1)
    wr_p = jnp.concatenate([_cross(contact_pt - p_p, -force), -force], 1)
    out = _fold(g_s.T, wr_s) + _fold(g_p.T, wr_p)
    if return_geometry:
        # Patch-gated geometry for contact_pairs_impulse (batched only):
        # pairs outside the face patch report depth -1 (never active).
        depth_eff = jnp.where(patch_ok, depth, -1.0)
        return out, (n_w, depth_eff, contact_pt)
    return out[..., 0] if single else out


def sphere_box_pairs_forces(model: ArticulatedModel, kin,
                            params: DynParams, sphere_links,
                            sphere_offsets, radii, box_link, box_half,
                            mu, dt=1.0 / 60.0, tau=0.02, zeta=1.0,
                            return_geometry=False, forces=True):
    """Penalty contacts between P spheres on an articulated body and ONE
    box-shaped link, with EXACT closest-point geometry: the contact
    point is the sphere center clamped to the box (faces, edges and
    corners handled uniformly); for a center inside the box the nearest
    face is used. This replaces the per-face plane model for the
    ShadowHand cube: the face-patch gate there turned every face off for
    a sphere approaching diagonally across an edge, so overlap built up
    before ANY pair activated (measured 19 mm transients under an
    adversarial max-curl squeeze — 3x the allowed slop; the reference
    gets exact box contacts from PhysX's convex collision).

    Same mass-adaptive penalty/friction model and env-last batching as
    ``sphere_plane_pairs_forces``. sphere_links: static (P,) ints.
    sphere_offsets: (P, 3) static or (P, 3, N) env-last (sphere-link
    frame, scaled by params.scale). radii: (P,) or (P, N) (scaled).
    box_half: scalar, (N,), or (3,)/(3, N) half-extents in the box
    frame, NOT scaled by params.scale (pass pre-scaled halves — the
    ShadowHand applies object scale explicitly). mu: scalar, (P,) or
    (P, N). Returns env-last (nb, 6, N), or with
    ``return_geometry=True`` also (n_w, depth, contact_pt) for
    ``contact_pairs_impulse`` (no gating needed — closest-point depth
    is exact everywhere)."""
    single = kin.p_w.ndim == 2
    if single:
        kin = jax.tree_util.tree_map(lambda a: a[..., None], kin)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[None], params)
    n = kin.p_w.shape[-1]
    P = len(sphere_links)
    scale = jnp.broadcast_to(jnp.asarray(params.scale), (n,))

    off = jnp.asarray(sphere_offsets, jnp.float32)
    if off.ndim == 2:
        off = off[:, :, None]
    off = jnp.broadcast_to(off, (P, 3, n)) * scale
    r_j = jnp.broadcast_to(
        jnp.asarray(radii, jnp.float32).reshape(P, -1), (P, n)) * scale
    mu_j = jnp.broadcast_to(
        jnp.asarray(mu, jnp.float32).reshape(-1, 1), (P, n)) \
        if jnp.asarray(mu).ndim <= 1 else jnp.asarray(mu, jnp.float32)
    half_a = jnp.asarray(box_half, jnp.float32)
    if half_a.ndim <= 1 and half_a.shape != (3,):
        half = jnp.broadcast_to(half_a.reshape(1, -1), (3, n))
    else:
        half = jnp.broadcast_to(half_a.reshape(3, -1), (3, n))

    g_s = np.zeros((P, model.nb), np.float32)
    g_s[np.arange(P), np.asarray(sphere_links)] = 1.0
    R_s = _fold(g_s, kin.R_w)
    p_s = _fold(g_s, kin.p_w)
    v_s = _fold(g_s, kin.v)
    R_b, p_b, v_b = (kin.R_w[box_link], kin.p_w[box_link],
                     kin.v[box_link])
    center = p_s + _mv(R_s, off)                          # (P, 3, N)
    local = jnp.stack(
        [sum(R_b[k, i] * (center[:, k] - p_b[None, k])
             for k in range(3)) for i in range(3)], 1)    # (P, 3, N)
    clamped = jnp.clip(local, -half[None], half[None])
    delta = local - clamped
    dist_out = jnp.sqrt(jnp.sum(delta * delta, 1))        # (P, N)
    inside = dist_out <= 0.0
    # Outside: normal along center-closest; contact point = closest.
    n_out = delta / jnp.maximum(dist_out, 1e-9)[:, None, :]
    # Inside: least-penetrated face (one-hot over the static 3 axes).
    s_in = half[None] - jnp.abs(local)                    # (P, 3, N)
    sel = jax.nn.one_hot(jnp.argmin(s_in, axis=1), 3, axis=1,
                         dtype=jnp.float32)               # (P, 3, N)
    n_in = sel * jnp.sign(local)
    pt_in = local * (1.0 - sel) + sel * jnp.sign(local) * half[None]
    depth = jnp.where(inside, r_j + jnp.sum(sel * s_in, 1),
                      r_j - dist_out)
    n_loc = jnp.where(inside[:, None, :], n_in, n_out)
    pt_loc = jnp.where(inside[:, None, :], pt_in, clamped)
    n_w = _mv(jnp.broadcast_to(R_b[None], (P, 3, 3, n)), n_loc)
    contact_pt = p_b[None] + _mv(
        jnp.broadcast_to(R_b[None], (P, 3, 3, n)), pt_loc)
    if not forces:
        # Geometry-only mode (see sphere_plane_pairs_forces).
        assert return_geometry and not single
        return None, (n_w, depth, contact_pt)

    def point_vel(R, p, v6, pt):
        w = _mv(R, v6[:, :3])
        vl = _mv(R, v6[:, 3:])
        return vl + _cross(w, pt - p)

    def point_vel_single(R, p, v6, pt):
        w = jnp.stack([sum(R[i, k] * v6[k] for k in range(3))
                       for i in range(3)], 0)             # (3, N)
        vl = jnp.stack([sum(R[i, k] * v6[3 + k] for k in range(3))
                        for i in range(3)], 0)
        return (vl[None] + _cross(jnp.broadcast_to(w[None], pt.shape),
                                  pt - p[None]))

    v_rel = point_vel(R_s, p_s, v_s, contact_pt) - \
        point_vel_single(R_b, p_b, v_b, contact_pt)
    v_n = jnp.sum(v_rel * n_w, 1)
    mass = jnp.asarray(params.mass).T                     # (nb, N)
    m_s = _fold(g_s, mass)
    m_b = mass[box_link][None]                            # (1, N)
    m_eff = 1.0 / (1.0 / m_s + 1.0 / jnp.maximum(m_b, 1e-6))
    f_n_mag = m_eff * (depth / tau ** 2 + 2.0 * zeta * (-v_n) / tau)
    f_n_mag = jnp.where(depth > 0, jnp.maximum(f_n_mag, 0.0), 0.0)
    v_t = v_rel - v_n[:, None, :] * n_w
    v_t_norm = jnp.sqrt(jnp.sum(v_t * v_t, 1)) + 1e-8
    inertia = jnp.moveaxis(jnp.asarray(params.inertia), 0, -1)
    i_mean = _fold(g_s, jnp.mean(inertia, 1)) + 1e-8
    # True moment arm, not the sphere radius (see sphere_plane_pair_
    # forces).
    arm_sq = jnp.sum((contact_pt - p_s) ** 2, 1)
    m_eff_t = 1.0 / (1.0 / m_s + arm_sq / i_mean)
    cap = jnp.minimum(mu_j * f_n_mag, m_eff_t * v_t_norm / dt)
    f_t = -v_t / v_t_norm[:, None, :] * cap[:, None, :]
    force = n_w * f_n_mag[:, None, :] + f_t               # on spheres
    wr_s = jnp.concatenate([_cross(contact_pt - p_s, force), force], 1)
    wr_b = jnp.concatenate(
        [_cross(contact_pt - p_b[None], -force), -force], 1)
    g_b = np.zeros((P, model.nb), np.float32)
    g_b[:, box_link] = 1.0
    out = _fold(g_s.T, wr_s) + _fold(g_b.T, wr_b)
    if return_geometry:
        return out, (n_w, depth, contact_pt)
    return out[..., 0] if single else out


def _sphere_pair_geometry(model: ArticulatedModel, kin, params,
                          links_a, offsets_a, radii_a,
                          links_b, offsets_b, radii_b):
    """Shared env-last sphere-pair contact geometry: one-hot link gathers,
    world sphere centers, center-line normals (b -> a), penetration depth
    and contact points for P sphere-sphere pairs. Expects an already
    env-last (promoted) ``kin``/``params``. Coincident centers are guarded
    to a fixed direction (force/impulse magnitude is zero there via the
    depth clamp)."""
    n = kin.p_w.shape[-1]
    P = len(links_a)
    scale = jnp.broadcast_to(jnp.asarray(params.scale), (n,))

    def per_pair_vec(x):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 2:
            x = x[:, :, None]
        return jnp.broadcast_to(x, (P, 3, n)) * scale

    def per_pair_sc(x):
        return jnp.broadcast_to(
            jnp.asarray(x, jnp.float32).reshape(P, -1), (P, n)) * scale

    off_a = per_pair_vec(offsets_a)
    off_b = per_pair_vec(offsets_b)
    r_a = per_pair_sc(radii_a)
    r_b = per_pair_sc(radii_b)

    g_a = np.zeros((P, model.nb), np.float32)
    g_a[np.arange(P), np.asarray(links_a)] = 1.0
    g_b = np.zeros((P, model.nb), np.float32)
    g_b[np.arange(P), np.asarray(links_b)] = 1.0

    def gather(mat):
        return _fold(mat, kin.R_w), _fold(mat, kin.p_w), _fold(mat, kin.v)

    R_a, p_a, v_a = gather(g_a)
    R_b, p_b, v_b = gather(g_b)
    c_a = p_a + _mv(R_a, off_a)
    c_b = p_b + _mv(R_b, off_b)
    d = c_a - c_b                                             # (P, 3, N)
    dist = jnp.sqrt(jnp.sum(d * d, 1))                        # (P, N)
    safe = jnp.maximum(dist, 1e-9)
    n_w = d / safe[:, None, :]                                # b -> a
    depth = (r_a + r_b) - dist
    contact_pt = c_a - n_w * r_a[:, None, :]
    return (g_a, g_b, R_a, p_a, v_a, R_b, p_b, v_b, r_a, r_b,
            n_w, depth, contact_pt)


def contact_pairs_impulse(model: ArticulatedModel, kin, factor, v,
                          links_a, links_b, n_w, depth, contact_pt, dt,
                          beta=0.2, max_bias=1.0, iters=4, slop=0.0):
    """Velocity-level (constraint-based) resolution of P contact pairs
    with precomputed geometry: returns the generalized velocity ``v``
    (N, nv) with non-penetration impulses applied.

    Why impulses and not a stiffer penalty: a position drive can press
    two light links together with a force (servo effort / lever arm, ~7 N
    for ShadowHand abduction) that no explicitly-stable penalty spring
    referenced to the links' ~0.01 kg effective mass can statically
    support at small penetration — the explicit stability bound
    k <= 4 m_eff / h^2 caps the static force at ~m_eff * d * 4/h^2,
    orders of magnitude short, so driven fingers crossed straight through
    each other (and fingertips through the cube) in the round-3 probes.
    PhysX resolves exactly this with its velocity-level TGS/PGS solver;
    this is the same construction on the engine's own machinery:

    * contact Jacobian rows come directly from the FK's world-Plücker dof
      subspaces: J[c, m] = anc[a_c, m] - anc[b_c, m] times
      n_c . (S_lin[m] + S_ang[m] x (pt_c - o)) — no new kinematics,
    * the effective-inertia (Delassus) operator J M^-1 J^T reuses the
      SAME mass factorization ``forward_dynamics`` already built this
      substep (``return_factor=True``), including the implicit-drive
      diagonal h(kd + h kp) — so the impulse works against the servo
      impedance, not just the bare link mass,
    * a fixed-iteration projected Jacobi sweep (under-relaxed; P and
      iters are static, every iteration is a handful of fused env-last
      multiply-adds — a scalar Gauss-Seidel chain emitted ~1400 tiny
      kernels and cost 10x the whole physics step, measured) solves the
      contact LCP with a clamped Baumgarte bias beta*(depth-slop)/dt
      (<= max_bias, PhysX's maxDepenetrationVelocity analogue).

    ``slop`` (scalar or (P,) / (P, N)): allowed rest penetration — the
    PhysX rest-offset analogue. The impulse engages only at depth > slop,
    leaving the penalty pass to own gentle/resting contact INCLUDING its
    friction (an impulse active at zero depth would hold the bodies apart
    before the penalty's normal force — and therefore its Coulomb cap —
    could form, leaving e.g. a cube resting frictionless on the palm).

    Geometry inputs are env-last: n_w/contact_pt (P, 3, N) with n
    pointing from body b toward body a, depth (P, N) positive in
    penetration (pass a gated depth, e.g. -1, for pairs outside a face
    patch). Normal-only: tangential friction stays with the penalty
    passes. Batched env-last only (v (N, nv), factor from a batched
    forward_dynamics call).

    For multi-substep steps, split the call: ``contact_pairs_impulse_
    prepare`` once per control step (Jacobians + M^-1 J^T — the
    expensive half) and ``contact_pairs_impulse_apply`` per substep with
    fresh depth/velocities — PhysX TGS's one-Jacobian-per-frame,
    many-velocity-sweeps structure; J moves O(mm) within a step."""
    payload = contact_pairs_impulse_prepare(
        model, kin, factor, links_a, links_b, n_w, contact_pt)
    return contact_pairs_impulse_apply(payload, v, depth, dt, beta=beta,
                                       max_bias=max_bias, iters=iters,
                                       slop=slop)


def _closure_groups(chains, d_anc):
    """Static row grouping for the compact half-solve Delassus factors:
    each constraint row's L^-T fill stays inside the ancestor CLOSURE of
    its Jacobian support (ltdl_upsolve), so rows sharing a closure can be
    up-solved / swept together as one (rows, K, N) tensor that skips the
    ~2/3 of the nv axis the row can never touch (ShadowHand: closures
    are 8-12 of 30 dofs). Closures that are subsets of an already-kept
    closure merge into it when the padding cost is small (<= 2 extra
    dofs per row) — e.g. a finger's proximal/middle rows ride the distal
    row's group — keeping the group count (and the XLA op graph) small.
    Returns [(rows (g,) int32 asc, dofs tuple asc)] covering all rows
    exactly once."""
    R = d_anc.shape[0]
    clos = []
    for r in range(R):
        s = set(np.nonzero(d_anc[r])[0].tolist())
        c = set(s)
        for d in s:
            c |= set(chains[d])
        clos.append(frozenset(c))
    uniq = {}
    for r, c in enumerate(clos):
        uniq.setdefault(c, []).append(r)
    merged = []                                 # [closure, rows]
    for c in sorted(uniq, key=len, reverse=True):
        target = None
        for m in merged:
            if c <= m[0] and len(m[0]) - len(c) <= 2:
                target = m
                break
        if target is None:
            merged.append([c, list(uniq[c])])
        else:
            target[1].extend(uniq[c])
    return [(np.asarray(sorted(rows), np.int32), tuple(sorted(c)))
            for c, rows in merged]


def contact_pairs_impulse_prepare(model: ArticulatedModel, kin, factor,
                                  links_a, links_b, n_w, contact_pt,
                                  mu=None, fric_pairs=None):
    """Expensive, geometry-slow half of ``contact_pairs_impulse``:
    contact Jacobians from the FK's world-Plücker dof subspaces and the
    M^-1 J^T columns against the step's mass factorization. Reusable
    across a step's substeps (see contact_pairs_impulse docstring).

    With ``mu`` the constraint set gains two TANGENTIAL rows per
    friction pair — an orthonormal tangent basis built from each contact
    normal — and the apply sweeps box-project the tangential impulses to
    |lam_t| <= mu lam_n: Coulomb friction solved at the velocity level
    in the same projected mass-splitting Jacobi, the PhysX PGS
    construction. This exists because explicit penalty friction on
    multi-point box contacts is structurally unstable: the per-point
    slip-stopping impulse cannot see the other points, so 4 cube
    corners each sized to stop the cube's spin reversed it 3x per
    substep — the resting cube chattered at 5-15 rad/s and walked off
    the palm (round-4 measurement); the coupled solve resolves exactly
    this. ``fric_pairs`` (static index list, default all pairs) selects
    WHICH pairs get friction rows — every row is pure streamed
    bandwidth in the apply sweeps, so callers keep the set minimal
    (ShadowHand: the 8 cube-palm support pairs only). ``mu`` (scalar,
    (F,) or (F, N)) aligns with ``fric_pairs``. Row layout:
    [P normals, F t1, F t2]."""
    P = len(links_a)
    fidx = None
    if mu is not None:
        fidx = (np.arange(P, dtype=np.int32) if fric_pairs is None
                else np.asarray(fric_pairs, np.int32))
        n_f = n_w[jnp.asarray(fidx)]                      # (F, 3, N)
        # Branchless orthonormal tangent basis from each normal: the
        # helper axis is x-hat where the normal is mostly not-x, else
        # y-hat (never parallel).
        one = jnp.ones_like(n_f[:, :1])
        zero = jnp.zeros_like(one)
        ex = jnp.concatenate([one, zero, zero], 1)
        ey = jnp.concatenate([zero, one, zero], 1)
        e = jnp.where(jnp.abs(n_f[:, 0:1]) < 0.9, ex, ey)
        t1 = _cross(n_f, e)
        t1 = t1 / (jnp.sqrt(jnp.sum(t1 * t1, 1, keepdims=True)) + 1e-9)
        t2 = _cross(n_f, t1)
        dirs = jnp.concatenate([n_w, t1, t2], 0)          # (P+2F, 3, N)
        cpt_f = contact_pt[jnp.asarray(fidx)]
        cpt = jnp.concatenate([contact_pt, cpt_f, cpt_f], 0)
        la_f = [links_a[i] for i in fidx]
        lb_f = [links_b[i] for i in fidx]
        row_links_a = list(links_a) + la_f * 2
        row_links_b = list(links_b) + lb_f * 2
    else:
        dirs, cpt = n_w, contact_pt
        row_links_a, row_links_b = links_a, links_b
    anc = np.asarray(model.anc_dof)                       # (nb, nv)
    d_anc = (anc[np.asarray(row_links_a)]
             - anc[np.asarray(row_links_b)])              # (R, nv) static
    S = kin.S_o                                           # (nv, 6, N)
    S_ang, S_lin = S[:, :3], S[:, 3:]
    r_pt = cpt - kin.o[None]                              # (R, 3, N)
    # n . (S_lin + S_ang x (pt-o)) = n . S_lin + S_ang . ((pt-o) x n).
    # All contractions below are explicit broadcast-multiply-sums over
    # the SHORT static axes with the env lanes trailing and untouched:
    # einsum/dot_general with a trailing batch dim relayouts the (P, nv,
    # N) operands to batch-leading, which alone cost more than the whole
    # physics step (measured 10x regression).
    rxn = _cross(r_pt, dirs)
    R = d_anc.shape[0]
    n_env = n_w.shape[-1]
    share = ((np.asarray(links_a)[:, None] == np.asarray(links_a)[None])
             | (np.asarray(links_a)[:, None] == np.asarray(links_b)[None])
             | (np.asarray(links_b)[:, None] == np.asarray(links_a)[None])
             | (np.asarray(links_b)[:, None] == np.asarray(links_b)[None])
             ).astype(np.float32)                         # (P, P) static
    mu_j = None
    if mu is not None:
        F = len(fidx)
        mu_j = jnp.broadcast_to(
            jnp.asarray(mu, jnp.float32).reshape(-1, 1), (F, n_env)) \
            if jnp.asarray(mu).ndim <= 1 else jnp.asarray(mu, jnp.float32)
    # BSIM_IMPULSE_COMPACT=0 forces the dense-X route (equivalence
    # tests / perf A/B; the two are the same math to sweep tolerance).
    if (isinstance(factor, tuple) and factor[0] == "tree"
            and os.environ.get("BSIM_IMPULSE_COMPACT", "1") != "0"):
        # COMPACT HALF-SOLVE DELASSUS FACTORS (the tree-factor fast
        # path). The dense route materializes X = M^-1 J^T — dense over
        # the whole subtree because the L^-1 down-pass fills every
        # descendant — and every sweep streams the full (R, nv, N)
        # tensor. Split M^-1 = L^-1 D^-1 L^-T instead and stop after the
        # UP pass: Y = L^-T J^T keeps each row's support closure (8-12
        # of 30 dofs for ShadowHand), the Delassus application becomes
        # u = sum_r lam_r Y_r; z = D^-1 u; (J M^-1 J^T lam)_r = Y_r . z
        # — all on closure-compact group tensors — and the one dense
        # down-solve dv = L^-1 z runs ONCE per apply call on a single
        # (nv, N) vector (ltdl_downsolve) instead of per prepared row.
        # Measured step bandwidth is the whole game here (round-3/4
        # profiles: no hot op, everything streams), so the ~3x fewer
        # bytes in both the prepare solve and the sweeps is the win.
        chains = model.dof_anc_chains
        H, D = factor[1]
        dt16 = jnp.bfloat16 if _phys_bf16() else jnp.float32
        Hc = H if dt16 == jnp.float32 else \
            {k: hv.astype(dt16) for k, hv in H.items()}
        invD = 1.0 / jnp.stack(D, 0)                      # (nv, N) f32
        groups = []
        diag = jnp.zeros((R, n_env))
        for rows, dofs in _closure_groups(chains, d_anc):
            rj = jnp.asarray(rows)
            dj = jnp.asarray(dofs)
            dirs_g, rxn_g = dirs[rj], rxn[rj]
            S_lin_g, S_ang_g = S_lin[dj], S_ang[dj]
            Jg = sum(dirs_g[:, None, x] * S_lin_g[None, :, x]
                     + rxn_g[:, None, x] * S_ang_g[None, :, x]
                     for x in range(3))                   # (g, K, N)
            Jg = Jg * jnp.asarray(
                d_anc[np.ix_(rows, dofs)], jnp.float32)[:, :, None]
            Jg = jax.lax.optimization_barrier(Jg.astype(dt16))
            xr = {d: Jg[:, j] for j, d in enumerate(dofs)}
            xr = ltdl_upsolve(chains, Hc, xr, dofs)
            Yg = jax.lax.optimization_barrier(
                jnp.stack([xr[d] for d in dofs], 1))      # (g, K, N)
            dg = sum(Yg[:, j].astype(jnp.float32) ** 2 * invD[dofs[j]]
                     for j in range(len(dofs)))
            diag = diag.at[rj].set(dg + 1e-9)
            groups.append((rows, dofs, Yg, Jg))
        return dict(mode="Y", groups=groups, invD=invD, diag=diag,
                    share=share, mu=mu_j, P=P, fidx=fidx, R=R,
                    chains=chains, H=H, nv=model.nv,
                    # Self-describing row payload (round-4 ADVICE): the
                    # world direction, contact point and link pair of
                    # every solved row, so force-sensor readers derive
                    # nothing by hand (impulse_row_forces below). Unused
                    # entries are DCE'd by XLA.
                    dirs=dirs, cpt=cpt, row_links_a=tuple(row_links_a),
                    row_links_b=tuple(row_links_b))
    J = sum(dirs[:, None, x] * S_lin[None, :, x]
            + rxn[:, None, x] * S_ang[None, :, x]
            for x in range(3))                            # (R, nv, N)
    J = J * jnp.asarray(d_anc, jnp.float32)[:, :, None]
    # The Jacobian, the M^-1 J^T solve and the Delassus application are
    # the pass's bandwidth (P*nv*N tensors streamed repeatedly); under
    # the engine's standard bf16 policy the STORED Jacobian is bf16 and
    # every consumer (v_n0, solve RHS, sweep reduces) reads the bf16
    # copy — a ~0.4% impulse perturbation the projected sweep and the
    # Baumgarte bias absorb (measured: f32 everywhere cost 45% of
    # ShadowHand step throughput at P=35; keeping a separate f32 J just
    # for v_n0 cost an extra (P, nv, N) f32 read per substep). lam, the
    # sweep accumulator w and the final dv stay f32.
    # Materialize once: fused into its several consumers XLA recomputes
    # the whole build per use.
    J_s = jax.lax.optimization_barrier(
        J.astype(jnp.bfloat16) if _phys_bf16() else J)
    X = jax.lax.optimization_barrier(
        mass_factor_solve(model, factor, J_s))            # (P, nv, N)
    # SUPPORT COMPACTION of the stored Jacobian: J[c] is nonzero only on
    # the SYMMETRIC DIFFERENCE of the two links' ancestor-dof sets
    # (d_anc = anc[a]-anc[b]; shared ancestors — e.g. the wrist under
    # two finger chains — cancel exactly). For ShadowHand's 35 pairs
    # that is at most 13 of 30 dofs, so the J.w sweep reduces and v_n0
    # stream a (P, K, N) tensor instead of (P, nv, N) — identical sums
    # (the dropped entries are exactly zero) at 2.3x less J bandwidth;
    # the gathered w rows (K per pair, static indices, ~2 MB total) stay
    # VMEM-resident. X = M^-1 J^T is dense (the factor couples the whole
    # tree) and cannot compact. Skipped when the support is near-full
    # (the take would only add work).
    R = d_anc.shape[0]
    sup_mask = d_anc != 0                                 # (R, nv) static
    K = int(sup_mask.sum(1).max()) if R else 0
    if K < 0.75 * J_s.shape[1]:
        sup_idx = np.zeros((R, K), np.int32)
        pad = np.zeros((R, K, 1), np.float32)
        for c in range(R):
            nz = np.nonzero(sup_mask[c])[0]
            sup_idx[c, :len(nz)] = nz
            pad[c, :len(nz), 0] = 1.0
        J_c = jnp.take_along_axis(
            J_s, jnp.asarray(sup_idx)[:, :, None], axis=1)
        J_c = J_c * jnp.asarray(pad, J_c.dtype)           # (R, K, N)
    else:
        sup_idx, J_c = None, J_s
    # The Delassus operator J M^-1 J^T is NEVER materialized: a (P, P,
    # N) tensor rebuilt and re-read per sweep scaled the pass O(P^2 N)
    # and cost 45% of the whole ShadowHand step at P=35 (measured
    # 2.2M vs 5.4M env-steps/s). Matrix-free application in the sweeps
    # is two skinny (P, nv, N) contractions; only the diagonal is
    # precomputed.
    diag = jnp.sum((J_s * X).astype(jnp.float32), 1) + 1e-9   # (R, N)
    del J, J_s
    return dict(mode="X", J_c=J_c, sup=sup_idx, X=X, diag=diag,
                share=share, mu=mu_j, P=P, fidx=fidx, nv=model.nv,
                dirs=dirs, cpt=cpt, row_links_a=tuple(row_links_a),
                row_links_b=tuple(row_links_b))


def contact_pairs_impulse_apply(payload, v, depth, dt, beta=0.2,
                                max_bias=1.0, iters=4, slop=0.0,
                                warm=None, return_warm=False):
    """Cheap per-substep half of ``contact_pairs_impulse``: speculative
    targets from the CURRENT depth, projected mass-splitting Jacobi
    sweeps against the prepared Jacobian/solve, applied to the CURRENT
    (predicted post-substep) velocity.

    ``warm`` optionally carries the previous substep's ``(lam, w)``
    (returned with ``return_warm=True``): within a control step the
    geometry payload is shared and depth/velocity move O(h), so the
    previous solution is an excellent initial iterate — the warm-started
    substep converges in fewer sweeps (the PhysX TGS warm-start
    semantics), each saved sweep being one full (P, nv, N) X read. The
    first residual of a warm start costs one extra J.w reduce (w != 0),
    which is why the cold start keeps its lam = 0 shortcut."""
    mode = payload.get("mode", "X")
    diag = payload["diag"]
    mu = payload.get("mu")
    fidx = payload.get("fidx")
    vT = jnp.asarray(v).T                                 # (nv, N)
    if mode == "Y":
        groups, invD = payload["groups"], payload["invD"]
        R, n = diag.shape
        P = payload["P"]

        def rows_dot(mat_key, x):
            """(J or Y) @ x assembled over the closure groups: each
            group reads only its compact (g, K, N) factor and the K
            gathered x rows (static indices, VMEM-resident)."""
            out = jnp.zeros((R, n))
            for rows, dofs, Yg, Jg in groups:
                G = Jg if mat_key == "J" else Yg
                xg = x[jnp.asarray(dofs)]                 # (K, N)
                out = out.at[jnp.asarray(rows)].set(
                    jnp.sum(G * xg[None], 1).astype(jnp.float32))
            return out

        v_n0 = rows_dot("J", vT)                          # (R, N) f32
    else:
        J_c, sup, X = payload["J_c"], payload["sup"], payload["X"]
        R, _k, n = J_c.shape
        P = payload.get("P", R)                      # pairs (R = P + 2F)
        # J.x contractions read the support-compacted Jacobian (see
        # prepare); the gathered x rows use static indices and stay in
        # VMEM. With sup=None (near-full support) this is the plain
        # full-row reduce (take(None-idx) degenerates to x itself).
        if sup is not None:
            sup_j = jnp.asarray(sup)
            J_dot = lambda x: jnp.sum(J_c * jnp.take(x, sup_j, axis=0),
                                      1)
        else:
            J_dot = lambda x: jnp.sum(J_c * x[None], 1)
        v_n0 = J_dot(vT)                                  # (R, N) f32

    over = depth - jnp.broadcast_to(
        jnp.asarray(slop, jnp.float32).reshape(-1, 1), depth.shape) \
        if jnp.asarray(slop).ndim <= 1 else depth - jnp.asarray(slop)
    # SPECULATIVE contact targets (PhysX's speculative CCD at the
    # velocity level): not-yet-touching pairs may approach, but only
    # fast enough to reach `slop` by the end of this substep —
    # v_n >= (depth - slop)/dt (negative = allowed approach). Without
    # this, a clamped-velocity servo punch (25 rad/s * 0.09 m lever =
    # 2.2 m/s tip speed) sinks ~18 mm in the one substep before a
    # touch-activated constraint could engage (measured). Already-
    # penetrated pairs push out at the gentler Baumgarte rate. Pairs
    # gated off by geometry (depth sentinel -1) get a -100 m/s-class
    # target that never binds, so no separate active mask is needed —
    # the lambda >= 0 projection keeps them at zero.
    v_tgt = jnp.where(over > 0.0,
                      jnp.minimum(beta * over / dt, max_bias),
                      over / dt)
    if mu is not None:
        # Tangential rows target zero slip velocity, no bias.
        v_tgt = jnp.concatenate([v_tgt, jnp.zeros((R - P, n))], 0)
    rhs = v_tgt - v_n0                                    # (R, N)
    # Projected Jacobi with MASS-SPLITTING relaxation (Tonge et al.'s
    # parallel-contact construction): each pair's correction is divided
    # by the number of currently-binding pairs that share a body with
    # it. Plain under-relaxed Jacobi diverges on redundant contact sets
    # — e.g. 8 cube corners pressing the same light body along one
    # normal give a coupling row-sum of ~deg/m_cube against a diagonal
    # of ~1/m_cube, and the lambda >= 0 projection turns the divergence
    # into chaotic under-resolution. Sequential Gauss-Seidel resolves
    # redundancy naturally but is a non-starter here: the unrolled
    # P*iters*P dependent chain measured 722k vs 3.96M env-steps/s
    # (5.5x) at 16k envs AND blew the compile up by minutes. The
    # degree-scaled sweep keeps every iteration a handful of fused
    # env-last ops (the share mask is static, built in prepare).
    if warm is None:
        lam = jnp.zeros((R, n))
        w = None                                          # X lam = 0
    else:
        lam, w = warm
    # Binding state per PAIR: a normal row binds when it wants impulse
    # (rhs > 0) or is carrying a warm-started one (lam > 0 — which must
    # be allowed to DECAY when the target is satisfied, or a carried
    # impulse would keep pushing forever). Friction rows inherit their
    # pair's binding state.
    bind = ((rhs[:P] > 0.0) | (lam[:P] > 0.0)).astype(jnp.float32)
    deg = _fold(payload["share"], bind)                   # (P, N)
    omega = bind / jnp.maximum(deg, 1.0)
    if mu is not None:
        om_f = omega[jnp.asarray(fidx)]                   # (F, N)
        omega = jnp.concatenate([omega, om_f, om_f], 0)
    # Each iteration updates lam from the residual at the CURRENT w =
    # X lam, then refreshes w — the same Jacobi sequence as the
    # textbook "w first, then update" ordering, but the final w IS the
    # velocity correction, saving the separate dv = X lam read, and the
    # first residual is rhs exactly (lam = 0), saving the first J_s.w
    # reduce: 7 (P, nv, N)-tensor sweeps per call instead of 9.
    for _ in range(iters):
        if w is None:
            resid = rhs                                   # (R, N)
        elif mode == "Y":
            # (J M^-1 J^T lam)_r = Y_r . (D^-1 u) with u = sum lam Y —
            # two compact group passes instead of a dense X read.
            resid = rhs - rows_dot("Y", w * invD)
        else:
            resid = rhs - J_dot(w)
        lam = lam + omega * resid / diag
        if mu is None:
            lam = jnp.maximum(lam, 0.0)
        else:
            # Project: normals to the positive cone, tangentials to the
            # Coulomb box |lam_t| <= mu lam_n (per friction pair, both
            # axes — box-projected PGS friction).
            lam_n = jnp.maximum(lam[:P], 0.0)
            cap = mu * lam_n[jnp.asarray(fidx)]           # (F, N)
            cap2 = jnp.tile(cap, (2, 1))
            lam_t = jnp.clip(lam[P:], -cap2, cap2)
            lam = jnp.concatenate([lam_n, lam_t], 0)
        # The barrier stops XLA fusing this reduce into its consumers,
        # which recomputes it per consumer row — R x the bytes
        # (measured 1.67 ms/sweep, 42 GB/s effective, 32% of the whole
        # ShadowHand step on the dense path).
        if mode == "Y":
            u = jnp.zeros((payload["nv"], n))
            for rows, dofs, Yg, _ in groups:
                lg = lam[jnp.asarray(rows)]               # (g, N)
                u = u.at[jnp.asarray(dofs)].add(
                    jnp.sum(Yg * lg[:, None, :], 0).astype(jnp.float32))
            w = jax.lax.optimization_barrier(u)           # u = L^-T J^T lam
        else:
            w = jax.lax.optimization_barrier(
                jnp.sum(X * lam[:, None, :], 0))          # (nv, N) f32
    if mode == "Y":
        # dv = M^-1 J^T lam = L^-1 (D^-1 u): ONE cheap full down-pass
        # on (N,)-rows per call (ltdl_downsolve) — the only place the
        # dense subtree fill ever materializes.
        z = w * invD
        dv = jnp.stack(ltdl_downsolve(
            payload["chains"], payload["H"],
            [z[k] for k in range(payload["nv"])]), 0)
        v_out = (vT + dv).T
    else:
        v_out = (vT + w).T
    return (v_out, (lam, w)) if return_warm else v_out


def impulse_row_forces(payload, lam, dt):
    """World-frame contact force of every prepared row, (R, 3, N):
    ``dirs * lam / dt``. Row r's force acts ON ``payload['row_links_a'][r]``
    and its reaction ON ``payload['row_links_b'][r]``; row contact points
    are ``payload['cpt']``. Force-sensor readers select rows by link via
    the payload's own layout instead of re-deriving the tangent basis
    and row offsets by hand (round-4 ADVICE: the hand-derived version
    silently corrupted if fric_pairs or the basis changed)."""
    return payload["dirs"].astype(jnp.float32) * (lam / dt)[:, None]


def impulse_generalized_force(payload, lam, dt):
    """Generalized contact force of the solved rows, (nv, N):
    tau = J^T lam / dt, assembled from the payload's own Jacobian
    factors (both Delassus modes). Used by dof-force sensor obs."""
    if payload.get("mode", "X") == "Y":
        nv = payload["nv"]
        n = lam.shape[-1]
        tau = jnp.zeros((nv, n))
        for rows, dofs, _Yg, Jg in payload["groups"]:
            lg = lam[jnp.asarray(rows)]                   # (g, N)
            tau = tau.at[jnp.asarray(dofs)].add(
                jnp.sum(Jg * lg[:, None, :], 0).astype(jnp.float32))
        return tau / dt
    J_c, sup = payload["J_c"], payload["sup"]
    R, K, n = J_c.shape
    contrib = (J_c * lam[:, None, :]).astype(jnp.float32)  # (R, K, N)
    if sup is None:
        return jnp.sum(contrib, 0) / dt
    nv = payload["nv"]
    return jnp.zeros((nv, n)).at[
        jnp.asarray(sup).reshape(-1)].add(
        contrib.reshape(R * K, n)) / dt


def sphere_sphere_impulse(model: ArticulatedModel, kin, factor, v,
                          params: DynParams, links_a, offsets_a, radii_a,
                          links_b, offsets_b, radii_b, dt,
                          beta=0.2, max_bias=1.0, iters=4, slop=0.0):
    """``contact_pairs_impulse`` over P sphere-sphere pairs, computing
    the center-line geometry via ``_sphere_pair_geometry`` (same input
    conventions as ``sphere_sphere_pairs_forces``)."""
    (_g_a, _g_b, _R_a, _p_a, _v_a, _R_b, _p_b, _v_b, _r_a, _r_b,
     n_w, depth, contact_pt) = _sphere_pair_geometry(
        model, kin, params, links_a, offsets_a, radii_a,
        links_b, offsets_b, radii_b)
    return contact_pairs_impulse(model, kin, factor, v, links_a, links_b,
                                 n_w, depth, contact_pt, dt, beta=beta,
                                 max_bias=max_bias, iters=iters,
                                 slop=slop)


def sphere_sphere_pairs_forces(model: ArticulatedModel, kin,
                               params: DynParams, links_a, offsets_a,
                               radii_a, links_b, offsets_b, radii_b,
                               mu=1.0, dt=1.0 / 60.0, tau=0.02,
                               zeta=1.0, return_geometry=False,
                               forces=True):
    """Penalty contacts between P pairs of spheres on (possibly the same)
    articulated body — e.g. ShadowHand finger-finger collisions, which
    the sphere/plane pair set cannot represent (before this, adjacent
    fingers could pass through each other; the reference gets
    finger-finger collision from PhysX's convex meshes,
    ig_env_wrappers.py:314-371 wraps that task unchanged).

    Same mass-adaptive normal/friction model and env-last batching as
    ``sphere_plane_pairs_forces``: one vectorized computation over all P
    pairs, wrench accumulation as static one-hot fold-matmuls, no
    scatters. The contact normal is the center-center direction (exact
    for spheres); coincident centers are guarded to a fixed axis with
    zero force (depth clamp keeps the force finite and the direction
    irrelevant at that measure-zero configuration).

    links_a/links_b: static (P,) ints. offsets_a/offsets_b: (P, 3)
    static or (P, 3, N) env-last, in each link's frame (scaled by
    params.scale like all contact offsets). radii: (P,) or (P, N).
    mu: scalar, (P,) or (P, N). Returns env-last (nb, 6, N) ((nb, 6)
    for single-env kin)."""
    single = kin.p_w.ndim == 2
    if single:
        kin = jax.tree_util.tree_map(lambda a: a[..., None], kin)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[None], params)
    n = kin.p_w.shape[-1]
    P = len(links_a)
    (g_a, g_b, R_a, p_a, v_a, R_b, p_b, v_b, r_a, r_b,
     n_w, depth, contact_pt) = _sphere_pair_geometry(
        model, kin, params, links_a, offsets_a, radii_a,
        links_b, offsets_b, radii_b)
    if not forces:
        # Geometry-only mode (see sphere_plane_pairs_forces).
        assert return_geometry and not single
        return None, (n_w, depth, contact_pt)
    mu_j = jnp.broadcast_to(
        jnp.asarray(mu, jnp.float32).reshape(-1, 1), (P, n)) \
        if jnp.asarray(mu).ndim <= 1 else jnp.asarray(mu, jnp.float32)

    def point_vel(R, p, v6, pt):
        w = _mv(R, v6[:, :3])
        vl = _mv(R, v6[:, 3:])
        return vl + _cross(w, pt - p)

    v_rel = point_vel(R_a, p_a, v_a, contact_pt) - \
        point_vel(R_b, p_b, v_b, contact_pt)
    v_n = jnp.sum(v_rel * n_w, 1)
    mass = jnp.asarray(params.mass).T                          # (nb, N)
    m_a = _fold(g_a, mass)
    m_b = _fold(g_b, mass)
    m_eff = 1.0 / (1.0 / m_a + 1.0 / jnp.maximum(m_b, 1e-6))
    f_n_mag = m_eff * (depth / tau ** 2 + 2.0 * zeta * (-v_n) / tau)
    f_n_mag = jnp.where(depth > 0, jnp.maximum(f_n_mag, 0.0), 0.0)
    v_t = v_rel - v_n[:, None, :] * n_w
    v_t_norm = jnp.sqrt(jnp.sum(v_t * v_t, 1)) + 1e-8
    inertia = jnp.moveaxis(jnp.asarray(params.inertia), 0, -1)  # (nb,3,N)
    i_mean = _fold(g_a, jnp.mean(inertia, 1)) + 1e-8
    i_mean_b = _fold(g_b, jnp.mean(inertia, 1)) + 1e-8
    # True moment arms on both bodies (see sphere_plane_pair_forces).
    arm_a = jnp.sum((contact_pt - p_a) ** 2, 1)
    arm_b = jnp.sum((contact_pt - p_b) ** 2, 1)
    m_eff_t = 1.0 / (1.0 / m_a + 1.0 / m_b
                     + arm_a / i_mean + arm_b / i_mean_b)
    cap = jnp.minimum(mu_j * f_n_mag, m_eff_t * v_t_norm / dt)
    f_t = -v_t / v_t_norm[:, None, :] * cap[:, None, :]
    force = n_w * f_n_mag[:, None, :] + f_t                   # on sphere a
    wr_a = jnp.concatenate([_cross(contact_pt - p_a, force), force], 1)
    wr_b = jnp.concatenate([_cross(contact_pt - p_b, -force), -force], 1)
    out = _fold(g_a.T, wr_a) + _fold(g_b.T, wr_b)
    if return_geometry:
        return out, (n_w, depth, contact_pt)
    return out[..., 0] if single else out


def ground_contact_forces(model: ArticulatedModel, kin, params: DynParams,
                          dt=1.0 / 60.0, tau=0.02, zeta=1.0):
    """World-frame external spatial forces (nb, 6, N) from plane contacts
    (env-last; single-env kinematics give (nb, 6)).

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
    single = kin.p_w.ndim == 2
    if single:
        kin = jax.tree_util.tree_map(lambda a: a[..., None], kin)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[None], params)
    n = kin.p_w.shape[-1]
    links, offsets, radii, geom_ids = contact_points(model)
    P = links.shape[0]
    if P == 0:
        out = jnp.zeros((model.nb, 6, n))
        return out[..., 0] if single else out
    scale = jnp.broadcast_to(jnp.asarray(params.scale), (n,))
    offsets_j = jnp.asarray(offsets, jnp.float32)[:, :, None] * scale
    radii_j = jnp.asarray(radii, jnp.float32)[:, None] * scale  # (P, N)
    mu = jnp.asarray(params.contact_friction).T[geom_ids]       # (P, N)

    gather = np.zeros((P, model.nb), np.float32)
    gather[np.arange(P), links] = 1.0
    R = _fold(gather, kin.R_w)
    p0 = _fold(gather, kin.p_w)
    v_link = _fold(gather, kin.v)
    centers = p0 + _mv(R, offsets_j)
    # Forces act at the sphere surface touching the plane, not the center —
    # the lever arm below the COM is what converts sliding into rolling.
    pts = centers.at[:, 2].add(-radii_j)
    # Point velocity: v_link is [w; vl] in body coords at link origin.
    w_world = _mv(R, v_link[:, :3])
    v_world = _mv(R, v_link[:, 3:])
    arm = pts - p0
    v_pt = v_world + _cross(w_world, arm)

    # Per-point effective masses (link-local approximation).
    mass = jnp.asarray(params.mass).T                           # (nb, N)
    m_link = mass[links]                                        # (P, N)
    inertia = jnp.moveaxis(jnp.asarray(params.inertia), 0, -1)  # (nb,3,N)
    i_mean = jnp.mean(inertia[links], 1) * scale ** 2           # (P, N)
    arm_sq = jnp.sum(arm * arm, 1)
    m_eff_n = m_link
    m_eff_t = 1.0 / (1.0 / m_link + arm_sq / (i_mean + 1e-8))

    depth = radii_j - centers[:, 2]
    depth_dot = -v_pt[:, 2]
    f_n = m_eff_n * (depth / tau ** 2 + 2.0 * zeta * depth_dot / tau)
    f_n = jnp.where(depth > 0, jnp.maximum(f_n, 0.0), 0.0)
    v_t = v_pt.at[:, 2].set(0.0)
    v_t_norm = jnp.sqrt(jnp.sum(v_t * v_t, 1)) + 1e-8
    cap = jnp.minimum(mu * f_n, m_eff_t * v_t_norm / dt)
    f_t = -v_t / v_t_norm[:, None] * cap[:, None]
    force = f_t.at[:, 2].set(f_n)       # (P, 3, N) world force at pts
    torque = _cross(arm, force)         # about link origin, world frame
    wrench = jnp.concatenate([torque, force], 1)                # (P, 6, N)
    out = _fold(gather.T, wrench)
    return out[..., 0] if single else out
