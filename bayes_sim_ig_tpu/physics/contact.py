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
from .dynamics import mass_factor_solve

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
    m_eff_t = 1.0 / (1.0 / m_s + r_scaled ** 2 / i_mean)
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
                              plane_halfsizes=None):
    """Vectorized form of ``sphere_plane_pair_forces`` over P pairs at
    once — ONE set of tensor ops instead of P separate calls (ShadowHand
    has 38 pairs per substep; separate calls blow the per-step HLO to
    ~100 s CPU compiles and pay P x the kernel launches).

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
    active = depth > 0
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
        active = active & (jnp.max(l_t, 1) < hs)
    f_n_mag = jnp.where(active, jnp.maximum(f_n_mag, 0.0), 0.0)
    v_t = v_rel - v_n[:, None, :] * n_w
    v_t_norm = jnp.sqrt(jnp.sum(v_t * v_t, 1)) + 1e-8
    inertia = jnp.moveaxis(jnp.asarray(params.inertia), 0, -1)  # (nb,3,N)
    i_mean = _fold(g_s, jnp.mean(inertia, 1)) + 1e-8
    m_eff_t = 1.0 / (1.0 / m_s + radii_j ** 2 / i_mean)
    cap = jnp.minimum(mu_j * f_n_mag, m_eff_t * v_t_norm / dt)
    f_t = -v_t / v_t_norm[:, None, :] * cap[:, None, :]
    force = n_w * f_n_mag[:, None, :] + f_t                    # on spheres
    wr_s = jnp.concatenate([_cross(contact_pt - p_s, force), force], 1)
    wr_p = jnp.concatenate([_cross(contact_pt - p_p, -force), -force], 1)
    out = _fold(g_s.T, wr_s) + _fold(g_p.T, wr_p)
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


def sphere_sphere_impulse(model: ArticulatedModel, kin, factor, v,
                          params: DynParams, links_a, offsets_a, radii_a,
                          links_b, offsets_b, radii_b, dt,
                          beta=0.2, max_bias=1.0, iters=8):
    """Velocity-level (constraint-based) resolution of P sphere-sphere
    contact pairs: returns the generalized velocity ``v`` (N, nv) with
    non-penetration impulses applied.

    Why impulses and not a stiffer penalty: a position drive can press
    two light links together with a force (servo effort / lever arm, ~7 N
    for ShadowHand abduction) that no explicitly-stable penalty spring
    referenced to the links' ~0.01 kg effective mass can statically
    support at small penetration — the explicit stability bound
    k <= 4 m_eff / h^2 caps the static force at ~m_eff * d * 4/h^2,
    orders of magnitude short, so driven fingers crossed straight through
    each other (round-3 probe). PhysX resolves exactly this with its
    velocity-level TGS/PGS solver; this is the same construction on the
    engine's own machinery:

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
      contact LCP with a clamped Baumgarte bias beta*depth/dt
      (<= max_bias, PhysX's maxDepenetrationVelocity analogue).

    Normal-only: tangential friction stays with the explicit penalty pass
    (``sphere_sphere_pairs_forces``), which also supplies gentle-contact
    restoring forces; the impulse only adds what the penalty cannot.
    Batched env-last only (v (N, nv), factor from a batched
    forward_dynamics call)."""
    n = kin.p_w.shape[-1]
    P = len(links_a)
    (_g_a, _g_b, _R_a, _p_a, _v_a, _R_b, _p_b, _v_b, _r_a, _r_b,
     n_w, depth, contact_pt) = _sphere_pair_geometry(
        model, kin, params, links_a, offsets_a, radii_a,
        links_b, offsets_b, radii_b)

    anc = np.asarray(model.anc_dof)                       # (nb, nv)
    d_anc = (anc[np.asarray(links_a)]
             - anc[np.asarray(links_b)])                  # (P, nv) static
    S = kin.S_o                                           # (nv, 6, N)
    S_ang, S_lin = S[:, :3], S[:, 3:]
    r_pt = contact_pt - kin.o[None]                       # (P, 3, N)
    # n . (S_lin + S_ang x (pt-o)) = n . S_lin + S_ang . ((pt-o) x n).
    # All contractions below are explicit broadcast-multiply-sums over
    # the SHORT static axes with the env lanes trailing and untouched:
    # einsum/dot_general with a trailing batch dim relayouts the (P, nv,
    # N) operands to batch-leading, which alone cost more than the whole
    # physics step (measured 10x regression).
    rxn = _cross(r_pt, n_w)
    J = sum(n_w[:, None, x] * S_lin[None, :, x]
            + rxn[:, None, x] * S_ang[None, :, x]
            for x in range(3))                            # (P, nv, N)
    J = J * jnp.asarray(d_anc, jnp.float32)[:, :, None]

    vT = jnp.asarray(v).T                                 # (nv, N)
    v_n0 = jnp.sum(J * vT[None], 1)                       # (P, N)
    X = mass_factor_solve(model, factor, J)               # (P, nv, N)
    nv = J.shape[1]
    lam_mat = sum(J[:, None, m] * X[None, :, m]
                  for m in range(nv))                     # (P, P, N)

    active = (depth > 0.0).astype(jnp.float32)
    v_tgt = jnp.minimum(beta * jnp.maximum(depth, 0.0) / dt, max_bias)
    rhs = v_tgt - v_n0                                    # (P, N)
    inv_diag = active / (jnp.concatenate(
        [lam_mat[p, p][None] for p in range(P)], 0) + 1e-9)
    # Projected Jacobi with under-relaxation (omega balances the pair
    # coupling through shared fingers; Delassus here is near diagonally
    # dominant, and the fixed iteration count keeps the graph static).
    omega = 0.7
    lam = jnp.zeros((P, n))
    for _ in range(iters):
        resid = rhs - jnp.sum(lam_mat * lam[None], 1)     # (P, N)
        lam = jnp.maximum(lam + omega * inv_diag * resid, 0.0)
    dv = jnp.sum(X * lam[:, None, :], 0)                  # (nv, N)
    return (vT + dv).T


def sphere_sphere_pairs_forces(model: ArticulatedModel, kin,
                               params: DynParams, links_a, offsets_a,
                               radii_a, links_b, offsets_b, radii_b,
                               mu=1.0, dt=1.0 / 60.0, tau=0.02,
                               zeta=1.0):
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
    m_eff_t = 1.0 / (1.0 / m_a + 1.0 / m_b
                     + r_a ** 2 / i_mean + r_b ** 2 / i_mean_b)
    cap = jnp.minimum(mu_j * f_n_mag, m_eff_t * v_t_norm / dt)
    f_t = -v_t / v_t_norm[:, None, :] * cap[:, None, :]
    force = n_w * f_n_mag[:, None, :] + f_t                   # on sphere a
    wr_a = jnp.concatenate([_cross(contact_pt - p_a, force), force], 1)
    wr_b = jnp.concatenate([_cross(contact_pt - p_b, -force), -force], 1)
    out = _fold(g_a.T, wr_a) + _fold(g_b.T, wr_b)
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
