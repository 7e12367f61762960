"""BallBalance task: keep a ball centered on a tray carried by a
three-legged table robot.

The reference wraps Isaac Gym's closed-source BallBalance
(``/root/reference/bayes_sim_ig/sim/ig_env_wrappers.py:128-158``). Rebuilt
as two mechanisms in one model:

  * ``bbot``: a free-base tray with three two-segment legs (upper + lower
    revolute joints, 6 dofs total) whose feet touch the ground — a
    tree-structured stand-in for IG's leg assembly (the PhysX version's
    exact linkage is closed-source). Actions (3) drive the lower leg
    joints; pushing against the ground tilts the tray.
  * ``ball``: a free body resting on the tray via a sphere-vs-body-plane
    pair contact.

DR layout matches the reference cfg/ball_balance.yaml: actor 'ball' with
one mass multiplier, then actor 'bbot' with 6 additive dof-friction dims —
the 7-dim realParams vector. (Note: the reference's own ball_balance.yaml
places realParams under ``task:`` where its loader reads ``env:`` — our
loader accepts both.)

Obs (24): ball pos rel tray center in tray frame (3), ball vel (3), tray
up vector (3), tray angular vel (3), leg dof pos (6), leg dof vel (6).
Reward: IG-style products of closeness terms; termination when the ball
falls off.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..dr import TaskNames, build_params_spec
from ..physics import (
    ArticulatedModel, LinkSpec, Geom, DynParams,
    forward_kinematics, forward_dynamics, integrate,
    carried_mass_factor, clamp_limits,
    ground_contact_forces,
)
from ..physics.contact import sphere_plane_pair_forces
from ..physics.spatial import quat_to_rot
from .task import Task

TRAY_R = 0.5          # tray half-extent
TRAY_H = 0.7          # nominal tray height
BALL_R = 0.1
LEG_ANGLES = [0.0, 2.0 * np.pi / 3.0, 4.0 * np.pi / 3.0]


def build_bbot_model() -> ArticulatedModel:
    links = [LinkSpec("tray", parent=-1, joint_type="free", mass=3.0,
                      inertia=(0.15, 0.15, 0.3))]
    geoms = []
    for i, ang in enumerate(LEG_ANGLES):
        dx, dy = np.cos(ang), np.sin(ang)
        tangent = (-dy, dx, 0.0)
        upper = len(links)
        links.append(LinkSpec(
            f"upper_leg{i}", parent=0, joint_type="revolute",
            joint_axis=tangent,
            joint_pos=(0.4 * dx, 0.4 * dy, -0.02),
            mass=0.3, com=(0.0, 0.0, -0.15),
            inertia=(0.003, 0.003, 0.001), damping=2.0,
            limit_lower=-0.7, limit_upper=0.7, effort=20.0))
        lower = len(links)
        links.append(LinkSpec(
            f"lower_leg{i}", parent=upper, joint_type="revolute",
            joint_axis=tangent,
            joint_pos=(0.0, 0.0, -0.3),
            mass=0.3, com=(0.0, 0.0, -0.18),
            inertia=(0.004, 0.004, 0.001), damping=2.0,
            limit_lower=-0.9, limit_upper=0.9, effort=20.0))
        geoms.append(Geom(link=lower, kind="sphere", size=(0.05,),
                          offset=(0.0, 0.0, -0.36)))
    ball = len(links)
    links.append(LinkSpec("ball", parent=-1, joint_type="free", mass=0.5,
                          inertia=(0.002, 0.002, 0.002)))
    geoms.append(Geom(link=ball, kind="sphere", size=(BALL_R,)))
    return ArticulatedModel(links, geoms, fixed_base=False)


class BBotState(NamedTuple):
    q: jnp.ndarray
    v: jnp.ndarray


class BallBalance(Task):
    name = "BallBalance"
    obs_dim = 24
    act_dim = 3
    dt = 1.0 / 60.0
    substeps = 2

    def __init__(self, cfg):
        env_cfg = cfg["env"]
        self.num_envs = int(env_cfg["numEnvs"])
        self.max_episode_length = int(env_cfg.get("episodeLength", 500))
        self.model = build_bbot_model()
        m = self.model
        self._ball_idx = m.link_index["ball"]
        self._leg_links = [i for i in range(m.nb)
                           if m.joint_types[i] == "revolute"]
        self._leg_v_idx = [m.v_off[i] for i in self._leg_links]
        self._leg_q_idx = [m.q_off[i] for i in self._leg_links]
        # DR spec: actor 'ball' (mass), then 'bbot' (dof friction), in the
        # config's actor order (defines the flat layout).
        dof_names = []
        for i in range(3):
            dof_names += [f"upper_leg_joint{i}", f"lower_leg_joint{i}"]
        self.params_spec = build_params_spec(
            cfg["task"]["randomization_params"],
            actor_names_map={
                "ball": TaskNames(body_names=["ball"],
                                  shape_names=["ball"], dof_names=[],
                                  tendon_names=[]),
                "bbot": TaskNames(
                    body_names=[m.body_names[i] for i in range(7)],
                    shape_names=[m.body_names[i] for i in range(7)],
                    dof_names=dof_names, tendon_names=[]),
            },
            defaults_map={
                "ball": {"rigid_body_properties": {
                    "mass": np.array([0.5])}},
                "bbot": {"dof_properties": {
                    "friction": np.zeros(6), "stiffness": np.zeros(6),
                    "damping": np.zeros(6)}},
            },
            plot_names_skip_patterns=cfg["task"].get(
                "plotNamesSkipPatterns"))
        self._ball_mass_dims = [
            i for i, k in enumerate(self.params_spec.keys)
            if k[0] == "ball" and k[3] == "mass"]
        self._fric_dims = [
            i for i, k in enumerate(self.params_spec.keys)
            if k[0] == "bbot" and k[3] == "friction"]
        self.setup_noise(cfg["task"]["randomization_params"])
        # Whole-actor geometry scale DR (apply_randomizations.py:174-189).
        self._scale_dims = self.params_spec.indices_of("scale", "")

    # ------------------------------------------------------------------ #
    def _dyn_params(self, params_row) -> DynParams:
        m = self.model
        base = DynParams.defaults(m)
        mass = base.mass
        if self._ball_mass_dims:
            mass = base.mass.at[self._ball_idx].mul(
                params_row[self._ball_mass_dims[0]])
        inertia = base.inertia * (mass / base.mass)[:, None]
        friction = base.friction
        if self._fric_dims:
            friction = base.friction.at[jnp.asarray(self._leg_v_idx)].add(
                params_row[jnp.asarray(self._fric_dims)])
        scale = base.scale
        if self._scale_dims:
            scale = params_row[self._scale_dims[0]]
        return base._replace(mass=mass, inertia=inertia, friction=friction,
                             scale=scale)

    def init_state(self, key, params):
        n = params.shape[0]
        m = self.model
        q0 = jnp.asarray(m.neutral_q(), jnp.float32)
        q0 = q0.at[2].set(TRAY_H)  # tray
        bq = m.q_off[self._ball_idx]
        q0 = q0.at[bq + 2].set(TRAY_H + 0.02 + BALL_R)
        k1, k2 = jax.random.split(key)
        ball_xy = jax.random.uniform(k1, (n, 2), minval=-0.15,
                                     maxval=0.15)
        q = jnp.tile(q0, (n, 1))
        q = q.at[:, bq:bq + 2].set(ball_xy)
        v = jnp.zeros((n, m.nv))
        ball_v = jax.random.uniform(k2, (n, 2), minval=-0.2, maxval=0.2)
        bv = m.v_off[self._ball_idx]
        v = v.at[:, bv + 3:bv + 5].set(ball_v)
        return BBotState(q=q, v=v)

    def physics_step(self, state, actions, params, key):
        # Natively batched engine call (dynamics.py) — no vmap.
        m = self.model
        dp = jax.vmap(self._dyn_params)(params)
        h = self.dt / self.substeps
        # Actions drive the three lower-leg joints.
        lower_v = jnp.asarray([self._leg_v_idx[2 * i + 1]
                               for i in range(3)])
        tau = jnp.zeros((actions.shape[0], m.nv)).at[:, lower_v].set(
            jnp.clip(actions, -1, 1) * 20.0)

        def substep(carry, _):
            q, v, factor = carry
            kin = forward_kinematics(m, q, v, dp)
            f_ext = ground_contact_forces(m, kin, dp, dt=h)
            f_ext = f_ext + sphere_plane_pair_forces(
                m, kin, dp, sphere_link=self._ball_idx,
                sphere_offset=(0, 0, 0), radius=BALL_R,
                plane_link=0, plane_point=(0, 0, 0.02),
                plane_normal=(0, 0, 1), mu=1.0, dt=h,
                plane_halfsize=TRAY_R)
            qdd, _, factor = forward_dynamics(
                m, q, v, tau, dp, f_ext, dt=h, kin=kin,
                factor=carried_mass_factor(factor), return_factor=True)
            q, v = integrate(m, q, v, qdd, h)
            q, v = clamp_limits(m, q, v)
            return (q, v, factor), None

        # Unrolled substep loop: a nested lax.scan would add one more
        # while-loop level, and each loop iteration carries a large fixed
        # dispatch cost on this runtime (measured ~0.4 ms) — unrolling two
        # substeps into the step graph is strictly cheaper. The carried
        # factor enables the opt-in frozen-mass substep scheme
        # (BSIM_FROZEN_MASS=1; measured slower here, dynamics.py).
        carry = (state.q, state.v, None)
        for _ in range(self.substeps):
            carry, _ = substep(carry, None)
        q, v, _ = carry
        return BBotState(q=q, v=v)

    def _ball_rel(self, state):
        m = self.model
        bq = m.q_off[self._ball_idx]
        tray_R = jax.vmap(quat_to_rot)(state.q[:, 3:7])
        rel_w = state.q[:, bq:bq + 3] - state.q[:, 0:3]
        rel_tray = jnp.einsum("nij,ni->nj", tray_R, rel_w)  # R^T @ rel
        return rel_tray

    def observe(self, state, params):
        m = self.model
        bv = m.v_off[self._ball_idx]
        rel = self._ball_rel(state)
        ball_R = jax.vmap(quat_to_rot)(
            state.q[:, m.q_off[self._ball_idx] + 3:
                    m.q_off[self._ball_idx] + 7])
        ball_vel = jnp.einsum("nij,nj->ni", ball_R,
                              state.v[:, bv + 3:bv + 6])
        tray_R = jax.vmap(quat_to_rot)(state.q[:, 3:7])
        tray_up = tray_R[:, :, 2]
        tray_w = jnp.einsum("nij,nj->ni", tray_R, state.v[:, 0:3])
        leg_pos = state.q[:, jnp.asarray(self._leg_q_idx)]
        leg_vel = state.v[:, jnp.asarray(self._leg_v_idx)]
        return jnp.concatenate([rel, ball_vel, tray_up, tray_w,
                                leg_pos, leg_vel], axis=-1)

    def reward(self, state, actions, params):
        m = self.model
        bv = m.v_off[self._ball_idx]
        rel = self._ball_rel(state)
        dist = jnp.linalg.norm(rel[:, :2], axis=-1)
        speed = jnp.linalg.norm(state.v[:, bv + 3:bv + 6], axis=-1)
        pos_reward = 1.0 / (1.0 + dist ** 2 * 10.0)
        speed_reward = 1.0 / (1.0 + speed ** 2)
        rew = pos_reward + pos_reward * speed_reward
        return jnp.where(self._fallen(state), -2.0, rew)

    def _fallen(self, state):
        m = self.model
        bq = m.q_off[self._ball_idx]
        ball_z = state.q[:, bq + 2]
        tray_z = state.q[:, 2]
        rel = self._ball_rel(state)
        off_tray = jnp.linalg.norm(rel[:, :2], axis=-1) > TRAY_R
        return off_tray | (ball_z < tray_z - 0.1) | (tray_z < 0.3)

    def early_termination(self, state, params):
        return self._fallen(state)

    def render_obs_frame(self, obs_row, height=200, width=200):
        """Top-down schematic from one observation row (reference surface:
        task.get_img feeds RealSurrogate/video): tray disc, the ball at
        its tray-frame offset, and a tilt arrow from the tray up-vector's
        horizontal components."""
        obs = np.asarray(obs_row, np.float64)
        rel = obs[0:3]          # ball rel tray center, tray frame
        tray_up = obs[6:9]
        img = np.full((height, width, 3), 255, np.uint8)
        cx, cy = width // 2, height // 2
        r_tray = int(0.42 * min(height, width))
        yy, xx = np.ogrid[:height, :width]
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        img[d2 <= r_tray * r_tray] = (229, 229, 229)
        ring = (d2 <= r_tray * r_tray) & (d2 >= (r_tray - 2) ** 2)
        img[ring] = (120, 120, 120)
        # Tilt arrow: where the tray normal leans.
        tx = cx + int(3.0 * r_tray * tray_up[0])
        ty = cy - int(3.0 * r_tray * tray_up[1])
        n = max(abs(tx - cx), abs(ty - cy), 1)
        xs = np.linspace(cx, tx, n).astype(int)
        ys = np.linspace(cy, ty, n).astype(int)
        img[np.clip(ys, 0, height - 1), np.clip(xs, 0, width - 1)] = \
            (77, 121, 204)
        # Ball: position scaled by the tray radius, green when centered,
        # red toward the rim.
        bx = cx + int(r_tray * np.clip(rel[0] / TRAY_R, -1.2, 1.2))
        by = cy - int(r_tray * np.clip(rel[1] / TRAY_R, -1.2, 1.2))
        frac = float(np.clip(np.hypot(rel[0], rel[1]) / TRAY_R, 0, 1))
        color = (int(60 + 160 * frac), int(170 - 120 * frac), 60)
        rb = max(4, int(r_tray * BALL_R / TRAY_R))
        mask = (xx - bx) ** 2 + (yy - by) ** 2 <= rb * rb
        img[mask] = color
        return img
