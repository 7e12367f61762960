"""FrankaCabinet: a 9-dof Panda arm opening a cabinet drawer.

The reference wraps Isaac Gym's closed-source FrankaCabinet
(``/root/reference/bayes_sim_ig/sim/ig_env_wrappers.py:161-196``). Rebuilt
as: a fixed-base 7-dof arm + 2 prismatic fingers (simplified Panda-like
kinematics), and a cabinet with one prismatic drawer. The drawer's handle
is a sphere; the two finger pads are body-attached contact planes, so
closing the fingers on the handle and pulling drags the drawer open
through real friction forces — no scripted attachment.

DR layout matches the reference cfg/franka_cabinet.yaml: actor 'franka'
with 10 body-mass multipliers (link0..7 + 2 fingers) and 9 dof-stiffness
scaling dims (the PD drive gains of the 7 arm + 2 finger joints — in IG,
dof_properties stiffness IS the position-drive gain, so randomizing it
changes the controller, reproduced here). 19 dims total.

Obs (23, IG layout): dof_pos scaled to [-1,1] (9), dof_vel*scale (9),
drawer_pos (1), drawer_vel (1), hand-to-handle vector (3). Actions (9):
position-target deltas * actionScale * dt. Reward uses the reference
config's scale constants (distReward, openReward, fingerDistReward,
actionPenalty).
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
)
from ..physics.contact import sphere_plane_pair_forces
from .task import Task

FRANKA_BODIES = [f"panda_link{i}" for i in range(8)] + \
    ["panda_leftfinger", "panda_rightfinger"]
FRANKA_DOFS = [f"panda_joint{i}" for i in range(1, 8)] + \
    ["panda_finger_joint1", "panda_finger_joint2"]
# Default PD gains: arm joints 400, fingers 800 (IG franka defaults);
# stiffness dims SCALE these.
ARM_KP, FINGER_KP = 400.0, 800.0
ARM_KD, FINGER_KD = 40.0, 40.0
DEFAULT_DOF = np.array([0.0, -0.5, 0.0, -2.0, 0.0, 2.0, 0.78, 0.035,
                        0.035], np.float32)
DRAWER_HANDLE_LOCAL = np.array([0.0, 0.0, 0.05])  # on the drawer link
HANDLE_R = 0.02


def build_model() -> ArticulatedModel:
    # Simplified Panda: alternating z/y axes, link lengths ~ the real arm.
    links = [LinkSpec("panda_link0", parent=-1, joint_type="fixed",
                      mass=3.0, inertia=(0.01,) * 3)]
    arm_spec = [
        # (axis, joint_pos (from parent), mass)
        ((0, 0, 1), (0.0, 0.0, 0.333), 3.0),   # joint1
        ((0, 1, 0), (0.0, 0.0, 0.0), 3.0),     # joint2
        ((0, 0, 1), (0.0, 0.0, 0.316), 2.5),   # joint3
        ((0, -1, 0), (0.0825, 0.0, 0.0), 2.5),  # joint4
        ((0, 0, 1), (-0.0825, 0.0, 0.384), 2.0),  # joint5
        ((0, -1, 0), (0.0, 0.0, 0.0), 1.5),    # joint6
        ((0, 0, -1), (0.088, 0.0, 0.107), 0.8),  # joint7 (hand)
    ]
    limits = [(-2.9, 2.9), (-1.76, 1.76), (-2.9, 2.9), (-3.07, -0.07),
              (-2.9, 2.9), (-0.02, 3.75), (-2.9, 2.9)]
    for i, ((ax, pos, mass), (lo, hi)) in enumerate(zip(arm_spec, limits)):
        links.append(LinkSpec(
            f"panda_link{i + 1}", parent=i, joint_type="revolute",
            joint_axis=ax, joint_pos=pos, mass=mass,
            com=(0, 0, 0.1), inertia=(0.02, 0.02, 0.01),
            damping=5.0, limit_lower=lo, limit_upper=hi, effort=87.0))
    hand = 7  # panda_link7
    for nm, sy in (("panda_leftfinger", 1.0), ("panda_rightfinger", -1.0)):
        links.append(LinkSpec(
            nm, parent=hand, joint_type="prismatic",
            joint_axis=(0, sy, 0), joint_pos=(0.0, 0.0, 0.107),
            mass=0.1, com=(0, 0, 0.02), inertia=(1e-4,) * 3,
            damping=5.0, limit_lower=0.0, limit_upper=0.04,
            effort=70.0))
    # Cabinet: fixed frame + prismatic drawer sliding in -x toward the arm.
    cab = len(links)
    links.append(LinkSpec("cabinet", parent=-1, joint_type="fixed",
                          joint_pos=(0.85, 0.0, 0.4), mass=20.0,
                          inertia=(0.5,) * 3))
    links.append(LinkSpec(
        "drawer_top", parent=cab, joint_type="prismatic",
        joint_axis=(-1, 0, 0), joint_pos=(0.0, 0.0, 0.1),
        mass=2.0, com=(0.0, 0.0, 0.0), inertia=(0.02, 0.02, 0.02),
        damping=20.0, limit_lower=0.0, limit_upper=0.4))
    return ArticulatedModel(links, geoms=[], fixed_base=True)


class FrankaState(NamedTuple):
    q: jnp.ndarray
    v: jnp.ndarray
    targets: jnp.ndarray  # (N, 9) PD position targets


class FrankaCabinet(Task):
    name = "FrankaCabinet"
    obs_dim = 23
    act_dim = 9
    dt = 1.0 / 60.0
    substeps = 2

    def __init__(self, cfg):
        env_cfg = cfg["env"]
        self.num_envs = int(env_cfg["numEnvs"])
        self.max_episode_length = int(env_cfg.get("episodeLength", 500))
        self.action_scale = float(env_cfg.get("actionScale", 7.5))
        self.dof_vel_scale = float(env_cfg.get("dofVelocityScale", 0.1))
        self.dist_reward_scale = float(env_cfg.get("distRewardScale", 1.5))
        self.open_reward_scale = float(env_cfg.get("openRewardScale", 4.0))
        self.finger_dist_reward_scale = float(
            env_cfg.get("fingerDistRewardScale", 10.0))
        self.action_penalty_scale = float(
            env_cfg.get("actionPenaltyScale", 0.01))
        self.model = build_model()
        m = self.model
        self._dof_links = [m.link_index[f"panda_link{i}"]
                           for i in range(1, 8)] + \
            [m.link_index["panda_leftfinger"],
             m.link_index["panda_rightfinger"]]
        self._dof_v = np.array([m.v_off[i] for i in self._dof_links])
        self._dof_q = np.array([m.q_off[i] for i in self._dof_links])
        self._drawer = m.link_index["drawer_top"]
        self._drawer_q = m.q_off[self._drawer]
        self._drawer_v = m.v_off[self._drawer]
        self._hand = m.link_index["panda_link7"]
        self._lf = m.link_index["panda_leftfinger"]
        self._rf = m.link_index["panda_rightfinger"]
        # numpy (not jnp): closure constants must inline as HLO literals
        # (jax.Array consts stall while-loop iterations on this runtime).
        self._limits_lo = np.asarray(
            [m.limit_lower[v] for v in self._dof_v], np.float32)
        self._limits_hi = np.asarray(
            [m.limit_upper[v] for v in self._dof_v], np.float32)
        self.params_spec = build_params_spec(
            cfg["task"]["randomization_params"],
            actor_names_map={"franka": TaskNames(
                body_names=FRANKA_BODIES, shape_names=FRANKA_BODIES,
                dof_names=FRANKA_DOFS, tendon_names=[])},
            defaults_map={"franka": {
                "rigid_body_properties": {"mass": np.array(
                    [m.mass0[m.link_index[b]] for b in FRANKA_BODIES])},
                "dof_properties": {"stiffness": np.ones(9)},
            }},
            plot_names_skip_patterns=cfg["task"].get(
                "plotNamesSkipPatterns"))
        self._mass_dims = self.params_spec.indices_of(
            "rigid_body_properties", "mass")
        self._stiff_dims = self.params_spec.indices_of(
            "dof_properties", "stiffness")
        self._franka_links = np.array(
            [m.link_index[b] for b in FRANKA_BODIES])
        self.setup_noise(cfg["task"]["randomization_params"])
        # Whole-actor geometry scale DR (apply_randomizations.py:174-189).
        self._scale_dims = self.params_spec.indices_of("scale", "")

    def _dyn_params(self, params_row) -> DynParams:
        base = DynParams.defaults(self.model)
        mass = base.mass
        if self._mass_dims:
            mult = params_row[jnp.asarray(self._mass_dims)]
            mass = base.mass.at[jnp.asarray(self._franka_links)].mul(mult)
        inertia = base.inertia * (mass / base.mass)[:, None]
        scale = base.scale
        if self._scale_dims:
            scale = params_row[self._scale_dims[0]]
        return base._replace(mass=mass, inertia=inertia, scale=scale)

    def _pd_gains(self, params_row):
        kp0 = jnp.asarray([ARM_KP] * 7 + [FINGER_KP] * 2)
        kd0 = jnp.asarray([ARM_KD] * 7 + [FINGER_KD] * 2)
        if self._stiff_dims:
            kp0 = kp0 * params_row[jnp.asarray(self._stiff_dims)]
        return kp0, kd0

    def init_state(self, key, params):
        n = params.shape[0]
        m = self.model
        q0 = jnp.asarray(m.neutral_q(), jnp.float32)
        q0 = q0.at[jnp.asarray(self._dof_q)].set(
            jnp.asarray(DEFAULT_DOF))
        k1, = jax.random.split(key, 1)
        q = jnp.tile(q0, (n, 1))
        jit = jax.random.uniform(k1, (n, 9), minval=-0.05, maxval=0.05)
        q = q.at[:, jnp.asarray(self._dof_q)].add(jit)
        v = jnp.zeros((n, m.nv))
        return FrankaState(q=q, v=v,
                           targets=jnp.tile(jnp.asarray(DEFAULT_DOF),
                                            (n, 1)))

    def _handle_world(self, kin):
        # kin fields are env-last: p_w (nb, 3, N), R_w (nb, 3, 3, N).
        local = jnp.asarray(DRAWER_HANDLE_LOCAL, jnp.float32)
        R = kin.R_w[self._drawer]
        return kin.p_w[self._drawer] + jnp.stack(
            [sum(R[i, k] * local[k] for k in range(3))
             for i in range(3)], 0)                       # (3, N)

    def physics_step(self, state, actions, params, key):
        # Natively batched engine call (dynamics.py) — no vmap.
        m = self.model
        dp = jax.vmap(self._dyn_params)(params)
        kp, kd = jax.vmap(self._pd_gains)(params)
        h = self.dt / self.substeps
        targets = jnp.clip(
            state.targets + jnp.clip(actions, -1, 1) * self.action_scale
            * self.dt, self._limits_lo, self._limits_hi)
        dof_v = jnp.asarray(self._dof_v)
        n = actions.shape[0]
        # PD drives are solved IMPLICITLY in forward_dynamics (the PhysX
        # drive semantics the reference's tasks run on): the explicit
        # tau-PD this task shipped with is unstable on the low-inertia
        # wrist/finger joints (h*kd/I >> 2) — the velocity clamp masked
        # it as joints that dither instead of tracking, leaving the
        # drawer unopenable for any policy (round-3 probe: commanded
        # poses missed by 0.3-0.8 rad; implicitly they track to <0.02).
        kp_dof = jnp.zeros((n, m.nv)).at[:, dof_v].set(kp)
        kd_dof = jnp.zeros((n, m.nv)).at[:, dof_v].set(kd)
        tgt_dof = jnp.zeros((n, m.nv)).at[:, dof_v].set(targets)
        zero_tau = jnp.zeros((n, m.nv))

        def substep(carry, _):
            q, v, factor = carry
            kin = forward_kinematics(m, q, v, dp)
            f_ext = jnp.zeros((m.nb, 6, q.shape[0]))  # env-last
            # Finger pads gripping the drawer handle: handle sphere vs
            # inward-facing finger planes.
            for link, sy in ((self._lf, -1.0), (self._rf, 1.0)):
                f_ext = f_ext + sphere_plane_pair_forces(
                    m, kin, dp, sphere_link=self._drawer,
                    sphere_offset=tuple(DRAWER_HANDLE_LOCAL),
                    radius=HANDLE_R, plane_link=link,
                    plane_point=(0.0, sy * 0.008, 0.045),
                    plane_normal=(0.0, sy, 0.0), mu=1.5, dt=h,
                    plane_halfsize=0.025)
            qdd, _, factor = forward_dynamics(
                m, q, v, zero_tau, dp, f_ext, dt=h, kin=kin,
                factor=carried_mass_factor(factor), return_factor=True,
                drive_kp=kp_dof, drive_kd=kd_dof, drive_target=tgt_dof,
                drive_effort=87.0)
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
        return FrankaState(q=q, v=v, targets=targets)

    def _hand_to_handle(self, state, params=None):
        # FK only reads params.scale, so the default (unbatched) DynParams
        # broadcast over the batched q/v. With whole-actor scale DR
        # configured, the sampled per-env scale must be used — otherwise
        # obs/reward geometry diverges from the dynamics that produced
        # the state (round-3 review finding). kin is env-last.
        dp = DynParams.defaults(self.model)
        if params is not None and self._scale_dims:
            dp = dp._replace(scale=params[:, self._scale_dims[0]])
        kin = forward_kinematics(self.model, state.q, state.v, dp)
        local = jnp.array([0.0, 0.0, 0.16])
        R = kin.R_w[self._hand]
        hand = kin.p_w[self._hand] + jnp.stack(
            [sum(R[i, k] * local[k] for k in range(3))
             for i in range(3)], 0)
        return (self._handle_world(kin) - hand).T         # (N, 3)

    def observe(self, state, params):
        dof_q = jnp.asarray(self._dof_q)
        dof_v = jnp.asarray(self._dof_v)
        pos = state.q[:, dof_q]
        pos_scaled = (2.0 * (pos - self._limits_lo)
                      / (self._limits_hi - self._limits_lo) - 1.0)
        vel = state.v[:, dof_v] * self.dof_vel_scale
        drawer_pos = state.q[:, self._drawer_q:self._drawer_q + 1]
        drawer_vel = state.v[:, self._drawer_v:self._drawer_v + 1]
        to_handle = self._hand_to_handle(state, params)
        return jnp.concatenate([pos_scaled, vel, drawer_pos, drawer_vel,
                                to_handle], axis=-1)

    def reward(self, state, actions, params):
        to_handle = self._hand_to_handle(state, params)
        d = jnp.linalg.norm(to_handle, axis=-1)
        dist_reward = 1.0 / (1.0 + d ** 2)
        drawer_open = state.q[:, self._drawer_q]
        finger_width = (state.q[:, self._dof_q[7]]
                        + state.q[:, self._dof_q[8]])
        around = jnp.where(d < 0.06, 0.04 - finger_width, 0.0)
        open_reward = drawer_open
        a = jnp.clip(actions, -1, 1)
        return (self.dist_reward_scale * dist_reward
                + self.finger_dist_reward_scale * around
                + self.open_reward_scale * open_reward
                - self.action_penalty_scale * jnp.sum(a ** 2, axis=-1))

    # ------------------------------------------------------------------ #
    def render_obs_frame(self, obs_row, height=200, width=300):
        """Side-view (x-z) schematic from one observation row for the
        RealSurrogate/video surface: cabinet box, drawer extension
        (obs[18] is the drawer joint position) and the gripper marker at
        handle - to_handle (obs[20:23]). Exceeds reference parity (the
        reference renders Pendulum only)."""
        img = np.full((height, width, 3), 255, np.uint8)
        scale = width / 1.5                      # 1.5 m field of view
        # Cabinet at the right third of the frame.
        cab_x0, cab_x1 = int(width * 0.65), int(width * 0.95)
        cab_y0, cab_y1 = int(height * 0.25), int(height * 0.85)
        img[cab_y0:cab_y1, cab_x0:cab_x0 + 2] = 0
        img[cab_y0:cab_y1, cab_x1:cab_x1 + 2] = 0
        img[cab_y0:cab_y0 + 2, cab_x0:cab_x1] = 0
        img[cab_y1:cab_y1 + 2, cab_x0:cab_x1] = 0
        # Drawer slides out toward -x by the joint position.
        drawer = float(np.clip(obs_row[18], 0.0, 0.5))
        d_px = int(drawer * scale)
        dy0, dy1 = int(height * 0.45), int(height * 0.6)
        img[dy0:dy1, cab_x0 - d_px:cab_x0 + 2] = (170, 120, 60)
        handle = np.array([cab_x0 - d_px, (dy0 + dy1) // 2])
        img[handle[1] - 3:handle[1] + 3,
            handle[0] - 3:handle[0] + 3] = (204, 77, 77)
        # Gripper: hand = handle - to_handle (world x up-screen-left, z up).
        to_handle = np.asarray(obs_row[20:23], np.float64)
        hand = (int(handle[0] - (-to_handle[0]) * scale),
                int(handle[1] + to_handle[2] * scale))
        hx = np.clip(hand[0], 4, width - 5)
        hy = np.clip(hand[1], 4, height - 5)
        img[hy - 4:hy + 4, hx - 4:hx + 4] = (77, 77, 204)
        return img
