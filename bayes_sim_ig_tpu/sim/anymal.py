"""ANYmal quadruped locomotion with velocity-command tracking.

The reference wraps Isaac Gym's closed-source Anymal
(``/root/reference/bayes_sim_ig/sim/ig_env_wrappers.py:64-103``). Rebuilt
on the articulated engine: box base + four 3-dof legs (HAA abduction-x,
HFE flexion-y, KFE knee-y) with foot spheres, position-PD actuation
(kp 85, kd 2, actionScale 0.5 — the reference config's ``control``
section), default joint angles from cfg/anymal.yaml's
``defaultJointAngles``, and episode length ``episodeLength_s * 60``.

DR layout matches the reference: 13 per-body mass multipliers (base +
LF/LH/RF/RH x hip/thigh/shank), the only randomized property.

Obs (48, IG anymal layout): base linvel*2.0, base angvel*0.25, projected
gravity, commands (vx, vy, yaw-rate)*scales, dof pos - default, dof
vel*0.05, previous actions. Commands are resampled per episode. Reward:
exp-tracking of commanded linear/yaw velocity minus torque and joint-vel
penalties; termination on base contact (height/orientation proxy).
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
from ..physics.spatial import quat_to_rot
from .render2d import draw_line
from .task import Task

LEGS = [("LF", 1, 1), ("LH", -1, 1), ("RF", 1, -1), ("RH", -1, -1)]
BASE_Z = 0.62
THIGH_LEN = 0.25
SHANK_LEN = 0.33
DEFAULT_ANGLES = {  # cfg/anymal.yaml defaultJointAngles
    "LF": (0.03, 0.4, -0.8), "LH": (0.03, -0.4, 0.8),
    "RF": (-0.03, 0.4, -0.8), "RH": (-0.03, -0.4, 0.8),
}


def build_anymal_model() -> ArticulatedModel:
    links = [LinkSpec("base", parent=-1, joint_type="free", mass=16.0,
                      inertia=(0.15, 0.6, 0.6))]
    geoms = [Geom(link=0, kind="box", size=(0.26, 0.15, 0.08))]
    for nm, fx, fy in LEGS:
        px, py = 0.28 * fx, 0.115 * fy
        hip = len(links)
        links.append(LinkSpec(
            f"{nm}_HIP", parent=0, joint_type="revolute",
            joint_axis=(1, 0, 0), joint_pos=(px, py, 0.0),
            mass=1.5, com=(0.0, 0.06 * fy, 0.0),
            inertia=(0.005, 0.005, 0.005), damping=0.5,
            limit_lower=-0.7, limit_upper=0.7, effort=40.0))
        thigh = len(links)
        links.append(LinkSpec(
            f"{nm}_THIGH", parent=hip, joint_type="revolute",
            joint_axis=(0, 1, 0), joint_pos=(0.0, 0.1 * fy, 0.0),
            mass=1.2, com=(0.0, 0.0, -THIGH_LEN / 2),
            inertia=(0.01, 0.01, 0.002), damping=0.5,
            limit_lower=-1.5, limit_upper=1.5, effort=40.0))
        shank = len(links)
        links.append(LinkSpec(
            f"{nm}_SHANK", parent=thigh, joint_type="revolute",
            joint_axis=(0, 1, 0), joint_pos=(0.0, 0.0, -THIGH_LEN),
            mass=0.5, com=(0.0, 0.0, -SHANK_LEN / 2),
            inertia=(0.006, 0.006, 0.001), damping=0.5,
            limit_lower=-2.2, limit_upper=2.2, effort=40.0))
        geoms.append(Geom(link=shank, kind="sphere", size=(0.03,),
                          offset=(0.0, 0.0, -SHANK_LEN)))
    return ArticulatedModel(links, geoms, fixed_base=False)


class AnymalState(NamedTuple):
    q: jnp.ndarray
    v: jnp.ndarray
    commands: jnp.ndarray      # (N, 3) vx, vy, yaw-rate targets
    prev_actions: jnp.ndarray  # (N, 12)


class Anymal(Task):
    name = "Anymal"
    obs_dim = 48
    act_dim = 12
    dt = 1.0 / 60.0
    substeps = 2
    kp = 85.0
    kd = 2.0
    action_scale = 0.5
    lin_vel_scale = 2.0
    ang_vel_scale = 0.25
    dof_vel_scale = 0.05

    def __init__(self, cfg):
        env_cfg = cfg["env"]
        self.num_envs = int(env_cfg["numEnvs"])
        eplen_s = float(env_cfg.get("episodeLength_s", 50))
        self.max_episode_length = int(eplen_s / self.dt)
        self.model = build_anymal_model()
        m = self.model
        self._act_v_idx = np.array([m.v_off[i] for i in range(m.nb)
                                    if m.joint_types[i] == "revolute"])
        self._act_q_idx = np.array([m.q_off[i] for i in range(m.nb)
                                    if m.joint_types[i] == "revolute"])
        defaults = []
        for nm, *_ in LEGS:
            defaults += list(DEFAULT_ANGLES[nm])
        self._default_dof = np.array(defaults, np.float32)
        self.params_spec = build_params_spec(
            cfg["task"]["randomization_params"],
            actor_names_map={"anymal": TaskNames(
                body_names=m.body_names, shape_names=m.body_names,
                dof_names=[f"{nm}_{j}" for nm, *_ in LEGS
                           for j in ("HAA", "HFE", "KFE")],
                tendon_names=[])},
            defaults_map={"anymal": {
                "rigid_body_properties": {"mass": m.mass0.copy()},
            }},
            plot_names_skip_patterns=cfg["task"].get(
                "plotNamesSkipPatterns"))
        self._mass_dims = self.params_spec.indices_of(
            "rigid_body_properties", "mass")
        self.setup_noise(cfg["task"]["randomization_params"])
        # Whole-actor geometry scale DR (apply_randomizations.py:174-189).
        self._scale_dims = self.params_spec.indices_of("scale", "")

    def _dyn_params(self, params_row) -> DynParams:
        base = DynParams.defaults(self.model)
        mass = base.mass * params_row[jnp.asarray(self._mass_dims)]
        inertia = base.inertia * (mass / base.mass)[:, None]
        scale = base.scale
        if self._scale_dims:
            scale = params_row[self._scale_dims[0]]
        return base._replace(mass=mass, inertia=inertia, scale=scale)

    def init_state(self, key, params):
        n = params.shape[0]
        m = self.model
        k1, k2, k3 = jax.random.split(key, 3)
        q0 = jnp.asarray(m.neutral_q(), jnp.float32).at[2].set(BASE_Z)
        q0 = q0.at[jnp.asarray(self._act_q_idx)].set(
            jnp.asarray(self._default_dof))
        q = jnp.tile(q0, (n, 1))
        jitter = jax.random.uniform(k1, (n, 12), minval=-0.05,
                                    maxval=0.05)
        q = q.at[:, jnp.asarray(self._act_q_idx)].add(jitter)
        v = jnp.zeros((n, m.nv))
        commands = jax.random.uniform(
            k2, (n, 3), minval=jnp.array([-1.0, -0.3, -0.5]),
            maxval=jnp.array([1.0, 0.3, 0.5]))
        return AnymalState(q=q, v=v, commands=commands,
                           prev_actions=jnp.zeros((n, 12)))

    def physics_step(self, state, actions, params, key):
        # Natively batched engine call (dynamics.py) — no vmap.
        m = self.model
        dp = jax.vmap(self._dyn_params)(params)
        h = self.dt / self.substeps
        targets = (jnp.asarray(self._default_dof)
                   + jnp.clip(actions, -1, 1) * self.action_scale)
        act_v = jnp.asarray(self._act_v_idx)
        n = actions.shape[0]
        # Leg PD drives solved IMPLICITLY in forward_dynamics (PhysX
        # drive semantics; dynamics.py docstring): explicit tau-PD is
        # only marginally stable on the light shank axes at nominal mass
        # and goes unstable under small-mass DR corners — the velocity
        # clamps then hide the blow-up as joint dither.
        kp_dof = jnp.zeros((n, m.nv)).at[:, act_v].set(self.kp)
        kd_dof = jnp.zeros((n, m.nv)).at[:, act_v].set(self.kd)
        tgt_dof = jnp.zeros((n, m.nv)).at[:, act_v].set(targets)
        zero_tau = jnp.zeros((n, m.nv))

        def substep(carry, _):
            q, v, factor = carry
            kin = forward_kinematics(m, q, v, dp)
            f_ext = ground_contact_forces(m, kin, dp, dt=h)
            qdd, _, factor = forward_dynamics(
                m, q, v, zero_tau, dp, f_ext, dt=h, kin=kin,
                factor=carried_mass_factor(factor), return_factor=True,
                drive_kp=kp_dof, drive_kd=kd_dof, drive_target=tgt_dof,
                drive_effort=80.0)
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
        return AnymalState(q=q, v=v, commands=state.commands,
                           prev_actions=jnp.clip(actions, -1, 1))

    def _base_frames(self, state):
        R = jax.vmap(quat_to_rot)(state.q[:, 3:7])
        v_b = state.v[:, 3:6]
        w_b = state.v[:, 0:3]
        return R, v_b, w_b

    def observe(self, state, params):
        R, v_b, w_b = self._base_frames(state)
        grav = jnp.einsum("nji,j->ni", R, jnp.array([0.0, 0.0, -1.0]))
        cmd_scaled = state.commands * jnp.array(
            [self.lin_vel_scale, self.lin_vel_scale, self.ang_vel_scale])
        dof_pos = state.q[:, jnp.asarray(self._act_q_idx)] \
            - jnp.asarray(self._default_dof)
        dof_vel = state.v[:, jnp.asarray(self._act_v_idx)]
        return jnp.concatenate([
            v_b * self.lin_vel_scale, w_b * self.ang_vel_scale, grav,
            cmd_scaled, dof_pos, dof_vel * self.dof_vel_scale,
            state.prev_actions], axis=-1)

    def reward(self, state, actions, params):
        R, v_b, w_b = self._base_frames(state)
        lin_err = jnp.sum(
            (state.commands[:, :2] - v_b[:, :2]) ** 2, axis=-1)
        ang_err = (state.commands[:, 2] - w_b[:, 2]) ** 2
        rew = (jnp.exp(-lin_err / 0.25) + 0.5 * jnp.exp(-ang_err / 0.25)
               - 0.02 * jnp.sum(jnp.clip(actions, -1, 1) ** 2, axis=-1))
        return jnp.where(self._base_down(state), -2.0, rew)

    def _base_down(self, state):
        R = jax.vmap(quat_to_rot)(state.q[:, 3:7])
        return (state.q[:, 2] < 0.3) | (R[:, 2, 2] < 0.6)

    def early_termination(self, state, params):
        return self._base_down(state)

    def render_obs_frame(self, obs_row, height=200, width=200):
        """Side-view schematic from one observation row for the
        RealSurrogate/video surface (reference collect_trajectories.py:
        40-41,81-83; exceeds reference parity — the reference renders
        Pendulum only). The obs is egocentric, so the body is drawn at
        nominal height, pitched by the measured gravity direction, with
        the four legs posed by their thigh/shank angles and command-vs-
        actual velocity arrows on top."""
        obs = np.asarray(obs_row, np.float64)
        grav = obs[6:9]                       # gravity dir in base frame
        pitch = np.arctan2(grav[0], -grav[2])
        dof = obs[12:24]                      # (hip, thigh, shank) x 4
        img = np.full((height, width, 3), 255, np.uint8)
        scale = width / 2.0                   # 2 m field of view
        cx = width // 2
        gy = height - int(0.08 * height)
        img[gy:gy + 2, :] = (120, 120, 120)   # ground
        by = gy - int(BASE_Z * scale * 0.8)

        def line(x0, y0, x1, y1, color, thick=1):
            draw_line(img, x0, y0, x1, y1, color, thick)

        half = 0.28 * scale
        c, s = np.cos(pitch), np.sin(pitch)
        line(cx - int(half * c), by - int(half * s),
             cx + int(half * c), by + int(half * s),
             (150, 111, 214), 3)
        for i, (nm, fx, _) in enumerate(LEGS):
            hx = cx + int(fx * half * c)
            hy = by + int(fx * half * s)
            _, th_def, sh_def = DEFAULT_ANGLES[nm]
            th = pitch + th_def + dof[3 * i + 1]
            kx = hx + int(THIGH_LEN * scale * np.sin(th))
            ky = hy + int(THIGH_LEN * scale * np.cos(th))
            line(hx, hy, kx, ky, (80, 80, 80), 1)
            sh = th + sh_def + dof[3 * i + 2]
            fx2 = kx + int(SHANK_LEN * scale * np.sin(sh))
            fy2 = ky + int(SHANK_LEN * scale * np.cos(sh))
            line(kx, ky, fx2, fy2, (40, 40, 40), 1)
        # Command (blue) vs actual (green) forward velocity, top strip.
        cmd_vx = obs[9] / self.lin_vel_scale
        act_vx = obs[0] / self.lin_vel_scale
        y0 = int(0.08 * height)
        line(cx, y0, cx + int(np.clip(cmd_vx, -1, 1) * 0.4 * width), y0,
             (77, 77, 204), 1)
        line(cx, y0 + 6, cx + int(np.clip(act_vx, -1, 1) * 0.4 * width),
             y0 + 6, (90, 170, 90), 1)
        return img
