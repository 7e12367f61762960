"""Free-flyer tasks: Ingenuity (Mars helicopter) and Quadcopter.

The reference wraps Isaac Gym's closed-source versions
(``/root/reference/bayes_sim_ig/sim/ig_env_wrappers.py:228-311``). Both are
rebuilt on the articulated engine as free-base mechanisms with rotor links
and thrust forces applied as external spatial forces (no ground contact —
the flyers operate mid-air and crash conditions terminate the episode, as
in IG).

DR layouts match the reference configs:
  * Ingenuity (cfg/ingenuity.yaml): 5 body-mass multipliers (chassis +
    2 physics rotors + 2 visual rotors) and 4 additive dof stiffness dims
    (the two coaxial rotor pairs), with the reference's DoF-name dedup
    (rotor_one_roll0/rotor_two_roll0..., ig_env_wrappers.py:253-267).
  * Quadcopter (cfg/quadcopter.yaml): 9 body-mass multipliers (chassis +
    4 rotor arms + 4 rotors); mass is the only randomized property.

Conventions kept from the public IG task descriptions: Ingenuity flies in
Mars gravity (-3.721), obs = [target-relative pos (3), quat (4), linvel
(3), angvel (3)] (13 dims); Quadcopter obs adds the 8 arm dof positions
(21 dims), actions = 8 arm PD targets + 4 rotor thrusts (12 dims).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..dr import TaskNames, build_params_spec
from ..physics import (
    ArticulatedModel, LinkSpec, DynParams, forward_dynamics, integrate,
    clamp_limits, carried_mass_factor,
)
from ..physics.spatial import quat_to_rot
from .render2d import draw_line
from .task import Task


class FlyerState(NamedTuple):
    q: jnp.ndarray
    v: jnp.ndarray


class _FlyerBase(Task):
    """Shared free-flyer machinery: state container, PD/thrust stepping."""

    dt = 1.0 / 100.0
    substeps = 2
    gravity = -9.81
    target = np.array([0.0, 0.0, 1.0])

    def _make_dyn_params(self, params_row) -> DynParams:
        m = self.model
        base = DynParams.defaults(m, gravity=(0.0, 0.0, self.gravity))
        mass = base.mass * params_row[jnp.asarray(self._mass_dims)]
        inertia = base.inertia * (mass / base.mass)[:, None]
        stiffness = base.stiffness
        if self._stiff_dims:
            stiffness = base.stiffness.at[
                jnp.asarray(self._dof_v_idx)].add(
                params_row[jnp.asarray(self._stiff_dims)])
        scale = base.scale
        if self._scale_dims:
            scale = params_row[self._scale_dims[0]]
        return base._replace(mass=mass, inertia=inertia,
                             stiffness=stiffness, scale=scale)

    def init_state(self, key, params):
        n = params.shape[0]
        m = self.model
        q0 = jnp.asarray(m.neutral_q(), jnp.float32).at[2].set(1.0)
        k1, k2 = jax.random.split(key)
        pos_jitter = jax.random.uniform(k1, (n, 3), minval=-0.2,
                                        maxval=0.2)
        q = jnp.tile(q0, (n, 1))
        q = q.at[:, 0:3].add(pos_jitter)
        v = jax.random.uniform(k2, (n, m.nv), minval=-0.1, maxval=0.1)
        return FlyerState(q=q, v=v)

    def _thrust_forces(self, q, actions, params_row):
        """Returns (nb, 6) world-frame external forces. Task-specific."""
        raise NotImplementedError

    def _joint_targets(self, actions):
        """(n_dofs,) PD position targets, or None."""
        return None

    def physics_step(self, state, actions, params, key):
        # Natively batched engine call (dynamics.py); only the small
        # task-specific thrust computation stays per-env under vmap.
        m = self.model
        dp = jax.vmap(self._make_dyn_params)(params)
        h = self.dt / self.substeps
        targets = self._joint_targets(actions)
        dof_idx = jnp.asarray(self._dof_v_idx)
        thrust = jax.vmap(self._thrust_forces)

        # Joint PD drives solved IMPLICITLY in forward_dynamics (PhysX
        # drive semantics; dynamics.py docstring) — stable regardless of
        # how light the DR corners make the rotor-arm links.
        n = actions.shape[0]
        drive = {}
        if targets is not None:
            drive = dict(
                drive_kp=jnp.zeros((n, m.nv)).at[:, dof_idx].set(self.kp),
                drive_kd=jnp.zeros((n, m.nv)).at[:, dof_idx].set(self.kd),
                drive_target=jnp.zeros((n, m.nv)).at[:, dof_idx].set(
                    targets))
        zero_tau = jnp.zeros((n, m.nv))

        def substep(carry, _):
            q, v, factor = carry
            # vmapped per-env thrust gives (N, nb, 6); the engine consumes
            # env-last (nb, 6, N).
            f_ext = jnp.moveaxis(thrust(q, actions, params), 0, -1)
            qdd, _, factor = forward_dynamics(
                m, q, v, zero_tau, dp, f_ext, dt=h,
                factor=carried_mass_factor(factor), return_factor=True,
                **drive)
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
        return FlyerState(q=q, v=v)

    def _kinematics_obs(self, state):
        q, v = state.q, state.v
        quat = q[:, 3:7]
        rel = jnp.asarray(self.target, jnp.float32)[None] - q[:, 0:3]
        return rel, quat, v[:, 3:6], v[:, 0:3]

    def reward(self, state, actions, params):
        rel, quat, v_lin, v_ang = self._kinematics_obs(state)
        dist = jnp.linalg.norm(rel, axis=-1)
        pos_reward = 1.0 / (1.0 + dist ** 2)
        R = jax.vmap(quat_to_rot)(quat)
        up = R[:, 2, 2]
        up_reward = 1.0 / (1.0 + (1.0 - up) ** 2)
        spin = jnp.sum(v_ang ** 2, axis=-1)
        spin_reward = 1.0 / (1.0 + spin)
        rew = pos_reward + pos_reward * (up_reward + spin_reward)
        crashed = self._crashed(state)
        return jnp.where(crashed, -2.0, rew)

    def _crashed(self, state):
        rel = jnp.asarray(self.target, jnp.float32)[None] - state.q[:, 0:3]
        dist = jnp.linalg.norm(rel, axis=-1)
        return (dist > 4.0) | (state.q[:, 2] < 0.1)

    def early_termination(self, state, params):
        return self._crashed(state)

    def render_obs_frame(self, obs_row, height=200, width=200):
        """Side-view (x-z) schematic from one observation row for the
        RealSurrogate/video surface (reference collect_trajectories.py:
        40-41,81-83; exceeds reference parity — the reference renders
        Pendulum only): hover-target crosshair at the frame center, the
        craft at its target-relative position with a rotor bar tilted by
        the base quaternion's pitch, and a velocity arrow."""
        obs = np.asarray(obs_row, np.float64)
        rel = obs[0:3]                      # target - position
        w, x, y, z = obs[3:7]
        pitch = np.arctan2(2 * (x * z + w * y),
                           1 - 2 * (x * x + y * y))
        v = obs[7:10]
        img = np.full((height, width, 3), 255, np.uint8)
        scale = width / 8.0                 # 8 m field of view
        cx, cy = width // 2, height // 2

        def line(x0, y0, x1, y1, color, thick=1):
            draw_line(img, x0, y0, x1, y1, color, thick)

        line(cx - 5, cy, cx + 5, cy, (90, 170, 90), 1)   # target cross
        line(cx, cy - 5, cx, cy + 5, (90, 170, 90), 1)
        bx = cx - int(rel[0] * scale)       # body = target - rel
        by = cy + int(rel[2] * scale)
        yy, xx = np.ogrid[:height, :width]
        r = max(3, int(0.02 * width))
        img[(xx - bx) ** 2 + (yy - by) ** 2 <= r * r] = (150, 111, 214)
        arm = 0.06 * width
        c, s = np.cos(pitch), np.sin(pitch)
        line(bx - int(arm * c), by - int(arm * s),
             bx + int(arm * c), by + int(arm * s), (40, 40, 40), 1)
        line(bx, by, bx + int(v[0] * scale * 0.5),
             by - int(v[2] * scale * 0.5), (204, 77, 77), 1)
        return img


# --------------------------------------------------------------------- #
class Ingenuity(_FlyerBase):
    name = "Ingenuity"
    obs_dim = 13
    act_dim = 6
    gravity = -3.721  # Mars
    max_thrust = 5.0

    def __init__(self, cfg):
        env_cfg = cfg["env"]
        self.num_envs = int(env_cfg["numEnvs"])
        self.max_episode_length = int(
            env_cfg.get("maxEpisodeLength",
                        env_cfg.get("episodeLength", 2000)))
        links = [LinkSpec("chassis", parent=-1, joint_type="free",
                          mass=1.0, inertia=(0.01, 0.01, 0.01))]
        # Two coaxial physics rotors + two visual rotors, each a z revolute.
        for i, (nm, z) in enumerate([("rotor_physics_0", 0.2),
                                     ("rotor_physics_1", 0.3),
                                     ("rotor_visual_0", 0.2),
                                     ("rotor_visual_1", 0.3)]):
            links.append(LinkSpec(
                nm, parent=0, joint_type="revolute",
                joint_axis=(0, 0, 1), joint_pos=(0, 0, z),
                mass=0.1, inertia=(0.001, 0.001, 0.002), damping=0.02))
        self.model = ArticulatedModel(links, fixed_base=False)
        m = self.model
        # Reference DoF-name dedup (ig_env_wrappers.py:253-267).
        dof_names = ["rotor_one_roll0", "rotor_one_roll1",
                     "rotor_two_roll0", "rotor_two_roll1"]
        body_names = m.body_names
        self.params_spec = build_params_spec(
            cfg["task"]["randomization_params"],
            actor_names_map={"ingenuity": TaskNames(
                body_names=body_names, shape_names=body_names,
                dof_names=dof_names, tendon_names=[])},
            defaults_map={"ingenuity": {
                "rigid_body_properties": {"mass": m.mass0.copy()},
                "dof_properties": {"stiffness": np.zeros(4)},
            }},
            plot_names_skip_patterns=cfg["task"].get(
                "plotNamesSkipPatterns"))
        self._mass_dims = self.params_spec.indices_of(
            "rigid_body_properties", "mass")
        self._stiff_dims = self.params_spec.indices_of(
            "dof_properties", "stiffness")
        self._dof_v_idx = [m.v_off[i] for i in range(m.nb)
                           if m.joint_types[i] == "revolute"]
        self._dof_links = [i for i in range(m.nb)
                           if m.joint_types[i] == "revolute"]
        self.setup_noise(cfg["task"]["randomization_params"])
        # Whole-actor geometry scale DR (apply_randomizations.py:174-189).
        self._scale_dims = self.params_spec.indices_of("scale", "")

    def _thrust_forces(self, q, actions, params_row):
        m = self.model
        R = quat_to_rot(q[3:7])  # chassis body->world
        f_ext = jnp.zeros((m.nb, 6))
        a = jnp.clip(actions, -1.0, 1.0)
        for j, rotor_z in enumerate((0.2, 0.3)):
            f_body = jnp.array([a[3 * j] * 0.3 * self.max_thrust,
                                a[3 * j + 1] * 0.3 * self.max_thrust,
                                (a[3 * j + 2] + 1.0) * 0.5
                                * self.max_thrust])
            f_world = R @ f_body
            # Applied at the rotor position above the chassis origin.
            arm_world = R @ jnp.array([0.0, 0.0, rotor_z])
            torque = jnp.cross(arm_world, f_world)
            f_ext = f_ext.at[0, :3].add(torque)
            f_ext = f_ext.at[0, 3:].add(f_world)
        return f_ext

    def observe(self, state, params):
        rel, quat, v_lin, v_ang = self._kinematics_obs(state)
        return jnp.concatenate([rel, quat, v_lin, v_ang], axis=-1)


# --------------------------------------------------------------------- #
class Quadcopter(_FlyerBase):
    name = "Quadcopter"
    obs_dim = 21
    act_dim = 12
    max_thrust = 8.0
    kp = 10.0
    kd = 0.5

    ARM_DIRS = np.array([[1, 0], [0, 1], [-1, 0], [0, -1]], np.float64)

    def __init__(self, cfg):
        env_cfg = cfg["env"]
        self.num_envs = int(env_cfg["numEnvs"])
        self.max_episode_length = int(
            env_cfg.get("maxEpisodeLength",
                        env_cfg.get("episodeLength", 500)))
        links = [LinkSpec("chassis", parent=-1, joint_type="free",
                          mass=1.0, inertia=(0.01, 0.01, 0.02))]
        for i, d in enumerate(self.ARM_DIRS):
            dx, dy = d
            arm_idx = len(links)
            # Arm tilt joint: axis perpendicular to the arm, horizontal.
            links.append(LinkSpec(
                f"rotor_arm{i}", parent=0, joint_type="revolute",
                joint_axis=(-dy, dx, 0.0),
                joint_pos=(0.15 * dx, 0.15 * dy, 0.0),
                mass=0.1, com=(0.05 * dx, 0.05 * dy, 0.0),
                inertia=(0.001, 0.001, 0.001), damping=0.1,
                limit_lower=-0.52, limit_upper=0.52))
            links.append(LinkSpec(
                f"rotor{i}", parent=arm_idx, joint_type="revolute",
                joint_axis=(0, 0, 1),
                joint_pos=(0.1 * dx, 0.1 * dy, 0.02),
                mass=0.05, inertia=(2e-4, 2e-4, 4e-4), damping=0.02))
        self.model = ArticulatedModel(links, fixed_base=False)
        m = self.model
        body_names = m.body_names
        self.params_spec = build_params_spec(
            cfg["task"]["randomization_params"],
            actor_names_map={"quadcopter": TaskNames(
                body_names=body_names, shape_names=body_names,
                dof_names=m.dof_names, tendon_names=[])},
            defaults_map={"quadcopter": {
                "rigid_body_properties": {"mass": m.mass0.copy()},
                "dof_properties": {"stiffness": np.zeros(8)},
            }},
            plot_names_skip_patterns=cfg["task"].get(
                "plotNamesSkipPatterns"))
        self._mass_dims = self.params_spec.indices_of(
            "rigid_body_properties", "mass")
        self._stiff_dims = self.params_spec.indices_of(
            "dof_properties", "stiffness")
        # ALL 8 revolute dofs are PD position-servoed (interleaved
        # [tilt0, spin0, tilt1, spin1, ...]) — the IG Quadcopter drives 8
        # dof targets + 4 thrusts (12 actions). Our arms carry one tilt +
        # one z-axis "spin" dof where IG's have two perpendicular tilts;
        # servoing the spin angle stands in for IG's second tilt (the
        # thrust model reads only the first tilt; documented
        # approximation).
        self._dof_v_idx = [m.v_off[i] for i in range(m.nb)
                           if m.joint_types[i] == "revolute"]
        self._dof_links = [i for i in range(m.nb)
                           if m.joint_types[i] == "revolute"]
        self._arm_links = [i for i in range(m.nb)
                           if m.body_names[i].startswith("rotor_arm")]
        self._rotor_links = [i for i in range(m.nb)
                             if m.body_names[i].startswith("rotor")
                             and not m.body_names[i].startswith(
                                 "rotor_arm")]
        self.setup_noise(cfg["task"]["randomization_params"])
        # Whole-actor geometry scale DR (apply_randomizations.py:174-189).
        self._scale_dims = self.params_spec.indices_of("scale", "")

    def _joint_targets(self, actions):
        # First 8 actions: PD position targets for all 8 dofs in the
        # interleaved [tilt, spin] x 4 layout (see __init__ note).
        a = jnp.clip(actions[..., :8], -1.0, 1.0)
        return a * 0.52

    def _thrust_forces(self, q, actions, params_row):
        m = self.model
        f_ext = jnp.zeros((m.nb, 6))
        a = jnp.clip(actions[8:], -1.0, 1.0)
        # Thrust along each rotor link's +z axis, applied at the rotor.
        # Rotor world rotation requires the kinematic chain; approximate
        # with chassis rotation x arm tilt (exact enough for control).
        R_chassis = quat_to_rot(q[3:7])
        for j, link in enumerate(self._rotor_links):
            thrust = (a[j] + 1.0) * 0.5 * self.max_thrust
            arm_i = self._arm_links[j]
            tilt = q[m.q_off[arm_i]]
            d = self.ARM_DIRS[j]
            axis = jnp.array([-d[1], d[0], 0.0])
            # Rodrigues tilt of the body z-axis about the arm axis.
            z_b = jnp.array([0.0, 0.0, 1.0])
            z_tilted = (z_b * jnp.cos(tilt)
                        + jnp.cross(axis, z_b) * jnp.sin(tilt))
            f_world = R_chassis @ (z_tilted * thrust)
            pos_body = jnp.array([0.25 * d[0], 0.25 * d[1], 0.02])
            arm_world = R_chassis @ pos_body
            f_ext = f_ext.at[0, :3].add(jnp.cross(arm_world, f_world))
            f_ext = f_ext.at[0, 3:].add(f_world)
        return f_ext

    def observe(self, state, params):
        # 21 dims: the 8 dof slots are the 4 arm tilt positions +
        # velocities (rotor spin angles are unbounded, so they are not
        # observed directly).
        m = self.model
        rel, quat, v_lin, v_ang = self._kinematics_obs(state)
        arm_q_idx = jnp.asarray([m.q_off[i] for i in self._arm_links])
        arm_v_idx = jnp.asarray([m.v_off[i] for i in self._arm_links])
        return jnp.concatenate([rel, quat, v_lin, v_ang,
                                state.q[:, arm_q_idx],
                                state.v[:, arm_v_idx]], axis=-1)

    def render_obs_frame(self, obs_row, height=200, width=200):
        """Top-down (x-y) schematic overriding the side-view base
        renderer: the X-frame's four arms rotated by the base yaw and
        foreshortened by their observed tilt angles (obs[13:17]),
        target crosshair from the relative-position obs, planar
        velocity arrow."""
        obs = np.asarray(obs_row, np.float64)
        rel = obs[0:3]
        w, x, y, z = obs[3:7]
        yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
        v = obs[7:10]
        tilts = obs[13:17]
        img = np.full((height, width, 3), 255, np.uint8)
        scale = width / 8.0
        cx, cy = width // 2, height // 2

        def line(x0, y0, x1, y1, color, thick=1):
            draw_line(img, x0, y0, x1, y1, color, thick)

        tx = cx + int(rel[0] * scale)        # target, body at center
        ty = cy - int(rel[1] * scale)
        line(tx - 5, ty, tx + 5, ty, (90, 170, 90), 1)
        line(tx, ty - 5, tx, ty + 5, (90, 170, 90), 1)
        yy, xx = np.ogrid[:height, :width]
        r = max(3, int(0.02 * width))
        img[(xx - cx) ** 2 + (yy - cy) ** 2 <= r * r] = (150, 111, 214)
        arm = 0.08 * width
        for i, d in enumerate(self.ARM_DIRS):
            ang = yaw + np.arctan2(d[1], d[0])
            ln = arm * max(np.cos(tilts[i]), 0.2)
            ex = cx + int(ln * np.cos(ang))
            ey = cy - int(ln * np.sin(ang))
            line(cx, cy, ex, ey, (40, 40, 40), 1)
            img[(xx - ex) ** 2 + (yy - ey) ** 2 <= 9] = (80, 80, 80)
        line(cx, cy, cx + int(v[0] * scale * 0.5),
             cy - int(v[1] * scale * 0.5), (204, 77, 77), 1)
        return img
