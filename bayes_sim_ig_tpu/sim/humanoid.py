"""Humanoid locomotion task (16 bodies, 21 actuated dofs).

The reference wraps Isaac Gym's closed-source Humanoid
(``/root/reference/bayes_sim_ig/sim/ig_env_wrappers.py:199-225``). Rebuilt
in the classic MuJoCo-humanoid morphology: free torso root; head (fixed);
2-dof waist + 1-dof abdomen to the pelvis; 3-dof hips, knees, 2-dof
ankles; 2-dof shoulders and elbows. Multi-dof joints are realized as
chains through near-massless phantom links (the engine is single-dof per
link); only the 16 real bodies carry the DR mass dims.

DR layout matches the reference cfg/humanoid.yaml: 16 body-mass
multipliers (torso, head, lower_waist, pelvis, right/left thigh-shin-foot,
right/left upper_arm-lower_arm-hand) + 21 dof-stiffness SCALING dims
(defaults 1.0 so the scaling operation is well-defined) = 37 params.
The config also carries gaussian additive ACTION noise
(randomization_params.actions), wired through the task's noise hooks.

Torque control with MuJoCo-style gears; reward follows the IG humanoid
recipe with the reference config's constants (forward progress + alive +
heading/up - action/energy costs, deathCost below terminationHeight 0.8).
Obs (55, our layout — the closed reference's 108-dim layout includes force
sensors we do not replicate): [z, quat(4), local linvel(3), local
angvel(3), up_proj, heading, dof_pos(21), dof_vel(21)].
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..dr import TaskNames, build_params_spec
from ..physics import (
    ArticulatedModel, LinkSpec, Geom, DynParams,
    forward_dynamics, forward_kinematics, integrate, clamp_limits,
    carried_mass_factor,
    ground_contact_forces,
)
from ..physics.spatial import quat_to_rot
from .render2d import draw_line
from .task import Task

START_Z = 1.34
# phantom=True collapses these connector links out of the engine's
# link-axis tensors at model build (physics/model.py): their dofs become
# joint chains on the real end links (16 effective bodies, tree depth
# 9 -> 5), which is where Humanoid's round-4 throughput came from. Mass
# is exactly zero: the old 0.01 kg was a conditioning hack the collapse
# obsoletes (every chain dof's composite inertia holds the real subtree),
# and zero makes collapsed/uncollapsed dynamics bit-equivalent
# (tests/test_physics.py phantom-collapse gate).
PHANTOM = dict(mass=0.0, inertia=(0.0, 0.0, 0.0), phantom=True)

REAL_BODIES = ["torso", "head", "lower_waist", "pelvis",
               "right_thigh", "right_shin", "right_foot",
               "left_thigh", "left_shin", "left_foot",
               "right_upper_arm", "right_lower_arm", "right_hand",
               "left_upper_arm", "left_lower_arm", "left_hand"]

# (dof name, gear) in tree order.
DOF_GEARS = {
    "abdomen_z": 40.0, "abdomen_y": 40.0, "abdomen_x": 40.0,
    "hip_x": 40.0, "hip_z": 40.0, "hip_y": 120.0, "knee": 80.0,
    "ankle_y": 20.0, "ankle_x": 20.0,
    "shoulder1": 20.0, "shoulder2": 20.0, "elbow": 25.0,
}


def build_humanoid_model() -> ArticulatedModel:
    links = [LinkSpec("torso", parent=-1, joint_type="free", mass=8.3,
                      inertia=(0.1, 0.1, 0.1))]
    geoms = [Geom(link=0, kind="capsule", size=(0.11, 0.07),
                  axis=(0, 1, 0))]
    idx = {"torso": 0}

    def add(name, parent_name, jt, axis=(0, 0, 1), pos=(0, 0, 0),
            mass=0.01, com=(0, 0, 0), inertia=(1e-4,) * 3, lo=-1e9,
            hi=1e9, damping=1.0, stiffness=1.0, geom=None,
            phantom=False):
        i = len(links)
        links.append(LinkSpec(
            name, parent=idx[parent_name], joint_type=jt,
            joint_axis=axis, joint_pos=pos, mass=mass, com=com,
            inertia=inertia, limit_lower=lo, limit_upper=hi,
            damping=damping, stiffness=stiffness, phantom=phantom))
        idx[name] = i
        if geom is not None:
            geoms.append(Geom(link=i, **geom))
        return i

    add("head", "torso", "fixed", pos=(0, 0, 0.19), mass=2.0,
        inertia=(0.01, 0.01, 0.01),
        geom=dict(kind="sphere", size=(0.09,), offset=(0, 0, 0.06)))
    # Waist chain: abdomen_z -> abdomen_y -> lower_waist; abdomen_x ->
    # pelvis.
    add("p_abd_z", "torso", "revolute", axis=(0, 0, 1),
        pos=(-0.01, 0, -0.195), lo=-0.79, hi=0.79, **PHANTOM)
    add("lower_waist", "p_abd_z", "revolute", axis=(0, 1, 0),
        pos=(0, 0, 0), mass=2.0, com=(0, 0, -0.065),
        inertia=(0.01, 0.01, 0.01), lo=-1.3, hi=0.52)
    add("pelvis", "lower_waist", "revolute", axis=(1, 0, 0),
        pos=(0, 0, -0.13), mass=6.0, com=(0, 0, -0.08),
        inertia=(0.03, 0.03, 0.03), lo=-0.61, hi=0.61,
        geom=dict(kind="capsule", size=(0.09, 0.07), axis=(0, 1, 0),
                  offset=(0, 0, -0.08)))
    for side, sy in (("right", -1.0), ("left", 1.0)):
        add(f"p_{side}_hip_x", "pelvis", "revolute", axis=(1, 0, 0),
            pos=(0, sy * 0.1, -0.12), lo=-0.44, hi=0.44, **PHANTOM)
        add(f"p_{side}_hip_z", f"p_{side}_hip_x", "revolute",
            axis=(0, 0, 1), lo=-1.05, hi=0.61, **PHANTOM)
        add(f"{side}_thigh", f"p_{side}_hip_z", "revolute",
            axis=(0, 1, 0), mass=4.5, com=(0, 0, -0.17),
            inertia=(0.05, 0.05, 0.01), lo=-1.92, hi=0.35,
            geom=dict(kind="capsule", size=(0.07, 0.12),
                      offset=(0, 0, -0.17), axis=(0, 0, 1)))
        add(f"{side}_shin", f"{side}_thigh", "revolute",
            axis=(0, 1, 0), pos=(0, 0, -0.34), mass=2.6,
            com=(0, 0, -0.15), inertia=(0.02, 0.02, 0.004),
            lo=-0.05, hi=2.77,
            geom=dict(kind="capsule", size=(0.05, 0.11),
                      offset=(0, 0, -0.15), axis=(0, 0, 1)))
        add(f"p_{side}_ankle_y", f"{side}_shin", "revolute",
            axis=(0, 1, 0), pos=(0, 0, -0.3), lo=-0.87, hi=0.87,
            **PHANTOM)
        add(f"{side}_foot", f"p_{side}_ankle_y", "revolute",
            axis=(1, 0, 0), mass=1.0, com=(0.045, 0, -0.0225),
            inertia=(0.002, 0.004, 0.004), lo=-0.44, hi=0.44,
            geom=dict(kind="box", size=(0.0885, 0.045, 0.0275),
                      offset=(0.045, 0, -0.0225)))
        add(f"p_{side}_shoulder1", "torso", "revolute",
            axis=(0.5 * -1, sy * 0.5, 0.7), pos=(0, sy * 0.17, 0.06),
            lo=-1.48, hi=1.05, **PHANTOM)
        add(f"{side}_upper_arm", f"p_{side}_shoulder1", "revolute",
            axis=(0.5, sy * 0.5, -0.7), mass=1.6,
            com=(0, sy * 0.08, -0.08), inertia=(0.01, 0.01, 0.004),
            lo=-1.48, hi=1.05,
            geom=dict(kind="capsule", size=(0.04, 0.08),
                      offset=(0, sy * 0.08, -0.08),
                      axis=(0, sy * 0.7, -0.7)))
        add(f"{side}_lower_arm", f"{side}_upper_arm", "revolute",
            axis=(0.7, sy * 0.7, 0.0), pos=(0, sy * 0.17, -0.17),
            mass=1.2, com=(0.01, sy * 0.01, 0.01),
            inertia=(0.005, 0.005, 0.002), lo=-1.57, hi=0.87,
            geom=dict(kind="capsule", size=(0.031, 0.06),
                      offset=(0.05, sy * 0.05, 0.05),
                      axis=(0.7, sy * 0.7, 0.7)))
        add(f"{side}_hand", f"{side}_lower_arm", "fixed",
            pos=(0.12, sy * 0.12, 0.12), mass=0.6,
            inertia=(5e-4,) * 3,
            geom=dict(kind="sphere", size=(0.04,)))
    return ArticulatedModel(links, geoms, fixed_base=False)


# Actuated dof names in tree order with their gear lookup keys.
TREE_DOFS = (
    [("abdomen_z", "abdomen_z"), ("abdomen_y", "abdomen_y"),
     ("abdomen_x", "abdomen_x")]
    + [(f"right_{j}", j) for j in
       ("hip_x", "hip_z", "hip_y", "knee", "ankle_y", "ankle_x")]
    + [(f"right_{j}", j) for j in ("shoulder1", "shoulder2", "elbow")]
    + [(f"left_{j}", j) for j in
       ("hip_x", "hip_z", "hip_y", "knee", "ankle_y", "ankle_x")]
    + [(f"left_{j}", j) for j in ("shoulder1", "shoulder2", "elbow")]
)


class HumanoidState(NamedTuple):
    q: jnp.ndarray
    v: jnp.ndarray


class Humanoid(Task):
    name = "Humanoid"
    act_dim = 21
    obs_dim = 55
    dt = 1.0 / 60.0
    substeps = 2

    def __init__(self, cfg):
        env_cfg = cfg["env"]
        self.num_envs = int(env_cfg["numEnvs"])
        self.max_episode_length = int(env_cfg.get("episodeLength", 1000))
        self.power_scale = float(env_cfg.get("powerScale", 1.0))
        self.heading_weight = float(env_cfg.get("headingWeight", 0.5))
        self.up_weight = float(env_cfg.get("upWeight", 0.1))
        self.actions_cost = float(env_cfg.get("actionsCost", 0.01))
        self.energy_cost = float(env_cfg.get("energyCost", 0.05))
        self.dof_vel_scale = float(env_cfg.get("dofVelocityScale", 0.1))
        self.joints_at_limit_cost = float(
            env_cfg.get("jointsAtLimitCost", 0.25))
        self.death_cost = float(env_cfg.get("deathCost", -1.0))
        self.termination_height = float(
            env_cfg.get("terminationHeight", 0.8))
        self.model = build_humanoid_model()
        m = self.model
        # Actuated (revolute) dofs in tree order.
        # All 1-dof joints are the 21 actuated revolute dofs; j1 arrays
        # are per-DOF in tree order, so they survive the phantom-link
        # collapse (which reindexes LINKS but never dofs).
        self._act_v_idx = np.asarray(m.j1_v)
        self._act_q_idx = np.asarray(m.j1_q)
        self._act_links = list(range(len(self._act_v_idx)))
        assert len(self._act_links) == 21
        # Gear per actuated dof (tree order interleaves phantoms; map by
        # walking the same order the links were added).
        gear_seq = []
        dof_names = []
        d_i = 0
        for i in self._act_links:
            name, gear_key = TREE_DOFS[d_i]
            gear_seq.append(DOF_GEARS[gear_key])
            dof_names.append(name)
            d_i += 1
        self._gears = np.array(gear_seq, np.float32)
        real_mass = np.array([m.mass0[m.link_index[b]]
                              for b in REAL_BODIES])
        self.params_spec = build_params_spec(
            cfg["task"]["randomization_params"],
            actor_names_map={"humanoid": TaskNames(
                body_names=REAL_BODIES, shape_names=REAL_BODIES,
                dof_names=dof_names, tendon_names=[])},
            defaults_map={"humanoid": {
                "rigid_body_properties": {"mass": real_mass},
                # Scaling stiffness needs positive defaults (1.0).
                "dof_properties": {"stiffness": np.ones(21)},
            }},
            plot_names_skip_patterns=cfg["task"].get(
                "plotNamesSkipPatterns"))
        self._mass_dims = self.params_spec.indices_of(
            "rigid_body_properties", "mass")
        self._stiff_dims = self.params_spec.indices_of(
            "dof_properties", "stiffness")
        self._real_links = np.array([m.link_index[b] for b in REAL_BODIES])
        self.setup_noise(cfg["task"]["randomization_params"])
        # Whole-actor geometry scale DR (apply_randomizations.py:174-189).
        self._scale_dims = self.params_spec.indices_of("scale", "")

    def _dyn_params(self, params_row) -> DynParams:
        m = self.model
        base = DynParams.defaults(m)
        mass = base.mass
        if self._mass_dims:
            mult = params_row[jnp.asarray(self._mass_dims)]
            mass = base.mass.at[jnp.asarray(self._real_links)].mul(mult)
        inertia = base.inertia * (mass / base.mass)[:, None]
        stiffness = base.stiffness
        if self._stiff_dims:
            # Scaling operation: default (1.0) x sampled multiplier.
            stiffness = base.stiffness.at[jnp.asarray(self._act_v_idx)].set(
                1.0 * params_row[jnp.asarray(self._stiff_dims)])
        scale = base.scale
        if self._scale_dims:
            scale = params_row[self._scale_dims[0]]
        return base._replace(mass=mass, inertia=inertia,
                             stiffness=stiffness, scale=scale)

    def init_state(self, key, params):
        n = params.shape[0]
        m = self.model
        q0 = jnp.asarray(m.neutral_q(), jnp.float32).at[2].set(START_Z)
        k1, k2 = jax.random.split(key)
        q = jnp.tile(q0, (n, 1))
        jitter = jax.random.uniform(k1, (n, 21), minval=-0.05,
                                    maxval=0.05)
        q = q.at[:, jnp.asarray(self._act_q_idx)].add(jitter)
        v = jax.random.uniform(k2, (n, m.nv), minval=-0.05, maxval=0.05)
        return HumanoidState(q=q, v=v)

    def physics_step(self, state, actions, params, key):
        # Natively batched engine call (dynamics.py) — no vmap.
        m = self.model
        dp = jax.vmap(self._dyn_params)(params)
        h = self.dt / self.substeps
        tau = jnp.zeros((actions.shape[0], m.nv)).at[
            :, jnp.asarray(self._act_v_idx)].set(
            jnp.clip(actions, -1, 1) * jnp.asarray(self._gears)
            * self.power_scale)

        def substep(carry, _):
            q, v, factor = carry
            kin = forward_kinematics(m, q, v, dp)
            f_ext = ground_contact_forces(m, kin, dp, dt=h)
            qdd, _, factor = forward_dynamics(
                m, q, v, tau, dp, f_ext, dt=h, kin=kin,
                factor=carried_mass_factor(factor),
                return_factor=True)
            q, v = integrate(m, q, v, qdd, h)
            q, v = clamp_limits(m, q, v)
            return (q, v, factor), None

        # Unrolled substep loop: a nested lax.scan would add one more
        # while-loop level, and each loop iteration carries a large fixed
        # dispatch cost on this runtime (measured ~0.4 ms) — unrolling two
        # substeps into the step graph is strictly cheaper. The carried
        # factor feeds the frozen-mass substep scheme — measured +23%
        # throughput post phantom-collapse (8.62M vs 6.99M steps/s) but
        # kept OFF by default: a 400-iteration PPO learnability A/B shows
        # frozen-mass Humanoid never learns to run (mean step reward
        # stuck at -0.3..-0.6 vs 2.7 -> 9.0 fresh, identical seeds/
        # protocol) — the stale-M substep error lands exactly on the
        # post-impact high-|qd| states a gait must recover from
        # (carried_mass_factor docstring; BSIM_FROZEN_MASS=1 opts in
        # for throughput-first A/Bs).
        carry = (state.q, state.v, None)
        for _ in range(self.substeps):
            carry, _ = substep(carry, None)
        q, v, _ = carry
        return HumanoidState(q=q, v=v)

    def observe(self, state, params):
        q, v = state.q, state.v
        R = jax.vmap(quat_to_rot)(q[:, 3:7])
        vx_world = jnp.einsum("nij,nj->ni", R, v[:, 3:6])[:, 0]
        return jnp.concatenate([
            q[:, 2:3], q[:, 3:7], v[:, 3:6], v[:, 0:3],
            R[:, 2, 2][:, None], jnp.tanh(vx_world / 3.0)[:, None],
            q[:, jnp.asarray(self._act_q_idx)],
            v[:, jnp.asarray(self._act_v_idx)] * self.dof_vel_scale,
        ], axis=-1)

    def reward(self, state, actions, params):
        q, v = state.q, state.v
        R = jax.vmap(quat_to_rot)(q[:, 3:7])
        vx_world = jnp.einsum("nij,nj->ni", R, v[:, 3:6])[:, 0]
        up_proj = R[:, 2, 2]
        a = jnp.clip(actions, -1, 1)
        dof_vel = v[:, jnp.asarray(self._act_v_idx)]
        rew = (vx_world + 0.5
               + self.heading_weight * jnp.tanh(vx_world)
               + jnp.where(up_proj > 0.93, self.up_weight, 0.0)
               - self.actions_cost * jnp.sum(a ** 2, axis=-1)
               - self.energy_cost * jnp.sum(
                   jnp.abs(a * dof_vel * self.dof_vel_scale), axis=-1))
        dead = q[:, 2] < self.termination_height
        return jnp.where(dead, self.death_cost, rew)

    def early_termination(self, state, params):
        return state.q[:, 2] < self.termination_height

    def render_obs_frame(self, obs_row, height=200, width=200):
        """Side-view stick figure from one observation row for the
        RealSurrogate/video surface (reference collect_trajectories.py:
        40-41,81-83; exceeds reference parity — the reference renders
        Pendulum only): pelvis at the observed torso height, torso
        leaned by the base quaternion's pitch, legs posed by hip_y/knee
        (obs dof order = TREE_DOFS), arms drawn schematically from
        shoulder2/elbow."""
        obs = np.asarray(obs_row, np.float64)
        z, quat = obs[0], obs[1:5]
        dof = obs[13:34]                         # 21, TREE_DOFS order
        w, x, y, zq = quat
        # Torso z-axis projected onto the world x-z plane.
        lean = np.arctan2(2 * (x * zq + w * y),
                          1 - 2 * (x * x + y * y))
        img = np.full((height, width, 3), 255, np.uint8)
        scale = height / 2.2                      # 2.2 m field of view
        cx = width // 2
        gy = height - int(0.06 * height)
        img[gy:gy + 2, :] = (120, 120, 120)       # ground
        py = gy - int(np.clip(z, 0.1, 2.0) * scale * 0.7)

        def line(x0, y0, x1, y1, color, thick=1):
            draw_line(img, x0, y0, x1, y1, color, thick)

        torso_len = 0.45 * scale
        tx = cx + int(torso_len * np.sin(lean))
        ty = py - int(torso_len * np.cos(lean))
        line(cx, py, tx, ty, (150, 111, 214), 2)
        r = max(3, int(0.09 * scale))
        yy, xx = np.ogrid[:height, :width]
        hx = tx + int(1.5 * r * np.sin(lean))
        hy = ty - int(1.5 * r * np.cos(lean))
        img[(xx - hx) ** 2 + (yy - hy) ** 2 <= r * r] = (150, 111, 214)
        # Legs: right dofs at [3:9], left at [12:18]; hip_y is the 3rd
        # entry of each 6-dof leg block, knee the 4th.
        for off, color in ((3, (40, 40, 40)), (12, (120, 120, 120))):
            hip = lean + dof[off + 2]
            kx = cx + int(0.34 * scale * np.sin(hip))
            ky = py + int(0.34 * scale * np.cos(hip))
            line(cx, py, kx, ky, color, 1)
            knee = hip + dof[off + 3]
            fx = kx + int(0.33 * scale * np.sin(knee))
            fy = ky + int(0.33 * scale * np.cos(knee))
            line(kx, ky, fx, fy, color, 1)
        # Arms: shoulder2/elbow of each 3-dof arm block ([9:12], [18:21]).
        for off, color in ((9, (40, 40, 40)), (18, (120, 120, 120))):
            sh = lean + np.pi + 0.6 * dof[off + 1]
            ex = tx + int(0.25 * scale * np.sin(sh))
            ey = ty - int(0.25 * scale * np.cos(sh))
            line(tx, ty, ex, ey, color, 1)
            el = sh + 0.6 * dof[off + 2]
            wx2 = ex + int(0.23 * scale * np.sin(el))
            wy2 = ey - int(0.23 * scale * np.cos(el))
            line(ex, ey, wx2, wy2, color, 1)
        return img
