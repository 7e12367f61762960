"""Behavioral sanity tests for the physics-engine tasks: parameters must
affect dynamics in the physically expected direction (the property BayesSim
inference depends on)."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy

import jax
import jax.numpy as jnp

from bayes_sim_ig_tpu.distributions import MoG, to_device_distr
from bayes_sim_ig_tpu.sim import make_env
from .test_tasks import load_cfg


def _delta_env(task_name, mean, num_envs=4):
    cfg = load_cfg(task_name, num_envs)
    env = make_env(task_name, cfg)
    spec = env.task.params_spec
    mog = MoG(a=[1.0], ms=[np.asarray(mean, np.float64)],
              Ss=[np.eye(spec.dim) * 1e-12])
    env.set_distr(to_device_distr(mog, spec.lows, spec.highs))
    return env


class TestIngenuityThrust:
    def test_heavier_chassis_climbs_less(self):
        # Full upward thrust for 0.5 s: a 3x-heavier craft gains less
        # altitude — the mass dim is identifiable from trajectories.
        gains = []
        for chassis_mult in (1.0, 3.0):
            mean = np.ones(9)
            mean[0] = chassis_mult
            mean[5:] = 0.1
            env = _delta_env("Ingenuity", mean)
            obs = env.reset()
            z0 = 1.0 - np.asarray(obs)[:, 2].mean()  # target z=1 - rel_z
            act = np.zeros((4, 6), np.float32)
            act[:, 2] = 1.0
            act[:, 5] = 1.0
            for _ in range(50):
                obs, _, _, _ = env.step(jnp.asarray(act))
            z1 = 1.0 - np.asarray(obs)[:, 2].mean()
            gains.append(z1 - z0)
        assert gains[1] < gains[0] - 0.05, gains


class TestBallBalanceTilt:
    def test_leg_torque_tilts_tray_and_ball_rolls(self):
        mean = np.ones(7)
        env = _delta_env("BallBalance", mean, num_envs=4)
        obs = env.reset()
        # Constant asymmetric leg torque tilts the tray; the ball's
        # tray-frame position must move from its start.
        start = np.asarray(obs)[:, :2].copy()
        act = jnp.asarray(np.array([[1.0, -1.0, 0.0]] * 4, np.float32))
        moved = 0.0
        for _ in range(40):
            obs, _, _, _ = env.step(act)
        end = np.asarray(obs)[:, :2]
        moved = np.linalg.norm(end - start, axis=1).mean()
        assert moved > 0.02, moved

    def test_high_leg_friction_damps_response(self):
        # dof friction resists actuation: with friction 100 the driven leg
        # joints move less under the same torque.
        moves = []
        for fric in (0.1, 100.0):
            mean = np.ones(7)
            mean[1:] = fric
            env = _delta_env("BallBalance", mean, num_envs=4)
            obs = env.reset()
            q0 = np.asarray(obs)[:, 12:18].copy()  # leg dof positions
            act = jnp.asarray(np.array([[1.0, -1.0, 1.0]] * 4, np.float32))
            for _ in range(30):
                obs, _, _, _ = env.step(act)
            q1 = np.asarray(obs)[:, 12:18]
            moves.append(float(np.abs(q1 - q0).mean()))
        assert moves[1] < moves[0], moves


class TestFrankaReach:
    def test_commanded_pose_is_reached(self):
        """Strong tracking contract for the implicit PD drives: a held
        joint-space target is reached within the gravity-sag bound
        (err <= gravity_torque/kp ~ 0.11 on the loaded shoulder, much
        tighter elsewhere). The old explicit tau-PD failed this by
        0.3-0.8 rad on the low-inertia wrist joints — which made the
        drawer unopenable for any policy (caught round 3)."""
        env = _delta_env("FrankaCabinet", np.ones(19), num_envs=2)
        env.reset()
        task = env.task
        tgt = np.tile(np.array([0.5, -1.2, 0.5, -1.0, 0.5, 2.6, 1.78,
                                0.02, 0.02], np.float32), (2, 1))
        st = env.state
        env.state = st._replace(
            task_state=st.task_state._replace(targets=jnp.asarray(tgt)))
        act = jnp.zeros((2, 9), jnp.float32)
        for _ in range(150):
            env.step(act)
        q = np.asarray(env.state.task_state.q)[:, task._dof_q]
        err = np.abs(q - tgt)
        assert err[:, 1].max() < 0.2, err        # gravity-loaded shoulder
        assert np.delete(err, 1, axis=1).max() < 0.05, err

    def test_pd_arm_tracks_targets(self):
        mean = np.ones(19)
        mean[:10] = 0.8
        env = _delta_env("FrankaCabinet", mean, num_envs=2)
        obs = env.reset()
        d0 = np.linalg.norm(np.asarray(obs)[:, 20:23], axis=1).mean()
        # Drive joint 2/4 toward the cabinet for a second.
        act = np.zeros((2, 9), np.float32)
        act[:, 1] = 0.6
        act[:, 3] = 0.6
        for _ in range(60):
            obs, _, _, _ = env.step(jnp.asarray(act))
        d1 = np.linalg.norm(np.asarray(obs)[:, 20:23], axis=1).mean()
        assert d1 < d0, (d0, d1)  # hand moved toward the handle

    def test_low_drive_gain_tracks_slower(self):
        errs = []
        for gain in (1.8, 0.1):
            mean = np.ones(19)
            mean[:10] = 0.8
            mean[10:] = gain
            env = _delta_env("FrankaCabinet", mean, num_envs=2)
            env.reset()
            act = np.zeros((2, 9), np.float32)
            act[:, 0] = 1.0  # swing joint 1
            for _ in range(30):
                obs, _, _, _ = env.step(jnp.asarray(act))
            # dof_pos[0] scaled to [-1, 1]: stronger gain => moved further.
            errs.append(abs(float(np.asarray(obs)[:, 0].mean())))
        assert errs[1] < errs[0], errs


class TestShadowHandCube:
    def test_cube_scale_sets_rest_height_and_stays_finite(self):
        # Measure the cube height shortly after reset (before the unheld
        # PD wrist drifts the pose) across the full DR scale range.
        heights = []
        for scale in (0.6, 1.8):
            mean = np.ones(32)
            mean[-2] = scale  # object scale dim
            env = _delta_env("ShadowHand", mean, num_envs=2)
            obs = env.reset()
            h0 = float(np.asarray(obs)[:, 50].mean())  # pos-rel-palm z
            for _ in range(30):
                obs, _, done, _ = env.step(jnp.zeros((2, 20)))
            assert np.isfinite(np.asarray(obs)).all()
            heights.append(h0)
        # A larger cube starts/rests higher above the palm anchor.
        assert heights[1] > heights[0] + 0.02, heights

    def test_side_face_contact_pushes_cube_away(self):
        """Nearest-face selection contract (round-3 review finding: argmin
        picked the OPPOSITE face, so side-face contacts were gated off
        and spheres in a face's normal column drew phantom far-face
        forces). Asserted directly on the hand-sphere x cube-face contact
        forces: a fingertip overlapping the cube's +x side face pushes
        the cube along -x (and the finger along +x); with the cube moved
        5 cm along +x — the fingertip now sits in the face's normal
        column with an air gap, exactly the old phantom-force geometry —
        every force is zero."""
        from bayes_sim_ig_tpu.sim.shadow_hand import (
            CUBE_HALF, nearest_cube_faces)
        from bayes_sim_ig_tpu.physics.contact import (
            sphere_plane_pairs_forces)
        from bayes_sim_ig_tpu.physics import (forward_kinematics,
                                              DynParams)
        env = _delta_env("ShadowHand", np.ones(32), num_envs=1)
        env.reset()
        task = env.task
        m = task.model
        st = env.state.task_state
        kin = forward_kinematics(m, st.q, st.v, DynParams.defaults(m))
        # The ff FINGERTIP (distal) contact sphere, picked by body name.
        tip_link, tip_geom, _ = next(
            (l, g, n) for (l, g, n) in task._hand_spheres
            if "ffdistal" in n)
        R_t = np.asarray(kin.R_w[tip_link])[..., 0]
        tip = (np.asarray(kin.p_w[tip_link])[:, 0]
               + R_t @ np.asarray(tip_geom.offset))
        r = tip_geom.size[0]
        # Free-joint q is relative to the cube's parent-chain frame;
        # measure the frame origin empirically (FK at q_cube = 0).
        cq = task._cube_q
        q_probe = np.asarray(st.q).copy()
        q_probe[:, cq:cq + 3] = 0.0
        kin_probe = forward_kinematics(m, jnp.asarray(q_probe), st.v,
                                       DynParams.defaults(m))
        joint_off = np.asarray(kin_probe.p_w[task._cube])[:, 0]

        # Probe with the fingertip sphere alone: the cube is much wider
        # than the finger, so the full sphere set would add contacts
        # from phalanx spheres swallowed by the cube volume.
        sph_links = [tip_link]
        sph_off = np.asarray([tip_geom.offset], np.float32)
        radii = np.asarray([r], np.float32)
        half = jnp.full((1,), CUBE_HALF)
        dp = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None],
                                    DynParams.defaults(m))

        def face_forces(cube_center):
            q = np.asarray(st.q).copy()
            q[:, cq:cq + 3] = cube_center - joint_off
            q[:, cq + 3:cq + 7] = [1, 0, 0, 0]
            k = forward_kinematics(m, jnp.asarray(q),
                                   jnp.zeros_like(st.v), dp)
            nrm, pt = nearest_cube_faces(k, task._cube, sph_links,
                                         sph_off, half, 1)
            f = sphere_plane_pairs_forces(
                m, k, dp, sph_links, sph_off, radii,
                [task._cube] * len(sph_links), pt, nrm, 1.0,
                dt=task.dt / 2,
                plane_halfsizes=np.full(len(sph_links), CUBE_HALF))
            return np.asarray(f)

        # Cube's +x face penetrates the fingertip sphere by 5 mm.
        overlap = tip - np.array([CUBE_HALF + r - 0.005, 0, 0])
        f_hit = face_forces(overlap)
        assert f_hit[task._cube, 3, 0] < -1e-3, f_hit[task._cube]
        assert f_hit[tip_link, 3, 0] > 1e-3, f_hit[tip_link]
        # Cube 3.5 cm further away along -x: the tip sits in the +x
        # face's normal column with a 3 cm air gap. argmax -> inactive
        # (depth < 0). The argmin bug selected the -x face here, whose
        # "depth" r + 2*half + gap > 0 drew a huge phantom force through
        # the centered tangential gate.
        f_gap = face_forces(overlap - np.array([0.035, 0, 0]))
        assert np.abs(f_gap).max() == 0.0, np.abs(f_gap).max()

    def test_squeeze_cannot_crush_through_cube(self):
        """Anti-crush contract of the velocity-level contact backstop
        (contact_pairs_impulse): a max-effort full-curl squeeze — the
        adversarial worst case, servos pressing every finger into the
        cube at full drive — may transiently penetrate by the 6 mm rest
        slop plus an impact allowance, never tunnel through. Penalty-
        only contacts equilibrate ~16 cm deep here (i.e. clean through
        the 3.25 cm cube); measured on-chip the backstop holds the
        80-step rollout max at ~10.6 mm."""
        from bayes_sim_ig_tpu.sim.shadow_hand import CUBE_HALF
        from bayes_sim_ig_tpu.physics import (forward_kinematics,
                                              DynParams)
        from bayes_sim_ig_tpu.physics.spatial import quat_to_rot
        env = _delta_env("ShadowHand", np.ones(32), num_envs=2)
        env.reset()
        task = env.task
        cq = task._cube_q
        sph = [(l, np.asarray(g.offset, np.float32), g.size[0])
               for (l, g, _n) in task._hand_spheres]
        links = np.asarray([s[0] for s in sph])
        offs = np.stack([s[1] for s in sph])
        radii = np.asarray([s[2] for s in sph], np.float32)
        dp = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(jnp.asarray(a),
                                       (2,) + jnp.asarray(a).shape),
            DynParams.defaults(task.model))

        @jax.jit
        def max_pen(q, v):
            kin = forward_kinematics(task.model, q, v, dp)
            R = kin.R_w[links]
            p = kin.p_w[links]
            c = p + jnp.einsum("sijn,sj->sin", R, offs)
            cube_p = kin.p_w[task._cube]
            Rc = jax.vmap(quat_to_rot)(q[:, cq + 3:cq + 7])
            RcT = jnp.moveaxis(Rc, 0, -1)
            local = jnp.einsum("jin,sjn->sin", RcT, c - cube_p[None])
            d_face = jnp.max(jnp.abs(local), 1) - CUBE_HALF
            pen = radii[:, None] - d_face
            inside = jnp.all(
                jnp.abs(local) < CUBE_HALF + radii[:, None, None], 1)
            return jnp.max(jnp.where(inside, pen, 0.0))

        act = np.ones((2, 20), np.float32)
        act[:, 2] = 0.0
        act[:, 5] = 0.0
        worst = 0.0
        for _ in range(50):
            env.step(jnp.asarray(act))
            st = env.state.task_state
            worst = max(worst, float(max_pen(st.q, st.v)))
        assert np.isfinite(np.asarray(env.state.task_state.q)).all()
        assert worst < 0.016, worst

    def test_sustained_squeeze_holds_cube(self):
        """VERDICT round-3 item 3 'done' gate: a max-effort 200-step
        full-curl squeeze HOLDS the cube — it neither tunnels through
        (settled penetration bounded near the 6 mm rest slop across ALL
        contact points, line-manifold extras included) nor ejects it
        (the cube stays inside the fall radius for the whole run). The
        phalanx line-contact extras give the grasp torque resistance
        about each finger axis; the impulse backstop bounds the
        primaries."""
        from bayes_sim_ig_tpu.sim.shadow_hand import CUBE_HALF
        from bayes_sim_ig_tpu.physics import (forward_kinematics,
                                              DynParams)
        from bayes_sim_ig_tpu.physics.spatial import quat_to_rot
        env = _delta_env("ShadowHand", np.ones(32), num_envs=2)
        env.reset()
        task = env.task
        cq = task._cube_q
        links = np.asarray([p[0] for p in task._box_pts])
        offs = np.stack([np.asarray(p[1], np.float32)
                         for p in task._box_pts])
        radii = np.asarray([p[2] for p in task._box_pts], np.float32)
        dp = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(jnp.asarray(a),
                                       (2,) + jnp.asarray(a).shape),
            DynParams.defaults(task.model))

        @jax.jit
        def max_pen(q, v):
            kin = forward_kinematics(task.model, q, v, dp)
            R = kin.R_w[links]
            p = kin.p_w[links]
            c = p + jnp.einsum("sijn,sj->sin", R, offs)
            cube_p = kin.p_w[task._cube]
            Rc = jax.vmap(quat_to_rot)(q[:, cq + 3:cq + 7])
            RcT = jnp.moveaxis(Rc, 0, -1)
            local = jnp.einsum("jin,sjn->sin", RcT, c - cube_p[None])
            d_face = jnp.max(jnp.abs(local), 1) - CUBE_HALF
            pen = radii[:, None] - d_face
            inside = jnp.all(
                jnp.abs(local) < CUBE_HALF + radii[:, None, None], 1)
            return jnp.max(jnp.where(inside, pen, 0.0))

        # Max-effort CURL: wrist and abductions held at their neutral
        # (q = 0) targets — driving every dof to +1 rolls the wrist 28
        # degrees sideways and the cube falls off the tilted palm before
        # any grasp forms (measured; a grasp closes fingers, not the
        # wrist) — flexions and thumb opposition at full drive.
        lo, hi = task._act_lo, task._act_hi
        act = np.tile((2.0 * (0.0 - lo) / (hi - lo) - 1.0).astype(
            np.float32), (2, 1))
        flex = [3, 4, 6, 7, 9, 10, 13, 14,   # FF/MF/RF/LF J2+J0
                16, 19]                      # THJ3 + THJ0
        act[:, flex] = 1.0
        worst_settled = 0.0
        for t in range(200):
            env.step(jnp.asarray(act))
            st = env.state.task_state
            # The cube must never leave the fall radius (held, not shot
            # out of the hand by the squeeze).
            fallen = np.asarray(task._cube_fallen(st))
            assert not fallen.any(), (t, fallen)
            if t >= 100:  # settled regime: impact transients decayed
                worst_settled = max(worst_settled,
                                    float(max_pen(st.q, st.v)))
        assert np.isfinite(np.asarray(env.state.task_state.q)).all()
        # 6 mm rest slop + 4 mm sustained allowance.
        assert worst_settled < 0.010, worst_settled

    def test_force_sensor_obs_block(self):
        """Opt-in fingertip/palm force-sensor obs (VERDICT round-3 item
        8, toward IG full_state's sensor dims): with
        env.forceSensorObs, obs grows 89 -> 107 and a squeeze produces
        a finite, NONZERO palm reading of at least the cube's weight
        (the velocity-level palm rows carry the cube) plus some
        fingertip contact; the default config keeps 89 dims and a
        zeros tip_force."""
        cfg = load_cfg("ShadowHand", 4)
        cfg["env"]["forceSensorObs"] = True
        env = make_env("ShadowHand", cfg)
        task = env.task
        assert task.obs_dim == 107
        spec = task.params_spec
        mog = MoG(a=[1.0], ms=[np.ones(spec.dim, np.float64)],
                  Ss=[np.eye(spec.dim) * 1e-12])
        env.set_distr(to_device_distr(mog, spec.lows, spec.highs))
        obs = env.reset()
        assert obs.shape == (4, 107)
        lo, hi = task._act_lo, task._act_hi
        act = np.tile((2.0 * (0.0 - lo) / (hi - lo) - 1.0).astype(
            np.float32), (4, 1))
        act[:, [3, 4, 6, 7, 9, 10, 13, 14, 16, 19]] = 1.0  # full curl
        for _ in range(60):
            env.step(jnp.asarray(act))
        tf = np.asarray(env.state.task_state.tip_force)
        assert np.isfinite(tf).all()
        sensor_f = np.linalg.norm(tf.reshape(4, 6, 3), axis=2)
        # Palm (sensor 5) carries at least the ~0.78 N cube weight in
        # every env (a full curl grips via palm + proximal/middle
        # phalanges; the DISTAL sensors — where IG mounts them — curl
        # past the small cube, correctly reading ~0).
        assert (sensor_f[:, 5] > 0.5).all(), sensor_f[:, 5]
        obs = np.asarray(task.observe(env.state.task_state,
                                      env.state.params))
        np.testing.assert_array_equal(obs[:, 89:], tf)
        # Half curl presses fingerTIPS onto the cube's top face: some
        # distal sensor reads contact (tip placement varies with the
        # per-env reset jitter, so the gate is batch-wide).
        env.reset()
        act = np.tile((2.0 * (0.0 - lo) / (hi - lo) - 1.0).astype(
            np.float32), (4, 1))
        act[:, [3, 6, 9, 13]] = 0.4    # FF/MF/RF/LF J2
        act[:, [4, 7, 10, 14]] = 0.2   # J0c (distal+middle coupled)
        act[:, [16, 19]] = 0.4         # thumb
        for _ in range(60):
            env.step(jnp.asarray(act))
        tf2 = np.asarray(env.state.task_state.tip_force)
        tips2 = np.linalg.norm(tf2.reshape(4, 6, 3), axis=2)[:, :5]
        assert np.isfinite(tf2).all()
        # Light touch: O(0.01 N) distal readings are the real signal at
        # this pose (the cube weighs 0.78 N and rests on the palm; the
        # tips only graze its top face).
        assert tips2.max() > 0.01, tips2
        # Default config: dims and the zeros block unchanged.
        env0 = _delta_env("ShadowHand", np.ones(32), num_envs=2)
        assert env0.task.obs_dim == 89
        env0.reset()
        env0.step(jnp.zeros((2, 20)))
        assert not np.asarray(env0.state.task_state.tip_force).any()

    def test_full_state_obs_layout(self):
        """`observationType: "full_state"` (the reference's shipped
        value, /root/reference/bayes_sim_ig/cfg/shadow_hand.yaml:42;
        VERDICT round-4 item 4) selects the 211-dim IG-layout obs:
        dof pos/vel/force (3x24), object 13, goal 11, fingertip states
        5x13, force/torque sensors 5x6, actions 20 — with the dof-force
        and sensor blocks responding to a squeeze and the fingertip
        block carrying real kinematics."""
        cfg = load_cfg("ShadowHand", 4)
        cfg["env"]["observationType"] = "full_state"
        env = make_env("ShadowHand", cfg)
        task = env.task
        assert task.obs_dim == 211
        spec = task.params_spec
        mog = MoG(a=[1.0], ms=[np.ones(spec.dim, np.float64)],
                  Ss=[np.eye(spec.dim) * 1e-12])
        env.set_distr(to_device_distr(mog, spec.lows, spec.highs))
        obs = env.reset()
        assert obs.shape == (4, 211)
        lo, hi = task._act_lo, task._act_hi
        act = np.tile((2.0 * (0.0 - lo) / (hi - lo) - 1.0).astype(
            np.float32), (4, 1))
        act[:, [3, 4, 6, 7, 9, 10, 13, 14, 16, 19]] = 1.0  # full curl
        for _ in range(60):
            env.step(jnp.asarray(act))
        ts = env.state.task_state
        # Raw layout via observe() (no noise lambda in the way).
        obs = np.asarray(task.observe(ts, env.state.params))
        assert np.isfinite(obs).all()
        # dof force block [48:72]: the curled servos push against the
        # drive-effort clamp, so scaled readings are nonzero.
        assert np.abs(obs[:, 48:72]).max() > 0.01
        # fingertip block [96:161]: positions within 0.5 m of the palm
        # anchor, unit quaternions.
        tips = obs[:, 96:161].reshape(4, 5, 13)
        assert (np.linalg.norm(tips[:, :, :3]
                               - np.array([0.06, 0.0, 0.32]),
                               axis=-1) < 0.5).all()
        np.testing.assert_allclose(
            np.linalg.norm(tips[:, :, 3:7], axis=-1), 1.0, atol=1e-4)
        # sensor block [161:191] interleaves the state's force/torque
        # (x FORCE_TORQUE_OBS_SCALE); actions block [191:211] IS
        # prev_actions.
        sens = obs[:, 161:191].reshape(4, 5, 6)
        tf = np.asarray(ts.tip_force).reshape(4, 6, 3)
        np.testing.assert_allclose(
            sens[:, :, :3], tf[:, :5] * task.FORCE_TORQUE_OBS_SCALE,
            rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(
            obs[:, 191:211], np.asarray(ts.prev_actions))
        # The palm still carries the cube (same physics as the legacy
        # sensor test): total contact force is alive.
        assert np.abs(tf).max() > 0.1

    def test_fingers_cannot_cross_through_each_other(self):
        """Finger-finger self-collision (round-3 addition closing the
        PARITY.md contact caveat): abducting FF toward -y and MF toward
        +y commands their tips through each other (lateral reach
        ~0.032 m each vs a 0.022 m gap — without the sphere-sphere
        pairs they swap sides). With self-collision they must stop at
        contact: FF (which starts at higher y) keeps y_ff > y_mf, and
        same-segment sphere centers stay outside ~the radii sum."""
        from bayes_sim_ig_tpu.physics import (forward_kinematics,
                                              DynParams)
        env = _delta_env("ShadowHand", np.ones(32), num_envs=2)
        env.reset()
        task = env.task
        act = np.zeros((2, 20), np.float32)
        act[:, 2] = -1.0                      # FFJ3 abduction toward MF
        act[:, 5] = 1.0                       # MFJ3 abduction toward FF
        for _ in range(60):
            env.step(jnp.asarray(act))
        st = env.state.task_state
        assert np.isfinite(np.asarray(st.q)).all()
        dp = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(jnp.asarray(a),
                                       (2,) + jnp.asarray(a).shape),
            DynParams.defaults(task.model))
        kin = forward_kinematics(task.model, st.q, st.v, dp)

        def center(name_substr):
            link, geom, _ = next((l, g, n) for (l, g, n)
                                 in task._hand_spheres if name_substr in n)
            R = np.moveaxis(np.asarray(kin.R_w[link]), -1, 0)  # (N,3,3)
            p = np.asarray(kin.p_w[link]).T                    # (N,3)
            return p + R @ np.asarray(geom.offset), geom.size[0]

        for seg in ("proximal", "middle", "distal"):
            c_ff, r_ff = center(f"ff{seg}")
            c_mf, r_mf = center(f"mf{seg}")
            gap = np.linalg.norm(c_ff - c_mf, axis=-1)
            # Penalty contacts permit bounded penetration, not crossing.
            assert (gap > 0.55 * (r_ff + r_mf)).all(), (seg, gap)
        c_ff, _ = center("ffdistal")
        c_mf, _ = center("mfdistal")
        assert (c_ff[:, 1] > c_mf[:, 1]).all(), (c_ff[:, 1], c_mf[:, 1])
