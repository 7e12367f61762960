"""Physics-core tests against analytic oracles: Featherstone dynamics,
integration stability, and penalty contacts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayes_sim_ig_tpu.physics import (
    ArticulatedModel, LinkSpec, Geom, DynParams,
    forward_kinematics, forward_dynamics, integrate, mass_matrix,
    ground_contact_forces,
)
from bayes_sim_ig_tpu.physics.dynamics import _link_inertias
from bayes_sim_ig_tpu.physics.spatial import quat_to_rot


def _ball(mass=1.0, inertia=0.004, radius=0.1, with_geom=True):
    return ArticulatedModel(
        [LinkSpec("ball", parent=-1, joint_type="free", mass=mass,
                  inertia=(inertia,) * 3)],
        geoms=[Geom(link=0, kind="sphere", size=(radius,))]
        if with_geom else [],
        fixed_base=False)


def _step_fn(model, params, dt=1 / 240.0, n=240, tau=jnp.zeros(0)):
    nv = model.nv

    @jax.jit
    def run(q, v):
        def body(carry, _):
            q, v = carry
            kin = forward_kinematics(model, q, v, params)
            f = ground_contact_forces(model, kin, params, dt=dt)
            qdd, _ = forward_dynamics(model, q, v, jnp.zeros(nv), params, f)
            return integrate(model, q, v, qdd, dt), None
        return jax.lax.scan(body, (q, v), None, length=n)[0]

    return run


class TestDynamicsOracles:
    def test_simple_pendulum_acceleration(self):
        # Point mass m at distance l: thdd = -(g/l) sin(th).
        l, m = 1.0, 2.0
        pend = ArticulatedModel([LinkSpec(
            "rod", parent=-1, joint_type="revolute", joint_axis=(0, 1, 0),
            mass=m, com=(0, 0, -l), inertia=(1e-9, 1e-9, 1e-9))])
        params = DynParams.defaults(pend)
        qdd, _ = forward_dynamics(pend, jnp.array([0.3]), jnp.zeros(1),
                                  jnp.zeros(1), params)
        assert float(qdd[0]) == pytest.approx(-9.81 / l * np.sin(0.3),
                                              rel=1e-4)

    def test_free_fall(self):
        ball = _ball(with_geom=False)
        params = DynParams.defaults(ball)
        q = jnp.asarray(ball.neutral_q(), jnp.float32)
        qdd, _ = forward_dynamics(ball, q, jnp.zeros(6), jnp.zeros(6),
                                  params)
        np.testing.assert_allclose(np.asarray(qdd),
                                   [0, 0, 0, 0, 0, -9.81], atol=1e-5)

    def test_external_force_world_invariant_under_rotation(self):
        from bayes_sim_ig_tpu.physics.spatial import quat_from_axis_angle
        ball = _ball(mass=2.0, with_geom=False)
        params = DynParams.defaults(ball)._replace(gravity=jnp.zeros(3))
        for ang in (0.0, np.pi / 2, 2.3):
            quat = quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]),
                                        jnp.asarray(ang))
            q = jnp.asarray(ball.neutral_q(),
                            jnp.float32).at[3:7].set(quat)
            f_ext = jnp.zeros((1, 6)).at[0, 3].set(1.0)  # world +x
            qdd, _ = forward_dynamics(ball, q, jnp.zeros(6), jnp.zeros(6),
                                      params, f_ext)
            aw = np.asarray(quat_to_rot(q[3:7])) @ np.asarray(qdd[3:6])
            np.testing.assert_allclose(aw, [0.5, 0, 0], atol=1e-5)

    def test_mass_matrix_symmetric_pd(self):
        dbl = ArticulatedModel([
            LinkSpec("l1", parent=-1, joint_type="revolute",
                     joint_axis=(0, 1, 0), mass=1.0, com=(0, 0, -0.5),
                     inertia=(1 / 12, 1 / 12, 1e-9)),
            LinkSpec("l2", parent=0, joint_type="revolute",
                     joint_axis=(0, 1, 0), joint_pos=(0, 0, -1.0),
                     mass=1.0, com=(0, 0, -0.5),
                     inertia=(1 / 12, 1 / 12, 1e-9))])
        params = DynParams.defaults(dbl)
        kin = forward_kinematics(dbl, jnp.array([1.2, 0.4]), jnp.zeros(2),
                                 params)
        M = np.asarray(mass_matrix(dbl, kin, _link_inertias(dbl, params)))
        np.testing.assert_allclose(M, M.T, atol=1e-5)
        assert np.linalg.eigvalsh(M).min() > 0

    def test_double_pendulum_energy_drift_small(self):
        dbl = ArticulatedModel([
            LinkSpec("l1", parent=-1, joint_type="revolute",
                     joint_axis=(0, 1, 0), mass=1.0, com=(0, 0, -0.5),
                     inertia=(1 / 12, 1 / 12, 1e-9)),
            LinkSpec("l2", parent=0, joint_type="revolute",
                     joint_axis=(0, 1, 0), joint_pos=(0, 0, -1.0),
                     mass=1.0, com=(0, 0, -0.5),
                     inertia=(1 / 12, 1 / 12, 1e-9))])
        params = DynParams.defaults(dbl)

        def energy(q, v):
            kin = forward_kinematics(dbl, q, v, params)
            I = _link_inertias(dbl, params)
            ke = sum(0.5 * kin.v[i] @ (I[i] @ kin.v[i]) for i in range(2))
            pe = sum(params.mass[i] * 9.81
                     * (kin.p_w[i] + kin.R_w[i] @ params.com[i])[2]
                     for i in range(2))
            return float(ke + pe)

        @jax.jit
        def run(q, v):
            def body(carry, _):
                q, v = carry
                qdd, _ = forward_dynamics(dbl, q, v, jnp.zeros(2), params)
                return integrate(dbl, q, v, qdd, 0.001), None
            return jax.lax.scan(body, (q, v), None, length=2000)[0]

        q, v = jnp.array([1.2, 0.4]), jnp.zeros(2)
        e0 = energy(q, v)
        q, v = run(q, v)
        assert abs(energy(q, v) - e0) / abs(e0) < 0.03

    def test_spinning_free_fall_no_energy_pump(self):
        # The body-frame transport term must not inflate velocities
        # (world-frame free-joint integration).
        ball = _ball(mass=2.0, with_geom=False)
        params = DynParams.defaults(ball)
        q = jnp.asarray(ball.neutral_q(), jnp.float32).at[2].set(0.1)
        v = jnp.zeros(6).at[1].set(10.0)  # strong spin
        run = _step_fn(ball, params)
        q1, v1 = run(q, v)

        def energy(q, v):
            return (0.5 * 2.0 * float(v[3:] @ v[3:])
                    + 0.5 * 0.004 * float(v[:3] @ v[:3])
                    + 2.0 * 9.81 * float(q[2]))

        # Semi-implicit Euler has an O(dt) bias but must not grow energy.
        assert energy(q1, v1) <= energy(q, v) + 0.01


class TestBatchConsistency:
    @pytest.mark.heavy  # 39 s: the slowest single test; CI full suite
    def test_batched_equals_stacked_single_env(self):
        # The natively-batched engine on (N, ..) inputs must equal N
        # independent single-env calls (catches any batch-axis mixing).
        from bayes_sim_ig_tpu.sim import make_env
        from bayes_sim_ig_tpu.distributions import (Uniform,
                                                    to_device_distr)
        from bayes_sim_ig_tpu.physics.dynamics import forward_dynamics
        from bayes_sim_ig_tpu.physics.contact import ground_contact_forces
        from bayes_sim_ig_tpu.physics.dynamics import forward_kinematics
        import yaml
        import os
        cfg = yaml.safe_load(open(os.path.join(
            os.path.dirname(__file__), "..", "bayes_sim_ig_tpu", "cfg",
            "ant.yaml")))
        cfg["env"]["numEnvs"] = 3
        env = make_env("Ant", cfg)
        spec = env.task.params_spec
        env.set_distr(to_device_distr(Uniform(spec.lows, spec.highs)))
        env.reset()
        rs = np.random.RandomState(4)
        for _ in range(5):
            env.step(jnp.asarray(rs.uniform(-1, 1, (3, 8)), jnp.float32))
        st = env.state
        m = env.task.model
        dp = jax.vmap(env.task._dyn_params)(st.params)
        q, v = st.task_state.q, st.task_state.v
        tau = jnp.asarray(rs.randn(3, m.nv).astype(np.float32) * 5.0)
        kin = forward_kinematics(m, q, v, dp)
        f_ext = ground_contact_forces(m, kin, dp)
        qdd_b, _ = forward_dynamics(m, q, v, tau, dp, f_ext,
                                    dt=1 / 120.0, kin=kin)
        for i in range(3):
            dp_i = jax.tree_util.tree_map(lambda a: a[i], dp)
            kin_i = forward_kinematics(m, q[i], v[i], dp_i)
            f_i = ground_contact_forces(m, kin_i, dp_i)
            qdd_i, _ = forward_dynamics(m, q[i], v[i], tau[i], dp_i,
                                        f_i, dt=1 / 120.0, kin=kin_i)
            np.testing.assert_allclose(np.asarray(qdd_b[i]),
                                       np.asarray(qdd_i),
                                       rtol=2e-3, atol=2e-3)


class TestForwardKinematicsOracle:
    def test_three_link_chain_world_poses(self):
        # Independent closed-form check: planar z-revolute + y-revolute +
        # x-prismatic chain, world positions computed by hand trig.
        chain = ArticulatedModel([
            LinkSpec("l1", parent=-1, joint_type="revolute",
                     joint_axis=(0, 0, 1)),
            LinkSpec("l2", parent=0, joint_type="revolute",
                     joint_axis=(0, 1, 0), joint_pos=(0.5, 0.0, 0.0)),
            LinkSpec("l3", parent=1, joint_type="prismatic",
                     joint_axis=(1, 0, 0), joint_pos=(0.4, 0.0, 0.0))])
        from bayes_sim_ig_tpu.physics.dynamics import forward_kinematics
        th1, th2, d3 = 0.7, -0.4, 0.25
        params = DynParams.defaults(chain)
        kin = forward_kinematics(chain, jnp.array([th1, th2, d3]),
                                 jnp.zeros(3), params)
        c1, s1 = np.cos(th1), np.sin(th1)
        c2, s2 = np.cos(th2), np.sin(th2)
        # l2 origin: rotate (0.5, 0, 0) by th1 about z.
        np.testing.assert_allclose(np.asarray(kin.p_w[1]),
                                   [0.5 * c1, 0.5 * s1, 0.0], atol=1e-6)
        # l3 origin: l2 origin + R1 R2 ((0.4, 0, 0) + d3 x^).
        arm = np.array([(0.4 + d3) * c2, 0.0, -(0.4 + d3) * s2])
        Rz = np.array([[c1, -s1, 0], [s1, c1, 0], [0, 0, 1]])
        np.testing.assert_allclose(
            np.asarray(kin.p_w[2]),
            np.asarray(kin.p_w[1]) + Rz @ arm, atol=1e-6)
        # l3 world rotation = Rz(th1) @ Ry(th2) (prismatic adds none).
        Ry = np.array([[c2, 0, s2], [0, 1, 0], [-s2, 0, c2]])
        np.testing.assert_allclose(np.asarray(kin.R_w[2]), Rz @ Ry,
                                   atol=1e-6)
        # Geometry scale multiplies the fixed link offsets.
        kin_s = forward_kinematics(
            chain, jnp.array([th1, th2, d3]), jnp.zeros(3),
            params._replace(scale=jnp.asarray(2.0)))
        np.testing.assert_allclose(np.asarray(kin_s.p_w[1]),
                                   [1.0 * c1, 1.0 * s1, 0.0], atol=1e-6)

    def test_world_velocities_match_finite_differences(self):
        # kin.v (body [w; vl] at link origins) against numeric d(pose)/dt.
        from bayes_sim_ig_tpu.physics.dynamics import forward_kinematics
        chain = ArticulatedModel([
            LinkSpec("l1", parent=-1, joint_type="revolute",
                     joint_axis=(0, 0, 1)),
            LinkSpec("l2", parent=0, joint_type="revolute",
                     joint_axis=(0, 1, 0), joint_pos=(0.5, 0.0, 0.0))])
        params = DynParams.defaults(chain)
        q = jnp.array([0.3, 0.9])
        qd = jnp.array([1.3, -0.7])
        eps = 1e-4
        kin = forward_kinematics(chain, q, qd, params)
        k0 = forward_kinematics(chain, q - eps * qd, jnp.zeros(2), params)
        k1 = forward_kinematics(chain, q + eps * qd, jnp.zeros(2), params)
        for i in range(2):
            vl_world = (np.asarray(k1.p_w[i]) - np.asarray(k0.p_w[i])) \
                / (2 * eps)
            vl_body = np.asarray(kin.R_w[i]).T @ vl_world
            np.testing.assert_allclose(np.asarray(kin.v[i][3:]), vl_body,
                                       atol=1e-3)


class TestPluckerInertia:
    def test_direct_equals_transform(self):
        # The hot path builds spatial inertias about o directly from
        # world COM/rotation (_plucker_inertia_direct); it must equal the
        # body-frame build + congruence transform on valid states.
        from bayes_sim_ig_tpu.physics.dynamics import (
            forward_kinematics, _link_inertias, _inertia_to_plucker,
            _plucker_inertia_direct, _promote)
        dbl = ArticulatedModel([
            LinkSpec("base", parent=-1, joint_type="free", mass=2.0,
                     com=(0.1, -0.05, 0.2), inertia=(0.03, 0.02, 0.05)),
            LinkSpec("arm", parent=0, joint_type="revolute",
                     joint_axis=(0, 1, 0), joint_pos=(0.3, 0.0, 0.1),
                     mass=0.7, com=(0.2, 0, 0),
                     inertia=(0.01, 0.02, 0.02))], fixed_base=False)
        params = DynParams.defaults(dbl)._replace(
            scale=jnp.asarray(1.3))
        q = jnp.asarray(dbl.neutral_q(), jnp.float32)
        from bayes_sim_ig_tpu.physics.spatial import quat_from_axis_angle
        quat = quat_from_axis_angle(
            jnp.array([0.26726124, 0.53452248, 0.80178373]),
            jnp.asarray(1.1))
        q = q.at[0:3].set(jnp.array([0.4, -0.2, 0.9]))
        q = q.at[3:7].set(quat).at[7].set(0.7)
        kin = forward_kinematics(dbl, q[None],
                                 jnp.zeros((1, dbl.nv)),
                                 _promote(params))
        I1 = _inertia_to_plucker(
            kin, _link_inertias(dbl, _promote(params)))
        I2 = _plucker_inertia_direct(kin, _promote(params))
        np.testing.assert_allclose(np.asarray(I2), np.asarray(I1),
                                   rtol=1e-4, atol=1e-5)


class TestContacts:
    def test_batched_pairs_equal_single_pairs(self):
        # sphere_plane_pairs_forces (one vectorized computation, the
        # ShadowHand hot path) must equal the sum of per-pair
        # sphere_plane_pair_forces calls.
        from bayes_sim_ig_tpu.physics.contact import (
            sphere_plane_pair_forces, sphere_plane_pairs_forces)
        from bayes_sim_ig_tpu.physics.dynamics import (
            forward_kinematics, _promote)
        model = ArticulatedModel([
            LinkSpec("tray", parent=-1, joint_type="free", mass=2.0,
                     inertia=(0.02,) * 3),
            LinkSpec("ball", parent=-1, joint_type="free", mass=0.5,
                     inertia=(0.002,) * 3)], fixed_base=False)
        params = DynParams.defaults(model)
        n = 3
        rs = np.random.RandomState(0)
        q = np.tile(model.neutral_q(), (n, 1)).astype(np.float32)
        q[:, 2] = 0.5
        q[:, 7:10] = rs.uniform(-0.05, 0.05, (n, 3)) + [0, 0, 0.62]
        v = jnp.asarray(rs.randn(n, model.nv).astype(np.float32) * 0.3)
        paramsb = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(jnp.asarray(a),
                                       (n,) + jnp.asarray(a).shape),
            params)
        kin = forward_kinematics(model, jnp.asarray(q), v, paramsb)
        pairs = [  # (offset, radius, point, normal, mu, halfsize)
            ((0.0, 0.0, 0.0), 0.1, (0.0, 0.0, 0.02), (0, 0, 1), 1.0, 0.5),
            ((0.05, 0.0, 0.0), 0.08, (0.0, 0.0, 0.02), (0, 0, 1), 0.7,
             0.5),
            ((0.0, 0.0, -0.09), 0.02, (0.1, 0.0, 0.0), (1, 0, 0), 1.2,
             0.3),
        ]
        total = 0.0
        for off, r, pt, nrm, mu, hs in pairs:
            total = total + sphere_plane_pair_forces(
                model, kin, paramsb, sphere_link=1, sphere_offset=off,
                radius=r, plane_link=0, plane_point=pt, plane_normal=nrm,
                mu=mu, dt=1 / 120.0, plane_halfsize=hs)
        batched = sphere_plane_pairs_forces(
            model, kin, paramsb,
            sphere_links=[1, 1, 1],
            sphere_offsets=np.asarray([p[0] for p in pairs]),
            radii=np.asarray([p[1] for p in pairs]),
            plane_links=[0, 0, 0],
            plane_points=np.asarray([p[2] for p in pairs]),
            plane_normals=np.asarray([p[3] for p in pairs]),
            mu=np.asarray([p[4] for p in pairs]), dt=1 / 120.0,
            plane_halfsizes=np.asarray([p[5] for p in pairs]))
        assert float(jnp.abs(total).max()) > 0.0, "no active contact"
        np.testing.assert_allclose(np.asarray(batched), np.asarray(total),
                                   rtol=1e-4, atol=1e-4)

    def test_sphere_sphere_oracle(self):
        # Two overlapping free balls at rest: the penalty normal force is
        # f_n = m_eff * depth / tau^2 along the center line, equal and
        # opposite (zero net force), zero when separated.
        from bayes_sim_ig_tpu.physics.contact import (
            sphere_sphere_pairs_forces)
        from bayes_sim_ig_tpu.physics.dynamics import forward_kinematics
        model = ArticulatedModel([
            LinkSpec("a", parent=-1, joint_type="free", mass=2.0,
                     inertia=(0.02,) * 3),
            LinkSpec("b", parent=-1, joint_type="free", mass=0.5,
                     inertia=(0.002,) * 3)], fixed_base=False)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[None], DynParams.defaults(model))
        r_a, r_b = 0.1, 0.08
        tau = 0.02

        def forces(gap):
            q = np.tile(model.neutral_q(), (1, 1)).astype(np.float32)
            q[:, 0:3] = [0.0, 0.0, 0.5]
            q[:, 7:10] = [r_a + r_b + gap, 0.0, 0.5]
            kin = forward_kinematics(model, jnp.asarray(q),
                                     jnp.zeros((1, model.nv)), params)
            return np.asarray(sphere_sphere_pairs_forces(
                model, kin, params, links_a=[0], offsets_a=[(0., 0., 0.)],
                radii_a=[r_a], links_b=[1], offsets_b=[(0., 0., 0.)],
                radii_b=[r_b], mu=1.0, dt=1 / 120.0, tau=tau))[..., 0]

        depth = 0.01
        f = forces(-depth)
        m_eff = 1.0 / (1.0 / 2.0 + 1.0 / 0.5)
        f_exp = m_eff * depth / tau ** 2
        # Sphere b sits at +x of a, so a is pushed along -x, b along +x.
        assert f[0, 3] == pytest.approx(-f_exp, rel=1e-4)
        assert f[1, 3] == pytest.approx(f_exp, rel=1e-4)
        np.testing.assert_allclose(f[0, 3:] + f[1, 3:], 0.0, atol=1e-4)
        # Centers aligned with both COMs: no torque about either COM.
        np.testing.assert_allclose(f[:, :3], 0.0, atol=1e-5)
        np.testing.assert_allclose(forces(+0.01), 0.0)

    def test_sphere_sphere_batched_equals_single(self):
        from bayes_sim_ig_tpu.physics.contact import (
            sphere_sphere_pairs_forces)
        from bayes_sim_ig_tpu.physics.dynamics import forward_kinematics
        model = ArticulatedModel([
            LinkSpec("a", parent=-1, joint_type="free", mass=1.0,
                     inertia=(0.01,) * 3),
            LinkSpec("b", parent=-1, joint_type="free", mass=0.5,
                     inertia=(0.002,) * 3)], fixed_base=False)
        params = DynParams.defaults(model)
        n = 3
        rs = np.random.RandomState(1)
        q = np.tile(model.neutral_q(), (n, 1)).astype(np.float32)
        q[:, 0:3] = [0.0, 0.0, 0.5]
        q[:, 7:10] = rs.uniform(-0.02, 0.02, (n, 3)) + [0.15, 0.0, 0.5]
        v = rs.randn(n, model.nv).astype(np.float32) * 0.5
        paramsb = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(jnp.asarray(a),
                                       (n,) + jnp.asarray(a).shape),
            params)
        kinb = forward_kinematics(model, jnp.asarray(q), jnp.asarray(v),
                                  paramsb)
        kwargs = dict(links_a=[0, 0], offsets_a=[(0.05, 0., 0.),
                                                 (0., 0., 0.)],
                      radii_a=[0.08, 0.1], links_b=[1, 1],
                      offsets_b=[(0., 0., 0.), (0.01, 0., 0.)],
                      radii_b=[0.06, 0.05], mu=np.asarray([1.0, 0.7]),
                      dt=1 / 120.0)
        batched = np.asarray(sphere_sphere_pairs_forces(
            model, kinb, paramsb, **kwargs))
        assert np.abs(batched).max() > 0.0, "no active contact"
        for e in range(n):
            params1 = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a)[None], params)
            kin1 = forward_kinematics(model, jnp.asarray(q[e:e + 1]),
                                      jnp.asarray(v[e:e + 1]), params1)
            single = np.asarray(sphere_sphere_pairs_forces(
                model, kin1, params1, **kwargs))
            np.testing.assert_allclose(batched[..., e], single[..., 0],
                                       rtol=1e-4, atol=1e-5)

    def test_sphere_sphere_impulse_stops_approach(self):
        # Velocity-level contact pass: two overlapping balls approaching
        # head-on must leave with non-negative (separating >= Baumgarte
        # bias) relative normal velocity, with momentum conserved; when
        # separated, the velocity is untouched.
        from bayes_sim_ig_tpu.physics.contact import sphere_sphere_impulse
        from bayes_sim_ig_tpu.physics.dynamics import (forward_dynamics,
                                                       forward_kinematics)
        model = ArticulatedModel([
            LinkSpec("a", parent=-1, joint_type="free", mass=2.0,
                     inertia=(0.02,) * 3),
            LinkSpec("b", parent=-1, joint_type="free", mass=0.5,
                     inertia=(0.002,) * 3)], fixed_base=False)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[None], DynParams.defaults(model))
        r_a, r_b = 0.1, 0.08
        dt = 1 / 120.0

        def run(gap, vx_b=-1.0):
            q = np.tile(model.neutral_q(), (1, 1)).astype(np.float32)
            q[:, 0:3] = [0.0, 0.0, 0.5]
            q[:, 7:10] = [r_a + r_b + gap, 0.0, 0.5]
            v = jnp.zeros((1, model.nv)).at[0, 9].set(vx_b)  # b toward a
            kin = forward_kinematics(model, jnp.asarray(q), v, params)
            _, _, factor = forward_dynamics(
                model, jnp.asarray(q), v, jnp.zeros((1, model.nv)),
                params, dt=dt, kin=kin, return_factor=True)
            v_new = sphere_sphere_impulse(
                model, kin, factor, v, params, links_a=[0],
                offsets_a=[(0., 0., 0.)], radii_a=[r_a], links_b=[1],
                offsets_b=[(0., 0., 0.)], radii_b=[r_b], dt=dt)
            return np.asarray(v), np.asarray(v_new)

        v0, v1 = run(-0.005)
        # Relative normal velocity (b->a normal is -x: v_n = -(vx_a-vx_b))
        v_n_new = -(v1[0, 3] - v1[0, 9])
        assert v_n_new >= -1e-5, v1
        # Momentum conserved: m_a dv_a + m_b dv_b = 0 along x.
        assert 2.0 * (v1[0, 3] - v0[0, 3]) + 0.5 * (v1[0, 9] - v0[0, 9]) \
            == pytest.approx(0.0, abs=1e-5)
        # No angular impulse for center-line contact through both COMs.
        np.testing.assert_allclose(v1[0, [0, 1, 2, 6, 7, 8]], 0.0,
                                   atol=1e-6)
        # Separated: untouched even while approaching.
        v0, v1 = run(+0.02)
        np.testing.assert_allclose(v1, v0, atol=1e-7)

    def test_sphere_box_face_matches_plane_and_handles_edges(self):
        # On a pure face overlap the box closest-point contact must
        # reproduce the plane-pair force; diagonally across an edge the
        # patch-gated plane model reports nothing while the box contact
        # pushes along the edge diagonal; beyond the corner with an air
        # gap it is zero.
        from bayes_sim_ig_tpu.physics.contact import (
            sphere_box_pairs_forces, sphere_plane_pairs_forces)
        from bayes_sim_ig_tpu.physics.dynamics import forward_kinematics
        model = ArticulatedModel([
            LinkSpec("box", parent=-1, joint_type="free", mass=0.08,
                     inertia=(6e-5,) * 3),
            LinkSpec("ball", parent=-1, joint_type="free", mass=0.02,
                     inertia=(5e-6,) * 3)], fixed_base=False)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[None], DynParams.defaults(model))
        half, r = 0.0325, 0.009
        rs = np.random.RandomState(3)

        def kin_at(ball_pos, v=None):
            q = np.tile(model.neutral_q(), (1, 1)).astype(np.float32)
            q[:, 0:3] = [0.0, 0.0, 0.5]
            q[:, 7:10] = np.asarray(ball_pos) + [0.0, 0.0, 0.5]
            # small enough that the damping term cannot zero the
            # critically-damped normal force at 4 mm depth
            vv = jnp.asarray(v) if v is not None else \
                jnp.asarray(rs.randn(1, model.nv).astype(np.float32)
                            * 0.02)
            return forward_kinematics(model, jnp.asarray(q), vv, params)

        def box_f(kin):
            return np.asarray(sphere_box_pairs_forces(
                model, kin, params, [1], [(0., 0., 0.)], [r], 0,
                half, mu=0.9, dt=1 / 120.0))

        # Static face contact (+z, 4 mm deep): equals the plane-pair
        # model. (Compared at rest: with sliding friction the two models
        # legitimately differ in torque by depth*n x f_t — the box op
        # anchors the contact at the box SURFACE point, the plane op at
        # the sphere's lowest point.)
        kin = kin_at([0.004, -0.006, half + r - 0.004],
                     v=np.zeros((1, model.nv)))
        f_box = box_f(kin)
        f_plane = np.asarray(sphere_plane_pairs_forces(
            model, kin, params, [1], [(0., 0., 0.)], [r], [0],
            [(0., 0., half)], [(0., 0., 1.)], 0.9, dt=1 / 120.0,
            plane_halfsizes=[half]))
        assert np.abs(f_box).max() > 0
        np.testing.assert_allclose(f_box, f_plane, rtol=1e-4, atol=1e-5)
        # Edge overlap: center outside both face columns, within r of
        # the x-z edge. Normal = diagonal, so the ball is pushed +x and
        # +z; the face-patch plane model reports nothing here.
        d = half + r * 0.5 / np.sqrt(2)
        kin = kin_at([d, 0.0, d], v=np.zeros((1, model.nv)))
        f_box = box_f(kin)
        assert f_box[1, 3] > 0 and f_box[1, 5] > 0, f_box[1]
        assert f_box[1, 3] == pytest.approx(f_box[1, 5], rel=1e-3)
        # Past the corner with an air gap: zero.
        g = half + r * 1.01 / np.sqrt(3)
        assert np.abs(box_f(kin_at([g, g, g],
                                   v=np.zeros((1, model.nv))))).max() == 0

    def test_halfsize_gates_tangential_axes_for_any_normal(self):
        # The patch gate must bound the TWO in-plane axes whatever the
        # plane-frame normal direction. For a y-normal pad (Franka finger
        # pads, cube side faces) the old component-0/1 gate left the z
        # extent unbounded and gated the (always-tiny) normal distance
        # instead (round-3 review finding).
        from bayes_sim_ig_tpu.physics.contact import (
            sphere_plane_pair_forces)
        from bayes_sim_ig_tpu.physics.dynamics import forward_kinematics
        model = ArticulatedModel([
            LinkSpec("pad", parent=-1, joint_type="free", mass=2.0,
                     inertia=(0.02,) * 3),
            LinkSpec("ball", parent=-1, joint_type="free", mass=0.5,
                     inertia=(0.002,) * 3)], fixed_base=False)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[None], DynParams.defaults(model))
        hs = 0.05

        def force_at(ball_pos):
            q = np.tile(model.neutral_q(), (1, 1)).astype(np.float32)
            q[:, 0:3] = [0.0, 0.0, 0.5]          # pad body
            q[:, 7:10] = ball_pos
            kin = forward_kinematics(model, jnp.asarray(q),
                                     jnp.zeros((1, model.nv)), params)
            f = sphere_plane_pair_forces(
                model, kin, params, sphere_link=1,
                sphere_offset=(0, 0, 0), radius=0.03, plane_link=0,
                plane_point=(0.0, 0.1, 0.0), plane_normal=(0, 1, 0),
                mu=1.0, dt=1 / 120.0, plane_halfsize=hs)
            return float(jnp.abs(f[1]).max())

        # Touching the pad inside the patch: active.
        assert force_at([0.0, 0.12, 0.5]) > 0.0
        # Same normal distance but 8 cm away along z (> halfsize): the
        # pad is a small square, so no contact.
        assert force_at([0.0, 0.12, 0.58]) == 0.0
        # And 8 cm along x: also gated (this axis already worked).
        assert force_at([0.08, 0.12, 0.5]) == 0.0

    def test_ball_settles_at_analytic_rest_depth(self):
        ball = _ball()
        params = DynParams.defaults(ball)
        q = jnp.asarray(ball.neutral_q(), jnp.float32).at[2].set(0.3)
        run = _step_fn(ball, params)
        v = jnp.zeros(6)
        for _ in range(2):
            q, v = run(q, v)
        rest_z = 0.1 - 9.81 * 0.02 ** 2  # r - g tau^2 (mass-independent)
        assert float(q[2]) == pytest.approx(rest_z, abs=2e-3)
        assert abs(float(v[5])) < 1e-3

    def test_sliding_ball_converts_to_rolling(self):
        # v_roll = v0 / (1 + I / (m r^2)) for a sliding-then-rolling ball.
        ball = _ball(mass=2.0, inertia=0.004)
        params = DynParams.defaults(ball)
        q = jnp.asarray(ball.neutral_q(), jnp.float32).at[2].set(0.098)
        v = jnp.zeros(6).at[3].set(2.0)
        run = _step_fn(ball, params)
        for _ in range(2):
            q, v = run(q, v)
        R = np.asarray(quat_to_rot(q[3:7]))
        vw = R @ np.asarray(v[3:6])
        ww = R @ np.asarray(v[0:3])
        v_roll = 2.0 / (1.0 + 0.004 / (2.0 * 0.1 ** 2))
        assert vw[0] == pytest.approx(v_roll, rel=0.02)
        # Rolling constraint: contact point nearly stationary.
        assert vw[0] + ww[1] * (-0.098) == pytest.approx(0.0, abs=0.05)

    @pytest.mark.parametrize("mass_mult", [0.01, 1.0, 20.0])
    def test_stable_across_mass_randomization(self, mass_mult):
        # The DR configs scale masses by [0.01, 20]; contacts must stay
        # stable (mass-adaptive penalty gains).
        ball = _ball()
        base = DynParams.defaults(ball)
        params = base._replace(mass=base.mass * mass_mult,
                               inertia=base.inertia * mass_mult)
        q = jnp.asarray(ball.neutral_q(), jnp.float32).at[2].set(0.15)
        v = jnp.zeros(6).at[3].set(1.0)
        run = _step_fn(ball, params)
        for _ in range(2):
            q, v = run(q, v)
        assert np.isfinite(np.asarray(q)).all()
        assert np.isfinite(np.asarray(v)).all()
        assert abs(float(q[2]) - 0.096) < 0.01


class TestJointDynamics:
    def test_implicit_damping_stable_at_large_gains(self):
        # Damping up to 100 (the cartpole DR range) at dt=1/60 must not
        # explode thanks to the implicit LHS term.
        pend = ArticulatedModel([LinkSpec(
            "rod", parent=-1, joint_type="revolute", joint_axis=(0, 1, 0),
            mass=1.0, com=(0, 0, -0.5), inertia=(1 / 12, 1 / 12, 1e-9))])
        base = DynParams.defaults(pend)
        params = base._replace(damping=jnp.full(1, 100.0))
        q, v = jnp.array([1.0]), jnp.array([5.0])

        @jax.jit
        def run(q, v):
            def body(carry, _):
                q, v = carry
                qdd, _ = forward_dynamics(pend, q, v, jnp.zeros(1),
                                          params, dt=1 / 60.0)
                return integrate(pend, q, v, qdd, 1 / 60.0), None
            return jax.lax.scan(body, (q, v), None, length=120)[0]

        q, v = run(q, v)
        assert np.isfinite(float(q[0])) and abs(float(v[0])) < 1.0

    def test_joint_spring_oscillates_about_zero(self):
        pend = ArticulatedModel([LinkSpec(
            "rod", parent=-1, joint_type="revolute", joint_axis=(0, 0, 1),
            mass=1.0, com=(0.5, 0, 0), inertia=(1e-9, 1 / 12, 1 / 12))])
        base = DynParams.defaults(pend)
        # Spin axis z with gravity along -z: gravity torque-free; spring
        # pulls q toward 0.
        params = base._replace(stiffness=jnp.full(1, 5.0),
                               damping=jnp.full(1, 0.5))
        q, v = jnp.array([1.0]), jnp.zeros(1)

        @jax.jit
        def run(q, v):
            def body(carry, _):
                q, v = carry
                qdd, _ = forward_dynamics(pend, q, v, jnp.zeros(1),
                                          params, dt=1 / 120.0)
                return integrate(pend, q, v, qdd, 1 / 120.0), None
            return jax.lax.scan(body, (q, v), None, length=600)[0]

        q, v = run(q, v)
        assert abs(float(q[0])) < 0.2  # settled near zero


class TestImplicitDrive:
    """PD position drives solved implicitly inside forward_dynamics (the
    PhysX drive semantics; dynamics.py forward_dynamics docstring). The
    stiff-servo-on-tiny-inertia case is exactly the regime where the
    tasks' old explicit tau-PD silently failed: h*kd/I >> 2 makes the
    explicit update an oscillator that the velocity clamp freezes mid-air
    (FrankaCabinet joints missed commanded poses by 0.3-0.8 rad; the
    drawer could never be opened by any policy)."""

    def _servo(self, inertia=1e-5):
        return ArticulatedModel([LinkSpec(
            "rod", parent=-1, joint_type="revolute", joint_axis=(0, 0, 1),
            mass=0.01, com=(0.05, 0, 0), inertia=(inertia,) * 3)])

    def _run(self, model, params, n, drive=None, tau_fn=None, h=1 / 120.0):
        @jax.jit
        def run(q, v):
            def body(carry, _):
                q, v = carry
                tau = tau_fn(q, v) if tau_fn is not None else jnp.zeros(1)
                kw = drive if drive is not None else {}
                qdd, _ = forward_dynamics(model, q, v, tau, params,
                                          dt=h, **kw)
                return integrate(model, q, v, qdd, h), None
            return jax.lax.scan(body, (q, v), None, length=n)[0]
        return run(jnp.zeros(1), jnp.zeros(1))

    def test_stiff_drive_on_tiny_inertia_tracks_target(self):
        # ShadowHand-class numbers: kp=2, kd=0.1, I=1e-5 at h=1/120
        # (h*kd/I ~ 83: far beyond explicit stability). Gravity-free axis.
        model = self._servo()
        params = DynParams.defaults(model)
        drive = dict(drive_kp=jnp.full((1, 1), 2.0),
                     drive_kd=jnp.full((1, 1), 0.1),
                     drive_target=jnp.full((1, 1), 1.0))
        q, v = self._run(model, params, 400, drive=drive)
        assert abs(float(q[0]) - 1.0) < 1e-3, float(q[0])
        assert abs(float(v[0])) < 1e-2

        # Negative control: the same gains applied as explicit torque
        # never settle (the velocity clamp turns the blow-up into a
        # dithering joint far from the target).
        def tau_fn(q, v):
            return 2.0 * (1.0 - q) - 0.1 * v
        q_e, v_e = self._run(model, params, 400, tau_fn=tau_fn)
        assert (abs(float(q_e[0]) - 1.0) > 0.05
                or abs(float(v_e[0])) > 1.0), (q_e, v_e)

    def test_drive_gravity_steady_state_matches_force_balance(self):
        # Horizontal-axis pendulum held up by the drive: at rest
        # kp (target - q) = m g l sin(q) (+ effort not binding).
        m_, l_ = 0.5, 0.4
        model = ArticulatedModel([LinkSpec(
            "rod", parent=-1, joint_type="revolute", joint_axis=(0, 1, 0),
            mass=m_, com=(0, 0, -l_), inertia=(1e-4,) * 3)])
        params = DynParams.defaults(model)._replace(
            damping=jnp.full(1, 0.05))
        kp = 8.0
        drive = dict(drive_kp=jnp.full((1, 1), kp),
                     drive_kd=jnp.full((1, 1), 0.5),
                     drive_target=jnp.full((1, 1), 1.2))
        q, v = self._run(model, params, 1200, drive=drive)
        qf = float(q[0])
        # gravity torque about axis y for com (0,0,-l) rotated by q:
        g_tau = m_ * 9.81 * l_ * np.sin(qf)
        assert abs(float(v[0])) < 1e-3
        assert kp * (1.2 - qf) == pytest.approx(g_tau, rel=0.02)

    def test_drive_effort_clamps_proportional_term(self):
        model = self._servo(inertia=1e-3)
        params = DynParams.defaults(model)
        qdd, _ = forward_dynamics(
            model, jnp.zeros(1), jnp.zeros(1), jnp.zeros(1), params,
            dt=1 / 120.0, drive_kp=jnp.full((1, 1), 1e4),
            drive_kd=jnp.zeros((1, 1)), drive_target=jnp.full((1, 1), 1.0),
            drive_effort=0.5)
        # |qdd| ~ effort / (I + h*(h*kp)) with v=0: the P-term is clamped
        # to 0.5 while the implicit h^2*kp diagonal still applies.
        I_eff = 1e-3 + (1 / 120.0) ** 2 * 1e4
        assert float(qdd[0]) == pytest.approx(0.5 / I_eff, rel=0.05)


class TestVelocityClamps:
    def test_joint_velocity_clamped_to_max(self):
        # PhysX-style maxJointVelocity: a huge qdd (ultra-light link under
        # full torque) must leave |v| bounded by the limit.
        pend = ArticulatedModel([LinkSpec(
            "rod", parent=-1, joint_type="revolute", joint_axis=(0, 1, 0),
            mass=0.001, com=(0, 0, -0.5), inertia=(1e-6, 1e-6, 1e-9),
            max_velocity=50.0)])
        q, v = jnp.zeros(1), jnp.zeros(1)
        q, v = integrate(pend, q, v, jnp.array([1e9]), 1 / 60.0)
        assert abs(float(v[0])) == pytest.approx(50.0)

    def test_free_body_velocity_norm_clamped(self):
        from bayes_sim_ig_tpu.physics.dynamics import (MAX_LIN_VEL,
                                                       MAX_ANG_VEL)
        body = ArticulatedModel([LinkSpec(
            "b", parent=-1, joint_type="free", mass=1.0)],
            fixed_base=False)
        q = jnp.asarray(body.neutral_q())
        v = jnp.zeros(6)
        qdd = jnp.array([1e8, -2e8, 3e8, 4e8, 5e8, -6e8])
        q, v = integrate(body, q, v, qdd, 1 / 60.0)
        assert np.isfinite(np.asarray(q)).all()
        assert float(jnp.linalg.norm(v[:3])) <= MAX_ANG_VEL * 1.001
        assert float(jnp.linalg.norm(v[3:])) <= MAX_LIN_VEL * 1.001


class TestBf16Path:
    def test_bf16_path_close_to_f32(self, monkeypatch):
        """BSIM_PHYS_BF16=force exercises the bandwidth-saving bf16
        inertia/bias path off-TPU; forward dynamics must stay within a
        fraction of a percent of the f32 path (f32 accumulation
        throughout; only storage/read precision drops)."""
        import importlib
        from bayes_sim_ig_tpu.physics import DynParams
        import bayes_sim_ig_tpu.physics.dynamics as dyn
        from bayes_sim_ig_tpu.sim.ant import build_ant_model
        model = build_ant_model()
        rs = np.random.RandomState(0)
        q = model.neutral_q()
        q[model.j1_q] += rs.randn(model.j1_q.size) * 0.2
        q[2] = 0.6
        v = rs.randn(model.nv) * 0.2
        tau = rs.randn(model.nv) * 0.3
        params = DynParams.defaults(model)
        args = (jnp.asarray(q, jnp.float32), jnp.asarray(v, jnp.float32),
                jnp.asarray(tau, jnp.float32))

        monkeypatch.setenv("BSIM_PHYS_BF16", "0")
        qdd32, _ = dyn.forward_dynamics(model, *args, params, dt=1 / 120)
        monkeypatch.setenv("BSIM_PHYS_BF16", "force")
        qdd16, _ = dyn.forward_dynamics(model, *args, params, dt=1 / 120)
        scale = float(jnp.abs(qdd32).max())
        err = float(jnp.abs(qdd16 - qdd32).max())
        # ~3% on Ant (light foot links amplify inertia rounding through
        # M^-1): a deterministic sub-percent-parameter-shift-equivalent
        # perturbation, far below the 0.1-10x DR ranges; measured +6.7%
        # ShadowHand collection throughput on the real chip.
        assert err < 0.05 * scale, (err, scale)


@pytest.mark.heavy  # the factor-reuse contract itself is
# default-tested in test_ops
class TestFrozenMassSubsteps:
    def test_frozen_vs_fresh_single_step(self, monkeypatch):
        """The frozen-mass substep scheme (mass factorization computed
        at the first substep, reused by the second — dynamics.py
        carried_mass_factor; default ON for Ant since round 5, forced
        either way by BSIM_FROZEN_MASS) perturbs one physics step by
        O(h^2 |qd| dM): well under 1% of the state scale on Ant."""
        import yaml
        from bayes_sim_ig_tpu.sim import make_env
        cfg = yaml.safe_load(open(
            "bayes_sim_ig_tpu/cfg/ant.yaml"))
        cfg["env"]["numEnvs"] = 8
        task = make_env("Ant", cfg).task
        key = jax.random.PRNGKey(0)
        spec = task.params_spec
        params = jax.random.uniform(
            key, (8, spec.lows.size), minval=jnp.asarray(spec.lows),
            maxval=jnp.asarray(spec.highs))
        state = task.init_state(key, params)
        act = jnp.tile(jnp.linspace(-0.5, 0.5, task.act_dim)[None], (8, 1))

        # Ant's DEFAULT is frozen since round 5, so the fresh arm must
        # force =0 (delenv would silently compare frozen to frozen).
        monkeypatch.setenv("BSIM_FROZEN_MASS", "0")
        fresh = task.physics_step(state, act, params, key)
        fresh2 = task.physics_step(state, act, params, key)
        monkeypatch.setenv("BSIM_FROZEN_MASS", "1")
        frozen = task.physics_step(state, act, params, key)

        # Fresh path is deterministic; frozen deviates but stays tiny.
        np.testing.assert_array_equal(np.asarray(fresh.q),
                                      np.asarray(fresh2.q))
        scale = float(jnp.abs(fresh.q).max())
        dev = float(jnp.abs(frozen.q - fresh.q).max())
        assert np.isfinite(np.asarray(frozen.q)).all()
        assert np.isfinite(np.asarray(frozen.v)).all()
        # dev == 0 would mean the frozen path never engaged (e.g. both
        # arms silently resolved to the same default).
        assert 0.0 < dev < 0.01 * scale, (dev, scale)


class TestImpulseCompactEquivalence:
    """The compact half-solve Delassus path (mode="Y": Y = L^-T J^T over
    closure groups + one final L^-1 down-pass) must be the SAME math as
    the dense X = M^-1 J^T route (mode="X") — identical projected-Jacobi
    iterates in exact arithmetic. Gate run in f32 (BSIM_PHYS_BF16=0) so
    the tolerance is reorder noise, not bf16."""

    def _hand_like(self):
        links = [LinkSpec("palm", parent=-1, joint_type="fixed",
                          mass=0.5, inertia=(1e-3,) * 3)]
        for f in range(2):
            parent = 0
            for s in range(3):
                links.append(LinkSpec(
                    f"f{f}s{s}", parent=parent, joint_type="revolute",
                    joint_axis=(0, 1, 0),
                    joint_pos=(0.03, 0.02 * f, 0.0), mass=0.05,
                    inertia=(2e-5,) * 3, damping=0.05))
                parent = len(links) - 1
        links.append(LinkSpec("cube", parent=-1, joint_type="free",
                              mass=0.1, inertia=(6e-5,) * 3))
        return ArticulatedModel(links, fixed_base=True)

    def test_compact_matches_dense(self, monkeypatch):
        from bayes_sim_ig_tpu.physics.contact import (
            contact_pairs_impulse_prepare, contact_pairs_impulse_apply)
        monkeypatch.setenv("BSIM_PHYS_BF16", "0")
        monkeypatch.setenv("BSIM_TREE_SOLVE", "1")
        model = self._hand_like()
        cube = len(model.links) - 1 if hasattr(model, "links") else 7
        n = 16
        rng = np.random.default_rng(0)
        q = np.tile(model.neutral_q(), (n, 1)).astype(np.float32)
        q += rng.normal(0, 0.05, q.shape).astype(np.float32)
        # Renormalize the cube free-joint quaternion.
        cq = model.q_index_of_dof[model.nv - 6] \
            if hasattr(model, "q_index_of_dof") else None
        v = rng.normal(0, 0.3, (n, model.nv)).astype(np.float32)
        params = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(jnp.asarray(a),
                                       (n,) + jnp.asarray(a).shape),
            DynParams.defaults(model))
        qj = jnp.asarray(q)
        kin = forward_kinematics(model, qj, jnp.asarray(v), params)
        _, _, factor = forward_dynamics(
            model, qj, jnp.asarray(v), jnp.zeros((n, model.nv)), params,
            dt=1 / 120.0, kin=kin, return_factor=True)
        assert factor[0] == "tree"
        P = 4
        tips = [3, 6]                        # distal links of each finger
        links_a = [cube, tips[0], tips[1], tips[0]]
        links_b = [0, cube, cube, 0]
        n_w = rng.normal(0, 1, (P, 3, n)).astype(np.float32)
        n_w /= np.linalg.norm(n_w, axis=1, keepdims=True)
        contact_pt = rng.normal(0, 0.05, (P, 3, n)).astype(np.float32)
        depth = rng.normal(0.002, 0.004, (P, n)).astype(np.float32)
        mu = np.asarray([0.8, 0.5], np.float32)
        fric = [0, 2]

        outs = {}
        for mode in ("0", "1"):
            monkeypatch.setenv("BSIM_IMPULSE_COMPACT", mode)
            payload = contact_pairs_impulse_prepare(
                model, kin, factor, links_a, links_b,
                jnp.asarray(n_w), jnp.asarray(contact_pt),
                mu=jnp.asarray(mu), fric_pairs=fric)
            v1, warm = contact_pairs_impulse_apply(
                payload, jnp.asarray(v), jnp.asarray(depth),
                dt=1 / 120.0, iters=4, warm=None, return_warm=True)
            v2 = contact_pairs_impulse_apply(
                payload, v1, jnp.asarray(depth) * 0.9, dt=1 / 120.0,
                iters=2, warm=warm)
            outs[mode] = (np.asarray(v1), np.asarray(v2),
                          np.asarray(warm[0]))
        for i in range(3):
            np.testing.assert_allclose(outs["0"][i], outs["1"][i],
                                       rtol=2e-4, atol=2e-5)
        # The solve did something (contacts bind).
        assert np.abs(outs["0"][0] - v).max() > 1e-3


class TestPhantomCollapse:
    """Phantom-link chains (Humanoid's multi-dof joints) collapse into
    the real end link at model build (model.py _collapse_phantoms):
    link-axis tensors drop from 25 to 16 rows while q/v layout, dof
    tree and dynamics stay exact (phantom mass is zero)."""

    def _models(self, monkeypatch):
        from bayes_sim_ig_tpu.sim.humanoid import build_humanoid_model
        monkeypatch.setenv("BSIM_COLLAPSE", "0")
        m0 = build_humanoid_model()
        monkeypatch.setenv("BSIM_COLLAPSE", "1")
        m1 = build_humanoid_model()
        return m0, m1

    def test_topology(self, monkeypatch):
        m0, m1 = self._models(monkeypatch)
        assert not m0.collapsed and m1.collapsed
        assert (m0.nb, m1.nb) == (25, 16)
        assert m0.nv == m1.nv and m0.nq == m1.nq
        assert int(m0.depth.max()) == 9 and int(m1.depth.max()) == 5
        # dof layout untouched: same q/v indices, limits, dof tree.
        np.testing.assert_array_equal(m0.j1_q, m1.j1_q)
        np.testing.assert_array_equal(m0.j1_v, m1.j1_v)
        np.testing.assert_array_equal(m0.j1_lo, m1.j1_lo)
        np.testing.assert_array_equal(m0.dof_parent, m1.dof_parent)
        np.testing.assert_array_equal(m0.crba_mask, m1.crba_mask)
        # chains of up to 3 dofs formed on the collapsed model only.
        assert m0.j1_chain_maxpos == 0 and m1.j1_chain_maxpos == 2
        # every original body name resolves (phantoms to their target).
        assert m1.link_index["p_right_hip_x"] == \
            m1.link_index["right_thigh"]
        assert len(m1.body_names) == 16

    def test_dynamics_equivalent(self, monkeypatch):
        monkeypatch.setenv("BSIM_PHYS_BF16", "0")
        m0, m1 = self._models(monkeypatch)
        real = [i for i, l in enumerate(m0.links) if not l.phantom]
        rng = np.random.default_rng(3)
        N = 8
        q = np.zeros((N, m0.nq), np.float32)
        q[:, :3] = rng.normal(0, 0.3, (N, 3))
        quat = rng.normal(0, 1, (N, 4))
        q[:, 3:7] = quat / np.linalg.norm(quat, axis=1, keepdims=True)
        q[:, 7:] = rng.normal(0, 0.6, (N, m0.nq - 7))
        v = rng.normal(0, 1.0, (N, m0.nv)).astype(np.float32)
        tau = rng.normal(0, 5.0, (N, m0.nv)).astype(np.float32)

        def run(m):
            p = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(jnp.asarray(a),
                                           (N,) + jnp.asarray(a).shape),
                DynParams.defaults(m))
            kin = forward_kinematics(m, jnp.asarray(q), jnp.asarray(v), p)
            qdd = forward_dynamics(m, jnp.asarray(q), jnp.asarray(v),
                                   jnp.asarray(tau), p)
            qdd = qdd[0] if isinstance(qdd, tuple) else qdd
            return kin, np.asarray(qdd)

        k0, qdd0 = run(m0)
        k1, qdd1 = run(m1)
        np.testing.assert_allclose(np.asarray(k0.p_w)[real],
                                   np.asarray(k1.p_w), atol=2e-6)
        np.testing.assert_allclose(np.asarray(k0.R_w)[real],
                                   np.asarray(k1.R_w), atol=2e-6)
        np.testing.assert_allclose(np.asarray(k0.S_o),
                                   np.asarray(k1.S_o), atol=2e-6)
        np.testing.assert_allclose(np.asarray(k0.v)[real],
                                   np.asarray(k1.v), atol=2e-5)
        scale = np.abs(qdd0).max()
        assert np.abs(qdd0 - qdd1).max() / scale < 5e-4
