"""Generic per-task checks: every registered task builds from its package
config, has a param spec dimension-compatible with its realParams vector,
and steps stably under jit with full-range domain randomization."""

import os

import numpy as np
import pytest
import yaml

import jax.numpy as jnp

from bayes_sim_ig_tpu.sim import make_env, available_tasks
from bayes_sim_ig_tpu.distributions import Uniform, to_device_distr
from bayes_sim_ig_tpu.utils.args import snake_case

CFG_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "bayes_sim_ig_tpu", "cfg")

ALL_TASKS = ["Pendulum", "Cartpole", "Ant", "Anymal", "BallBalance",
             "FrankaCabinet", "Humanoid", "Ingenuity", "Quadcopter",
             "ShadowHand"]


def load_cfg(task, num_envs=4):
    with open(os.path.join(CFG_DIR, snake_case(task) + ".yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["env"]["numEnvs"] = num_envs
    return cfg


def test_all_reference_tasks_registered():
    assert set(ALL_TASKS) <= set(available_tasks())


def test_nearest_cube_face_selection():
    """Unit contract for the ShadowHand per-sphere nearest-face pick
    (round-3 review finding: argmin selected the OPPOSITE face). Spheres
    placed just outside each of the 6 faces — and one inside near +y —
    must select that face, with the plane point on it."""
    from types import SimpleNamespace
    from bayes_sim_ig_tpu.sim.shadow_hand import nearest_cube_faces
    h = 0.03
    half = jnp.full((1,), h)
    faces = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                      [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    # 6 probe links just outside each face + 1 just inside the +y face.
    centers = np.concatenate([faces * (h + 0.004),
                              [[0.0, h - 0.002, 0.0]]], 0)
    expected = np.concatenate([faces, [[0, 1, 0]]], 0)
    nb = len(centers) + 1                       # + cube link 0
    R_w = np.broadcast_to(np.eye(3, dtype=np.float32)[None, :, :, None],
                          (nb, 3, 3, 1))
    p_w = np.zeros((nb, 3, 1), np.float32)
    p_w[1:, :, 0] = centers                     # cube at origin
    kin = SimpleNamespace(R_w=jnp.asarray(R_w), p_w=jnp.asarray(p_w))
    nrm, pt = nearest_cube_faces(
        kin, cube_link=0, sph_links=list(range(1, nb)),
        sph_offsets=np.zeros((nb - 1, 3), np.float32), cube_half=half,
        n_env=1)
    np.testing.assert_allclose(np.asarray(nrm)[..., 0], expected,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(pt)[..., 0], expected * h,
                               atol=1e-6)


def test_shadow_hand_dyn_params_leaves_scale_neutral():
    """Structural invariant the contact geometry relies on: ShadowHand
    applies object scale EXPLICITLY (pre-scaled corner offsets / face
    points / init height) and must leave DynParams.scale at 1.0 — if a
    scale dim were routed through dp.scale, the contact functions'
    params.scale multiply would scale the offsets a second time and the
    (unscaled) face-selection geometry would diverge from the force
    geometry (round-3 review note at the physics_step call site)."""
    import jax
    env = make_env("ShadowHand", load_cfg("ShadowHand", 2))
    row = jnp.asarray(np.full(env.task.params_spec.dim, 1.7, np.float32))
    dp = env.task._dyn_params(row, jnp.asarray(0.0))
    assert float(jax.device_get(dp.scale)) == 1.0


@pytest.mark.parametrize("task_name", ALL_TASKS)
def test_spec_matches_realparams(task_name):
    """Construction-only (no jit): every task builds from its package
    config with a param spec dimension-compatible with realParams."""
    cfg = load_cfg(task_name)
    env = make_env(task_name, cfg)
    spec = env.task.params_spec
    real_means = cfg["env"]["realParams"]["means"][0]
    # Scalar realParams broadcast to the full dim (args.py:110-122).
    if len(real_means) > 1:
        assert len(real_means) == spec.dim, \
            f"{task_name}: realParams dim {len(real_means)} != spec " \
            f"{spec.dim} ({spec.names})"
    assert (spec.lows < spec.highs).all()


def _steps_finite(task_name):
    cfg = load_cfg(task_name)
    env = make_env(task_name, cfg)
    spec = env.task.params_spec
    env.set_distr(to_device_distr(Uniform(spec.lows, spec.highs)))
    obs = env.reset()
    assert obs.shape == (4, env.task.obs_dim)
    rs = np.random.RandomState(0)
    for _ in range(5):
        act = jnp.asarray(rs.uniform(-1, 1, (4, env.task.act_dim)),
                          jnp.float32)
        obs, rew, done, _ = env.step(act)
    assert np.isfinite(np.asarray(obs)).all(), f"{task_name} obs blew up"
    assert np.isfinite(np.asarray(rew)).all()


# Fast default profile steps the cheap-compiling tasks; the expensive
# compiles (20-30 s each on CPU) run in the full (heavy) suite.
@pytest.mark.parametrize("task_name", ["Pendulum", "Cartpole", "Ant"])
def test_steps_finite(task_name):
    _steps_finite(task_name)


@pytest.mark.heavy
@pytest.mark.parametrize("task_name", ["Anymal", "BallBalance",
                                       "FrankaCabinet", "Humanoid",
                                       "Ingenuity", "Quadcopter",
                                       "ShadowHand"])
def test_steps_finite_heavy(task_name):
    _steps_finite(task_name)


@pytest.mark.heavy
@pytest.mark.parametrize("task_name,cfg_file,expect_dims", [
    ("Cartpole", "cartpole_more.yaml", 13),
    ("ShadowHand", "shadow_hand_more.yaml", 111),
])
def test_more_config_variants(task_name, cfg_file, expect_dims):
    """The '_more' full-DR sweeps (reference cfg/cartpole_more.yaml /
    cfg/shadow_hand_more.yaml) build with their full flat-param layout
    and step finitely under full-range DR."""
    with open(os.path.join(CFG_DIR, cfg_file)) as f:
        cfg = yaml.safe_load(f)
    cfg["env"]["numEnvs"] = 4
    env = make_env(task_name, cfg)
    spec = env.task.params_spec
    assert spec.dim == expect_dims, spec.names
    env.set_distr(to_device_distr(Uniform(spec.lows, spec.highs)))
    obs = env.reset()
    rs = np.random.RandomState(0)
    for _ in range(3):
        act = jnp.asarray(rs.uniform(-1, 1, (4, env.task.act_dim)),
                          jnp.float32)
        obs, rew, done, _ = env.step(act)
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(rew)).all()


@pytest.mark.parametrize("task_name", ["Ant", "ShadowHand"])
def test_flat_sample_consumed_fully(task_name):
    # The walk order invariant: every dim of the flat sample must bind to
    # a model quantity the task consumes (reference
    # apply_randomizations.py:228-236 exhaustion check analogue).
    cfg = load_cfg(task_name)
    env = make_env(task_name, cfg)
    t = env.task
    bound = set()
    for attr in ("_mass_dims", "_stiff_dims", "_damp_dims",
                 "_tendon_dims", "_hand_mass_dims", "_fric_dims",
                 "_ball_mass_dims"):
        dims = getattr(t, attr, None)
        if dims is not None:
            bound.update(int(i) for i in dims)
    for attr in ("_scale_dim", "_obj_mass_dim"):
        d = getattr(t, attr, None)
        if d is not None:
            bound.add(int(d))
    assert bound == set(range(t.params_spec.dim)), \
        f"{task_name}: unbound param dims " \
        f"{set(range(t.params_spec.dim)) - bound}"


@pytest.mark.heavy
@pytest.mark.parametrize("task_name", ["Cartpole", "Ant", "Anymal",
                                       "Quadcopter"])
def test_whole_actor_scale_dr(task_name):
    # Reference apply_randomizations.py:174-189 applies 'scale' DR to any
    # actor. Adding a scale subtree to a task config must produce a spec
    # dim bound to the geometry scale, and stepping at both corners of a
    # wide scale range must stay finite (VERDICT round-1 item 5).
    cfg = load_cfg(task_name, num_envs=2)
    actor = next(iter(
        cfg["task"]["randomization_params"]["actor_params"]))
    cfg["task"]["randomization_params"]["actor_params"][actor]["scale"] = {
        "range": [0.5, 1.5], "operation": "scaling",
        "distribution": "uniform"}
    env = make_env(task_name, cfg)
    spec = env.task.params_spec
    assert env.task._scale_dims, "scale dim not bound"
    scale_dim = env.task._scale_dims[0]
    assert spec.names[scale_dim] == f"{actor}_scale_mult"
    for corner in (spec.lows, spec.highs):
        from bayes_sim_ig_tpu.distributions import MoG
        mog = MoG(a=[1.0], ms=[np.asarray(corner, np.float64)],
                  Ss=[np.eye(spec.dim) * 1e-12])
        env.set_distr(to_device_distr(mog, spec.lows, spec.highs))
        env.reset()
        rs = np.random.RandomState(2)
        for t in range(20):
            act = jnp.asarray(rs.uniform(-1, 1, (2, env.task.act_dim)),
                              jnp.float32)
            obs, rew, done, _ = env.step(act)
            assert np.isfinite(np.asarray(obs)).all(), (task_name, t)
        assert float(jnp.abs(env.state.params[:, scale_dim] -
                             corner[scale_dim]).max()) < 1e-5


@pytest.mark.parametrize("task_name", ["Pendulum", "Cartpole", "Ant",
                                       "BallBalance", "ShadowHand",
                                       "FrankaCabinet", "Anymal",
                                       "Humanoid", "Ingenuity",
                                       "Quadcopter"])
def test_render_obs_frame(task_name):
    # RealSurrogate/video surface (reference collect_trajectories.py:
    # 40-41,81-83): tasks with renderers must produce valid uint8 frames
    # from an observation row.
    cfg = load_cfg(task_name, num_envs=2)
    env = make_env(task_name, cfg)
    spec = env.task.params_spec
    env.set_distr(to_device_distr(Uniform(spec.lows, spec.highs)))
    obs = env.reset()
    frame = env.task.render_obs_frame(np.asarray(obs[0]))
    assert frame.shape[2] == 3 and frame.dtype == np.uint8
    assert frame.min() >= 0 and (frame < 255).any()


@pytest.mark.heavy
@pytest.mark.parametrize("task_name", ALL_TASKS)
def test_corner_params_stay_finite(task_name):
    # The worst DR corner (all lows: ultra-light links, weakest gains) is
    # exactly where posterior-clipped samples land once a broad posterior
    # is clipped to bounds. The env contract: outputs stay finite for a
    # whole episode — via the integrator's velocity clamps, and, as a last
    # resort, the non-finite quarantine in env_step. Regression for an Ant
    # ADR run that went NaN at 0.01x masses after ~57 steps.
    from bayes_sim_ig_tpu.distributions import MoG
    cfg = load_cfg(task_name, num_envs=2)
    env = make_env(task_name, cfg)
    spec = env.task.params_spec
    mog = MoG(a=[1.0], ms=[np.asarray(spec.lows, np.float64)],
              Ss=[np.eye(spec.dim) * 1e-12])
    env.set_distr(to_device_distr(mog, spec.lows, spec.highs))
    env.reset()
    rs = np.random.RandomState(1)
    for t in range(80):
        act = jnp.asarray(rs.uniform(-1, 1, (2, env.task.act_dim)),
                          jnp.float32)
        obs, rew, done, _ = env.step(act)
        assert np.isfinite(np.asarray(obs)).all(), (task_name, t)
        assert np.isfinite(np.asarray(rew)).all(), (task_name, t)
