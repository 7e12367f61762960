"""Cross-implementation gate: the REFERENCE's own task configs, byte
-unchanged, must drive this framework — every actor tree walks to the
expected flat-param layout and the built env steps finitely. Skipped
when the reference checkout is absent."""

import glob
import os

import numpy as np
import pytest

import jax.numpy as jnp

from bayes_sim_ig_tpu.distributions import Uniform, to_device_distr
from bayes_sim_ig_tpu.sim import make_env

REF_CFG_DIR = "/root/reference/bayes_sim_ig/cfg"

# (reference yaml, task, expected flat DR dims — reference layouts)
REF_CFGS = [
    ("ant.yaml", "Ant", 17),
    ("anymal.yaml", "Anymal", 13),
    ("ball_balance.yaml", "BallBalance", 7),
    ("cartpole.yaml", "Cartpole", 13),
    ("cartpole_more.yaml", "Cartpole", 13),
    ("franka_cabinet.yaml", "FrankaCabinet", 19),
    ("humanoid.yaml", "Humanoid", 37),
    ("ingenuity.yaml", "Ingenuity", 9),
    ("pendulum.yaml", "Pendulum", 2),
    ("quadcopter.yaml", "Quadcopter", 9),
    ("shadow_hand.yaml", "ShadowHand", 32),
    ("shadow_hand_more.yaml", "ShadowHand", 111),
]

pytestmark = [
    pytest.mark.heavy,  # builds every task (slow CPU compiles)
    pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR),
                       reason="reference checkout not present"),
]


@pytest.mark.parametrize("cfg_file,task,expect_dims", REF_CFGS)
def test_reference_cfg_drives_rebuild(cfg_file, task, expect_dims):
    import yaml
    cfg = yaml.safe_load(open(os.path.join(REF_CFG_DIR, cfg_file)))
    cfg["env"]["numEnvs"] = 4
    env = make_env(task, cfg)
    spec = env.task.params_spec
    assert spec.dim == expect_dims, (cfg_file, spec.names)
    env.set_distr(to_device_distr(Uniform(spec.lows, spec.highs)))
    env.reset()
    obs, rew, done, _ = env.step(jnp.zeros((4, env.task.act_dim),
                                           jnp.float32))
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(rew)).all()


def test_all_reference_cfgs_enumerated():
    if not os.path.isdir(REF_CFG_DIR):
        pytest.skip("reference checkout not present")
    have = {os.path.basename(f)
            for f in glob.glob(os.path.join(REF_CFG_DIR, "*.yaml"))}
    assert have == {c for c, _, _ in REF_CFGS}, have
