"""Tests for orchestrator helpers: run naming, realParams loading,
distribution validation, and the checkpoint/resume roundtrip."""

import os

import numpy as np
import pytest

from bayes_sim_ig_tpu.distributions import pdf
from bayes_sim_ig_tpu.utils.args import (
    make_logdir_str, load_real_params, check_distr, snake_case,
)
from bayes_sim_ig_tpu.bayes_sim_main import (
    _save_iteration_checkpoint, _load_latest_checkpoint,
)


def test_snake_case():
    assert snake_case("Pendulum") == "pendulum"
    assert snake_case("BallBalance") == "ball_balance"
    assert snake_case("FrankaCabinet") == "franka_cabinet"
    assert snake_case("ShadowHand") == "shadow_hand"


def test_make_logdir_str_matches_reference_scheme():
    cfg = {"bayessim": {"modelClass": "MDNN", "ftune": True,
                        "summarizerFxn": "summary_start",
                        "collectPolicy": "policy_random", "realTrajs": 1}}
    out = make_logdir_str("/tmp/x", "Pendulum", 0, 20, cfg)
    assert out == ("/tmp/x/Pendulum_MDNN_ftune_summary_start_"
                   "policy_random_rl20_nreal1_seed0")


def test_load_real_params_broadcast():
    cfg = {"env": {"realParams": {
        "weights": [1.0], "means": [[1.8]], "stds": [[0.001]]}}}
    w, means, stds = load_real_params(cfg, 5)
    assert means[0].shape == (5,)
    np.testing.assert_allclose(means[0], 1.8)
    assert stds[0].shape == (5, 5)
    np.testing.assert_allclose(np.diag(stds[0]), 0.001)


def test_check_distr_rejects_out_of_bounds():
    mog = pdf.MoG(a=[1.0], ms=[np.array([3.0, 0.5])],
                  Ss=[np.eye(2) * 1e-6])
    with pytest.raises(AssertionError, match="invalid mean"):
        check_distr(mog, np.array([0.0, 0.0]), np.array([2.0, 2.0]), "x")


class _StubPPO:
    def __init__(self):
        self.saved = None
        self.loaded = None

    def save(self, path):
        self.saved = path
        with open(path, "wb") as f:
            f.write(b"stub")

    def load(self, path):
        self.loaded = path


def test_checkpoint_roundtrip(tmp_path):
    logdir = str(tmp_path)
    post = pdf.MoG(a=[0.4, 0.6],
                   ms=[np.array([1.0, 0.5]), np.array([1.2, 0.6])],
                   Ss=[np.eye(2) * 0.01] * 2)
    ppo = _StubPPO()
    states = np.ones((3, 11, 3), np.float32)
    actions = np.zeros((3, 11, 1), np.float32)
    _save_iteration_checkpoint(logdir, 0, post, ppo, None, None)
    _save_iteration_checkpoint(logdir, 4, post, ppo, states, actions)
    resumed = _load_latest_checkpoint(logdir, ppo)
    assert resumed["real_iter_id"] == 4
    np.testing.assert_allclose(resumed["weights"], [0.4, 0.6])
    np.testing.assert_allclose(resumed["all_real_states"], states)
    assert ppo.loaded.endswith("policy_4.ckpt")
    # Rebuilding the MoG from the payload reproduces the density.
    mog2 = pdf.MoG(a=resumed["weights"], ms=list(resumed["means"]),
                   Ss=list(resumed["covs"]))
    x = np.array([[1.1, 0.55]])
    np.testing.assert_allclose(mog2.eval(x), post.eval(x), rtol=1e-10)
    # Without a bsim the model slot is explicitly empty.
    assert resumed["bsim_model"] is None


def test_checkpoint_saves_ftuned_bsim_model(tmp_path):
    """With ftune, the accumulated BayesSim model must ride along in the
    checkpoint — resume otherwise silently predicts from a fresh model
    while consuming ALL accumulated real trajectories (round-3 review
    finding)."""
    import jax
    from bayes_sim_ig_tpu.engine import BayesSim
    cfg = {"modelClass": "MDNN", "summarizerFxn": "summary_start",
           "trainTrajLen": 10, "components": 2, "hiddenLayers": [16],
           "lr": 1e-3}
    bsim = BayesSim(model_cfg=cfg, obs_dim=2, act_dim=1, params_dim=2,
                    params_lows=np.array([0.0, 0.0]),
                    params_highs=np.array([1.0, 1.0]))
    post = pdf.MoG(a=[1.0], ms=[np.array([0.5, 0.5])],
                   Ss=[np.eye(2) * 0.01])
    _save_iteration_checkpoint(str(tmp_path), 1, post, _StubPPO(),
                               bsim=bsim)
    resumed = _load_latest_checkpoint(str(tmp_path), _StubPPO())
    saved = resumed["bsim_model"]
    assert saved is not None
    for a, b in zip(jax.tree_util.tree_leaves(saved),
                    jax.tree_util.tree_leaves(bsim.model.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_latest_checkpoint_empty(tmp_path):
    assert _load_latest_checkpoint(str(tmp_path), _StubPPO()) is None


def test_plot_posterior_writes_tb_images(tmp_path):
    # The posterior pair-plot pipeline (reference plot.py:131-149) must
    # render headless and land image tags in the event file, honoring
    # skip_ids.
    from torch.utils.tensorboard import SummaryWriter
    from bayes_sim_ig_tpu.utils.plot import plot_posterior
    from bayes_sim_ig_tpu.distributions import MoG
    post = MoG(a=[0.6, 0.4], ms=[[0.4, 1.0, 1.4], [0.6, 1.2, 1.5]],
               Ss=[np.eye(3) * 0.01] * 2)
    writer = SummaryWriter(str(tmp_path))
    plot_posterior(writer, "BayesSim/posterior", 3,
                   ["a_mult", "b_mult", "c_mult"], skip_ids=[1],
                   true_params=[0.5, 1.1, 1.45], posterior=post,
                   p_lower=np.zeros(3), p_upper=np.full(3, 2.0))
    writer.close()
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    ea = EventAccumulator(str(tmp_path))
    ea.Reload()
    tags = ea.Tags()["images"]
    assert tags == ["BayesSim/posterior_a_mult_vs_c_mult"], tags


def test_per_task_train_configs_resolve():
    """Every task resolves its own tuned ppo_<task>.yaml (the reference's
    per-task train-config surface, reference utils/args.py:46-58) with the
    full key set the PPO trainer consumes."""
    import yaml
    from bayes_sim_ig_tpu.utils.args import init_args
    from bayes_sim_ig_tpu.sim import available_tasks
    for task in available_tasks():
        args, cfg_env, cfg_train = init_args(
            ["--task", task, "--logdir", "/tmp/x", "--headless"])
        expected = os.path.join("cfg", "train",
                                "ppo_" + snake_case(task) + ".yaml")
        assert args.cfg_train.endswith(expected), \
            f"{task}: fell back to {args.cfg_train}"
        for key in ("gamma", "nsteps", "noptepochs", "nminibatches",
                    "optim_stepsize", "desired_kl"):
            assert key in cfg_train["learn"], f"{task}: missing {key}"
        assert "pi_hid_sizes" in cfg_train["policy"]
