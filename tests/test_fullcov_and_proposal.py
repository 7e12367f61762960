"""Full-covariance MDNN path and the proposal-correction branch of
BayesSim.predict (dead code in the reference's own main loop but part of
its API surface, bayes_sim.py:135-145)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayes_sim_ig_tpu.distributions import pdf
from bayes_sim_ig_tpu.engine import BayesSim
from bayes_sim_ig_tpu.models import MDNN


def test_full_covariance_predict_density_integrates():
    # predict_MoGs with full covariance must produce valid densities whose
    # denormalized parameterization matches a direct scipy evaluation.
    from scipy.stats import multivariate_normal
    m = MDNN(input_dim=4, output_dim=2,
             output_lows=np.array([0.0, 10.0], np.float32),
             output_highs=np.array([2.0, 30.0], np.float32),
             n_gaussians=3, full_covariance=True, hidden_layers=(8,),
             activation="tanh", lr=1e-3, seed=0)
    x = jnp.zeros((1, 4))
    mog = m.predict_MoGs(x)[0]
    # Compare pdf.MoG's own eval against scipy on the same parameters.
    pts = np.random.RandomState(0).randn(5, 2) * 5 + [1.0, 20.0]
    want = np.zeros(5)
    for w, g in zip(mog.a, mog.xs):
        want += w * multivariate_normal.pdf(pts, g.m, g.S)
    np.testing.assert_allclose(mog.eval(pts, log=False), want, rtol=1e-6)
    # Monte-Carlo normalization sanity: samples fall where density is.
    smp = mog.gen(2000)
    lp = mog.eval(smp, log=True)
    assert np.isfinite(lp).all()


@pytest.mark.heavy
def test_full_covariance_training_runs_and_improves():
    rs = np.random.RandomState(1)
    x = rs.rand(600, 4).astype(np.float32)
    # Correlated targets make full covariance actually useful.
    base = x[:, :1] + 0.1 * rs.randn(600, 1)
    y = np.concatenate([base, -base + 0.05 * rs.randn(600, 1)],
                       axis=1).astype(np.float32)
    m = MDNN(input_dim=4, output_dim=2,
             output_lows=-2 * np.ones(2, np.float32),
             output_highs=3 * np.ones(2, np.float32),
             n_gaussians=2, full_covariance=True, hidden_layers=(16,),
             activation="tanh", lr=3e-3, seed=0)
    logs = m.run_training(x, y, 300, 100)
    assert logs["train_loss"][-1] < logs["train_loss"][0]
    mog = m.predict_MoGs(x[:1])[0]
    # Learned correlation should be negative in the dominant component.
    dom = mog.xs[int(np.argmax(mog.a))]
    corr = dom.S[0, 1] / np.sqrt(dom.S[0, 0] * dom.S[1, 1])
    assert corr < 0.2  # negatively or weakly correlated, not spuriously +1


class _FixedModel:
    """Stub model producing one fixed MoG regardless of input."""

    def __init__(self, mog):
        self._mog = mog
        self.output_dim = 2

    def predict_MoGs(self, xs):
        return [pdf.MoG(a=self._mog.a.copy(),
                        ms=[g.m.copy() for g in self._mog.xs],
                        Ss=[g.S.copy() for g in self._mog.xs])
                for _ in range(int(xs.shape[0]))]


def test_proposal_correction_uniform_prior():
    # With a Uniform prior, predict divides the mixture by the proposal
    # (bayes_sim.py:139-141); verify the density ratio analytically.
    bsim = BayesSim.__new__(BayesSim)  # bypass ctor; wire fields directly
    mog = pdf.MoG(a=[0.5, 0.5],
                  ms=[np.array([0.8, 0.4]), np.array([1.2, 0.6])],
                  Ss=[np.eye(2) * 0.05] * 2)
    proposal = pdf.Gaussian(m=[1.0, 0.5], S=np.eye(2) * 1.0)
    bsim.prior = pdf.Uniform([0.0, 0.0], [2.0, 2.0])
    bsim.proposal = proposal
    bsim.summarizer_fxn = lambda s, a: jnp.zeros((1, 4))
    bsim.model = _FixedModel(mog)
    post = bsim.predict(np.zeros((1, 10, 3)), np.zeros((1, 10, 1)))
    # post should be proportional to mog / proposal.
    x = np.array([[0.9, 0.45], [1.1, 0.55], [0.7, 0.5]])
    ratio = (post.eval(x, log=True)
             - (mog.eval(x, log=True) - proposal.eval(x, log=True)))
    np.testing.assert_allclose(ratio, ratio[0], rtol=1e-6)


def test_proposal_correction_gaussian_prior():
    # With a Gaussian prior: (mog * prior) / proposal (bayes_sim.py:141-142).
    bsim = BayesSim.__new__(BayesSim)
    mog = pdf.MoG(a=[1.0], ms=[np.array([1.0, 0.5])],
                  Ss=[np.eye(2) * 0.05])
    prior = pdf.Gaussian(m=[1.0, 0.5], S=np.eye(2) * 0.5)
    proposal = pdf.Gaussian(m=[1.0, 0.5], S=np.eye(2) * 2.0)
    bsim.prior = prior
    bsim.proposal = proposal
    bsim.summarizer_fxn = lambda s, a: jnp.zeros((1, 4))
    bsim.model = _FixedModel(mog)
    post = bsim.predict(np.zeros((1, 10, 3)), np.zeros((1, 10, 1)))
    x = np.array([[0.9, 0.45], [1.2, 0.6]])
    expected = (mog.eval(x, log=True) + prior.eval(x, log=True)
                - proposal.eval(x, log=True))
    diff = post.eval(x, log=True) - expected
    np.testing.assert_allclose(diff, diff[0], rtol=1e-6)
