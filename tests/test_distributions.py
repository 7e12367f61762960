"""Unit tests for distributions: Halton, Uniform/Gaussian/MoG algebra, EM,
and device-side samplers."""

import numpy as np
import pytest

from bayes_sim_ig_tpu.distributions import (
    halton_sequence, Uniform, Gaussian, MoG, discrete_sample, fit_mog,
    to_device_distr, sample_distr, DeviceUniform, DeviceMoG,
)


class TestHalton:
    def test_base2_unscrambled_values(self):
        # Plain (unscrambled) Halton in base 2: 1/2, 1/4, 3/4, 1/8, ...
        pts = halton_sequence(7, 1, scramble=False)[:, 0]
        np.testing.assert_allclose(
            pts, [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875])

    def test_range_and_determinism(self):
        a = halton_sequence(1000, 10)
        b = halton_sequence(1000, 10)
        assert a.shape == (1000, 10)
        assert (a > 0).all() and (a < 1).all()
        np.testing.assert_array_equal(a, b)

    def test_low_discrepancy(self):
        # Each dim's empirical mean should be near 0.5 much faster than MC.
        pts = halton_sequence(2048, 5)
        np.testing.assert_allclose(pts.mean(axis=0), 0.5, atol=0.01)


class TestUniform:
    def test_gen_shape_and_bounds(self):
        u = Uniform([0.0, 10.0], [1.0, 20.0])
        s = u.gen(500)
        assert s.shape == (500, 2)
        assert (s[:, 0] >= 0).all() and (s[:, 0] <= 1).all()
        assert (s[:, 1] >= 10).all() and (s[:, 1] <= 20).all()
        h = u.gen(500, method="halton")
        assert (h[:, 1] >= 10).all() and (h[:, 1] <= 20).all()

    def test_eval_joint_and_marginal(self):
        u = Uniform([0.0, 0.0], [2.0, 4.0])
        x = np.array([[1.0, 1.0], [3.0, 1.0]])
        p = u.eval(x, log=False)
        np.testing.assert_allclose(p, [1.0 / 8.0, 0.0])
        pm = u.eval(np.array([[1.0]]), ii=[1], log=False)
        np.testing.assert_allclose(pm, [0.25])


class TestGaussian:
    def test_parameterization_equivalence(self):
        m = np.array([1.0, -2.0])
        S = np.array([[2.0, 0.5], [0.5, 1.0]])
        P = np.linalg.inv(S)
        gS = Gaussian(m=m, S=S)
        gP = Gaussian(m=m, P=P)
        gPm = Gaussian(Pm=P @ m, S=S)
        Lm = np.linalg.cholesky(S)
        L_flat = np.concatenate([np.diag(Lm), Lm[np.tril_indices(2, -1)]])
        gL = Gaussian(m=m, L=L_flat)
        x = np.random.RandomState(0).randn(5, 2)
        base = gS.eval(x)
        for g in (gP, gPm, gL):
            np.testing.assert_allclose(g.eval(x), base, rtol=1e-8)
            np.testing.assert_allclose(g.m, m, rtol=1e-8)
            np.testing.assert_allclose(g.S, S, rtol=1e-8)

    def test_eval_matches_scipy(self):
        from scipy.stats import multivariate_normal
        m = np.array([0.3, -0.7, 1.1])
        A = np.random.RandomState(1).randn(3, 3)
        S = A @ A.T + 0.5 * np.eye(3)
        g = Gaussian(m=m, S=S)
        x = np.random.RandomState(2).randn(10, 3)
        np.testing.assert_allclose(
            g.eval(x), multivariate_normal.logpdf(x, m, S), rtol=1e-8)

    def test_mul_div_closure(self):
        g1 = Gaussian(m=[0.0], S=[[1.0]])
        g2 = Gaussian(m=[1.0], S=[[2.0]])
        prod = g1 * g2
        # Product of Gaussians: P = P1+P2, m = S(P1m1+P2m2)
        np.testing.assert_allclose(prod.P, g1.P + g2.P)
        np.testing.assert_allclose(prod.m, [1.0 / 3.0], rtol=1e-8)
        back = prod / g2
        np.testing.assert_allclose(back.m, g1.m, atol=1e-10)
        np.testing.assert_allclose(back.S, g1.S, rtol=1e-8)

    def test_pow_and_kl(self):
        g = Gaussian(m=[1.0, 2.0], S=np.eye(2) * 2.0)
        g2 = g ** 2.0
        np.testing.assert_allclose(g2.P, 2.0 * g.P)
        assert g.kl(g) == pytest.approx(0.0, abs=1e-10)
        other = Gaussian(m=[0.0, 0.0], S=np.eye(2))
        # Analytic KL for diag case.
        expected = 0.5 * (2 * 2.0 + 5.0 - 2 + 2 * np.log(1 / 2.0))
        assert g.kl(other) == pytest.approx(expected, rel=1e-8)

    def test_gen_moments(self):
        np.random.seed(0)
        m = np.array([1.0, -1.0])
        S = np.array([[1.5, 0.6], [0.6, 0.8]])
        g = Gaussian(m=m, S=S)
        s = g.gen(200000)
        np.testing.assert_allclose(s.mean(axis=0), m, atol=0.02)
        np.testing.assert_allclose(np.cov(s.T), S, atol=0.03)
        sh = g.gen(4096, method="halton")
        np.testing.assert_allclose(sh.mean(axis=0), m, atol=0.05)


class TestMoG:
    def _mog(self):
        return MoG(a=[0.3, 0.7],
                   ms=[np.array([0.0]), np.array([3.0])],
                   Ss=[np.eye(1), np.eye(1) * 0.25])

    def test_eval_is_mixture(self):
        mog = self._mog()
        x = np.linspace(-2, 5, 20).reshape(-1, 1)
        p = mog.eval(x, log=False)
        expected = (0.3 * mog.xs[0].eval(x, log=False)
                    + 0.7 * mog.xs[1].eval(x, log=False))
        np.testing.assert_allclose(p, expected, rtol=1e-10)

    def test_gen_moments(self):
        np.random.seed(1)
        mog = self._mog()
        s = mog.gen(100000)
        assert s.mean() == pytest.approx(0.3 * 0.0 + 0.7 * 3.0, abs=0.03)

    def test_mul_div_by_gaussian_identity(self):
        # (mog * g) / g should recover the original mixture.
        mog = self._mog()
        g = Gaussian(m=[1.0], S=[[4.0]])
        back = (mog * g) / g
        np.testing.assert_allclose(back.a, mog.a, rtol=1e-8)
        for b, o in zip(back.xs, mog.xs):
            np.testing.assert_allclose(b.m, o.m, atol=1e-9)
            np.testing.assert_allclose(b.S, o.S, rtol=1e-8)

    def test_mul_reweighting_matches_density(self):
        # Density ratio check: (mog*g).eval should equal mog.eval*g.eval up
        # to one global constant across all x.
        mog = self._mog()
        g = Gaussian(m=[2.0], S=[[1.0]])
        prod = mog * g
        x = np.linspace(-1, 4, 7).reshape(-1, 1)
        lhs = prod.eval(x, log=True)
        rhs = mog.eval(x, log=True) + g.eval(x, log=True)
        diff = lhs - rhs
        np.testing.assert_allclose(diff, diff[0], rtol=1e-8)

    def test_moments_and_projection(self):
        mog = self._mog()
        m, S = mog.calc_mean_and_cov()
        assert m[0] == pytest.approx(2.1)
        # Var = sum a_i (S_i + m_i^2) - m^2
        expected_var = 0.3 * (1 + 0.0) + 0.7 * (0.25 + 9.0) - 2.1 ** 2
        assert S[0, 0] == pytest.approx(expected_var)
        g = mog.project_to_gaussian()
        assert g.m[0] == pytest.approx(2.1)

    def test_prune(self):
        mog = MoG(a=[0.001, 0.499, 0.5],
                  ms=[np.zeros(1), np.ones(1), 2 * np.ones(1)],
                  Ss=[np.eye(1)] * 3)
        mog.prune_negligible_components(0.005)
        assert mog.n_components == 2
        assert mog.a.sum() == pytest.approx(1.0)

    def test_kl_self_zero(self):
        np.random.seed(2)
        mog = self._mog()
        kl, err = mog.kl(mog, n_samples=1000)
        assert kl == pytest.approx(0.0, abs=1e-12)


def test_discrete_sample_distribution():
    np.random.seed(3)
    counts = np.bincount(discrete_sample([0.2, 0.8], 20000), minlength=2)
    assert counts[1] / 20000 == pytest.approx(0.8, abs=0.02)


def test_fit_mog_recovers_components():
    np.random.seed(4)
    data = np.concatenate([
        np.random.randn(2000, 1) * 0.3 - 2.0,
        np.random.randn(2000, 1) * 0.3 + 2.0])
    mog = fit_mog(data, n_components=2, maxiter=200)
    means = sorted(g.m[0] for g in mog.xs)
    assert means[0] == pytest.approx(-2.0, abs=0.1)
    assert means[1] == pytest.approx(2.0, abs=0.1)
    np.testing.assert_allclose(sorted(mog.a), [0.5, 0.5], atol=0.05)


class TestDeviceDistr:
    def test_uniform_roundtrip(self):
        import jax
        u = Uniform([0.0, 1.0], [1.0, 3.0])
        d = to_device_distr(u)
        assert isinstance(d, DeviceUniform)
        s = sample_distr(d, jax.random.PRNGKey(0), 1000)
        s = np.asarray(s)
        assert s.shape == (1000, 2)
        assert (s[:, 1] >= 1.0).all() and (s[:, 1] <= 3.0).all()

    def test_mog_sampling_moments_and_clip(self):
        import jax
        mog = MoG(a=[0.5, 0.5],
                  ms=[np.array([0.2, 0.2]), np.array([0.8, 0.8])],
                  Ss=[np.eye(2) * 0.01] * 2)
        d = to_device_distr(mog, lows=np.zeros(2), highs=np.ones(2))
        assert isinstance(d, DeviceMoG)
        s = np.asarray(sample_distr(d, jax.random.PRNGKey(1), 20000))
        assert (s >= 0).all() and (s <= 1).all()
        np.testing.assert_allclose(s.mean(axis=0), [0.5, 0.5], atol=0.02)

    def test_mog_sampling_matches_host_distribution(self):
        import jax
        np.random.seed(5)
        mog = MoG(a=[0.3, 0.7],
                  ms=[np.array([-1.0]), np.array([2.0])],
                  Ss=[np.eye(1) * 0.2, np.eye(1) * 0.5])
        d = to_device_distr(mog, lows=np.array([-10.0]),
                            highs=np.array([10.0]))
        dev = np.asarray(sample_distr(d, jax.random.PRNGKey(2), 50000))
        host = mog.gen(50000)
        assert dev.mean() == pytest.approx(host.mean(), abs=0.03)
        assert dev.std() == pytest.approx(host.std(), abs=0.03)
