"""Pallas kernel tests (interpret mode on the CPU mesh) against the jnp
reference implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from bayes_sim_ig_tpu.ops.rff_kernel import (
    rff_features_pallas, rff_features_reference,
)
from bayes_sim_ig_tpu.ops.mog_kernel import (
    diag_mixture_logprob_pallas, diag_mixture_logprob_reference,
)


class TestRFFKernel:
    @pytest.mark.parametrize("b,d,m", [(100, 40, 100), (17, 3, 64),
                                       (256, 128, 128)])
    def test_matches_reference(self, b, d, m):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(b, d), jnp.float32)
        coeff = jnp.asarray(rs.randn(d, m) * 0.3, jnp.float32)
        a = 0.1
        got = rff_features_pallas(x, coeff, a, interpret=True)
        want = rff_features_reference(x, coeff, a)
        assert got.shape == (b, 2 * m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=1e-5)


class TestMixtureLogprobKernel:
    @pytest.mark.parametrize("b,d,k", [(100, 2, 10), (13, 5, 3)])
    def test_matches_reference(self, b, d, k):
        rs = np.random.RandomState(1)
        w = jnp.asarray(rs.dirichlet(np.ones(k), size=b), jnp.float32)
        mu = jnp.asarray(rs.randn(b, d, k), jnp.float32)
        l_d = jnp.asarray(np.exp(rs.randn(b, d, k) * 0.3), jnp.float32)
        y = jnp.asarray(rs.randn(b, d), jnp.float32)
        got = diag_mixture_logprob_pallas(w, mu, l_d, y, interpret=True)
        want = diag_mixture_logprob_reference(w, mu, l_d, y)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=1e-4)

    def test_matches_scipy(self):
        from scipy.stats import norm
        from scipy.special import logsumexp
        rs = np.random.RandomState(2)
        b, d, k = 6, 2, 3
        w = rs.dirichlet(np.ones(k), size=b)
        mu = rs.randn(b, d, k)
        l_d = np.exp(rs.randn(b, d, k) * 0.2)
        y = rs.randn(b, d)
        want = np.array([
            logsumexp([np.log(w[i, j])
                       + norm.logpdf(y[i], mu[i, :, j],
                                     l_d[i, :, j]).sum()
                       for j in range(k)])
            for i in range(b)])
        got = diag_mixture_logprob_reference(
            jnp.asarray(w, jnp.float32), jnp.asarray(mu, jnp.float32),
            jnp.asarray(l_d, jnp.float32), jnp.asarray(y, jnp.float32))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)
