"""Custom-op tests: Pallas kernels in interpret mode against their jnp
references, the batched SPD solver against XLA, and a scipy oracle for
the MDN mixture log-likelihood that the fused training loss implements.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayes_sim_ig_tpu.ops.rff_kernel import (
    rff_features_pallas, rff_features_reference,
)
from bayes_sim_ig_tpu.ops.spd_kernel import (
    spd_solve, spd_solve_lanes, _pallas_lanes, _chol_lanes_core,
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


class TestSpdSolve:
    def _spd(self, n, nv, seed=0):
        rs = np.random.RandomState(seed)
        A0 = rs.randn(n, nv, nv).astype(np.float32)
        A = np.einsum("nij,nkj->nik", A0, A0) + 5.0 * np.eye(nv)
        b = rs.randn(n, nv).astype(np.float32)
        return jnp.asarray(A), jnp.asarray(b)

    @pytest.mark.parametrize("nv", [3, 14, 30])
    def test_residual_small(self, nv):
        A, b = self._spd(7, nv)
        x = spd_solve(A, b)
        resid = jnp.einsum("nij,nj->ni", A, x) - b
        assert float(jnp.abs(resid).max()) < 1e-3

    def test_lanes_core_matches_xla(self):
        A, b = self._spd(5, 14, seed=3)
        x_ref = jax.scipy.linalg.cho_solve(
            (jnp.linalg.cholesky(A), True), b)
        At = jnp.transpose(A, (1, 2, 0))
        x = _chol_lanes_core(At, b.T).T
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_pallas_kernel_interpret_matches(self):
        # Cheap (4 systems, nv=9) and the ONLY correctness coverage of the
        # opt-in BSIM_SPD_PALLAS path — runs in the default profile so the
        # kernel cannot silently regress (ADVICE round 2).
        from jax.experimental.pallas import tpu as pltpu
        A, b = self._spd(4, 9, seed=5)
        At = jnp.transpose(A, (1, 2, 0))
        want = _chol_lanes_core(At, b.T)
        with pltpu.force_tpu_interpret_mode():
            got = _pallas_lanes(At, b.T)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_differentiable(self):
        A, b = self._spd(3, 5, seed=7)

        def loss(A, b):
            return jnp.sum(spd_solve(A, b) ** 2)

        gA, gb = jax.grad(loss, argnums=(0, 1))(A, b)
        eps = 1e-2
        dA = np.zeros_like(np.asarray(A))
        dA[0, 1, 2] = eps
        dA[0, 2, 1] = eps  # keep symmetric
        num = (loss(A + dA, b) - loss(A - dA, b)) / (2 * eps)
        assert float(num) == pytest.approx(
            float(gA[0, 1, 2] + gA[0, 2, 1]), rel=2e-2)


class TestMixtureLoss:
    def test_mdn_loss_matches_scipy(self):
        """The fused diagonal MDN training loss equals the scipy mixture
        log-likelihood (the former mog-kernel oracle, retargeted at the
        actual training path after the kernel was removed — the fused jnp
        loss measured faster in-scan than any custom call here)."""
        from scipy.stats import norm
        from scipy.special import logsumexp
        from bayes_sim_ig_tpu.models.mdnn import mdn_loss
        rs = np.random.RandomState(2)
        b, d, k = 6, 2, 3
        w = rs.dirichlet(np.ones(k), size=b)
        mu = rs.randn(b, d, k)
        l_d = np.exp(rs.randn(b, d, k) * 0.2)
        y = rs.randn(b, d)
        want_rows = np.array([
            logsumexp([np.log(w[i, j])
                       + norm.logpdf(y[i], mu[i, :, j],
                                     l_d[i, :, j]).sum()
                       for j in range(k)])
            for i in range(b)])
        got = mdn_loss(jnp.asarray(w, jnp.float32),
                       jnp.asarray(mu, jnp.float32),
                       jnp.asarray(l_d, jnp.float32), None,
                       jnp.asarray(y, jnp.float32))
        assert float(got) == pytest.approx(-want_rows.mean(), rel=1e-4)
