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

    def test_factor_substitute_matches_solve(self):
        """spd_factor_lanes + spd_substitute_lanes == spd_solve_lanes for
        several right-hand sides (frozen-mass substep contract)."""
        from bayes_sim_ig_tpu.ops.spd_kernel import (
            spd_factor_lanes, spd_solve_lanes, spd_substitute_lanes)
        A, b = self._spd(5, 9, seed=4)
        At = jnp.transpose(A, (1, 2, 0))
        fac = spd_factor_lanes(At)
        for seed in (5, 6):
            b2 = jnp.asarray(
                np.random.RandomState(seed).randn(9, 5).astype(np.float32))
            x_fac = spd_substitute_lanes(fac, b2)
            x_ref = spd_solve_lanes(At, b2)
            np.testing.assert_allclose(np.asarray(x_fac), np.asarray(x_ref),
                                       rtol=1e-5, atol=1e-6)

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


class TestTreeSolve:
    """Branch-sparse LTDL (ops/tree_solve.py) vs dense reference solves on
    the real task models' mass matrices."""

    def _model_case(self, build):
        from bayes_sim_ig_tpu.physics import (DynParams,
                                              forward_kinematics,
                                              mass_matrix)
        from bayes_sim_ig_tpu.physics.dynamics import _link_inertias
        model = build()
        rs = np.random.RandomState(0)
        q = model.neutral_q()
        # Perturb 1-dof joints only (keep quats valid).
        if model.j1_q.size:
            q[model.j1_q] += rs.randn(model.j1_q.size) * 0.3
        v = rs.randn(model.nv) * 0.1
        params = DynParams.defaults(model)
        kin = forward_kinematics(model, jnp.asarray(q), jnp.asarray(v),
                                 params)
        I_sp = _link_inertias(model, params)
        M = np.asarray(mass_matrix(model, kin, I_sp), np.float64)
        M = M + np.eye(model.nv) * 1e-3
        return model, M

    @pytest.mark.parametrize("task_mod,builder", [
        ("shadow_hand", "build_hand_model"),
        pytest.param("ant", "build_ant_model",
                     marks=pytest.mark.heavy),   # slow CPU compile (42 s)
        pytest.param("humanoid", "build_humanoid_model",
                     marks=pytest.mark.heavy),  # slow FK compile
    ])
    def test_matches_dense_solve(self, task_mod, builder):
        import importlib
        from bayes_sim_ig_tpu.ops.tree_solve import (ancestor_pairs,
                                                     ltdl_solve)
        mod = importlib.import_module(f"bayes_sim_ig_tpu.sim.{task_mod}")
        build = getattr(mod, builder)
        def built():
            out = build()
            return out[0] if isinstance(out, tuple) else out
        model, M = self._model_case(built)
        rs = np.random.RandomState(1)
        nv = model.nv
        nbatch = 5
        b = rs.randn(nv, nbatch)
        want = np.linalg.solve(M, b)
        chains = model.dof_anc_chains
        pairs = ancestor_pairs(chains)
        # Structure check: M is (numerically) zero outside ancestor pairs.
        mask = np.zeros((nv, nv), bool)
        for (k, i) in pairs:
            mask[k, i] = mask[i, k] = True
        off = np.abs(M)[~mask].max() if (~mask).any() else 0.0
        assert off < 1e-4 * np.abs(M).max()
        Mp = {(k, i): jnp.full((nbatch,), M[k, i], jnp.float64)
              for (k, i) in pairs}
        rows = ltdl_solve(chains, Mp,
                          [jnp.asarray(b[k]) for k in range(nv)])
        got = np.asarray(jnp.stack(rows, 0), np.float64)
        # f32 solver vs f64 reference: tolerance scales with cond(M)*eps32.
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)
        resid = M @ got - b
        assert np.abs(resid).max() < 1e-4 * max(np.abs(b).max(), 1.0)

    def test_factor_reuse_multiple_rhs(self):
        """ltdl_factor once + ltdl_substitute per rhs == ltdl_solve per
        rhs (the frozen-mass substep scheme's contract)."""
        from bayes_sim_ig_tpu.ops.tree_solve import (
            ancestor_pairs, ltdl_factor, ltdl_solve, ltdl_substitute)
        chains = [[], [0], [1, 0], [0], [3, 0]]  # branching 5-dof tree
        pairs = ancestor_pairs(chains)
        rs = np.random.RandomState(3)
        L = np.eye(5) + np.tril(rs.rand(5, 5), -1) * 0.3
        M5 = L @ L.T + np.eye(5) * 2.0
        mask = np.zeros((5, 5), bool)
        for (k, i) in pairs:
            mask[k, i] = mask[i, k] = True
        M5 = np.where(mask, M5, 0.0)  # restrict to the tree sparsity
        Mp = {(k, i): jnp.full((3,), M5[k, i]) for (k, i) in pairs}
        fac = ltdl_factor(chains, Mp)
        for seed in (0, 1):
            b = np.random.RandomState(seed).randn(5, 3)
            rows_fac = ltdl_substitute(chains, fac,
                                       [jnp.asarray(b[k]) for k in range(5)])
            rows_ref = ltdl_solve(chains, Mp,
                                  [jnp.asarray(b[k]) for k in range(5)])
            np.testing.assert_allclose(np.asarray(jnp.stack(rows_fac)),
                                       np.asarray(jnp.stack(rows_ref)),
                                       rtol=1e-6)

    def test_indefinite_propagates_nan(self):
        from bayes_sim_ig_tpu.ops.tree_solve import (ancestor_pairs,
                                                     ltdl_solve)
        chains = [[], [0], [1, 0]]  # 3-dof chain (full ancestor lists)
        pairs = ancestor_pairs(chains)
        Mp = {p: jnp.ones((2,)) for p in pairs}
        Mp[(0, 0)] = jnp.array([4.0, -1.0])  # env 1 indefinite
        Mp[(1, 1)] = jnp.array([5.0, 5.0])
        Mp[(2, 2)] = jnp.array([6.0, 6.0])
        rows = ltdl_solve(chains, Mp, [jnp.ones(2)] * 3)
        x = np.asarray(jnp.stack(rows, 0))
        assert np.isfinite(x[:, 0]).all()
        assert np.isnan(x[:, 1]).any()
