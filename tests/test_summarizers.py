"""Unit tests for trajectory summarizers, including an independent
sequential-Chen oracle for the path-signature transform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayes_sim_ig_tpu.summarizers import (
    pad_states_actions, summary_start, summary_waypts, summary_corr,
    summary_corrdiff, summary_signatory, signature_depth, path_signature,
    get_summarizer,
)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape),
                       dtype=jnp.float32)


class TestPadding:
    def test_chop(self):
        s, a = _rand((4, 12, 3)), _rand((4, 12, 2), 1)
        so, ao = pad_states_actions(s, a, 7)
        assert so.shape == (4, 7, 3) and ao.shape == (4, 7, 2)
        np.testing.assert_array_equal(so, s[:, :7])

    def test_pad_repeats_last(self):
        s, a = _rand((4, 5, 3)), _rand((4, 4, 2), 1)
        so, ao = pad_states_actions(s, a, 8)
        assert so.shape == (4, 8, 3) and ao.shape == (4, 8, 2)
        np.testing.assert_array_equal(so[:, 5], s[:, -1])
        np.testing.assert_array_equal(so[:, 7], s[:, -1])
        np.testing.assert_array_equal(ao[:, 4], a[:, -1])

    def test_default_target_aligns_actions_to_states(self):
        s, a = _rand((2, 6, 3)), _rand((2, 5, 1), 1)
        so, ao = pad_states_actions(s, a)
        assert so.shape[1] == ao.shape[1] == 6


class TestSimpleSummaries:
    def test_start_values(self):
        s, a = _rand((3, 12, 3)), _rand((3, 12, 1), 1)
        out = summary_start(s, a, max_t=4)
        assert out.shape == (3, 4 * 4)
        expected = np.concatenate(
            [np.asarray(s[:, :4]), np.asarray(a[:, :4])],
            axis=-1).reshape(3, -1)
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_waypts_equals_start_after_chop(self):
        # Reference behavior: waypoint selection degenerates to first-n.
        s, a = _rand((3, 20, 3)), _rand((3, 20, 1), 1)
        np.testing.assert_array_equal(
            summary_waypts(s, a, n_waypts=10), summary_start(s, a, max_t=10))


def _cross_corr_oracle(states, actions, use_state_diff):
    """Direct numpy transcription of reference summarizers.py:90-122."""
    states, actions = np.asarray(states), np.asarray(actions)
    ntraj, traj_len, state_dim = states.shape
    max_traj_len = 10 if state_dim <= 50 else 5
    if traj_len > max_traj_len:
        states = states[:, :max_traj_len]
        actions = actions[:, :max_traj_len]
    if use_state_diff:
        sf = states[:, :, 1:] - states[:, :, :-1]
    else:
        sf = states[:, :, :-1]
    sf = sf.reshape(ntraj, -1)
    af = actions.reshape(ntraj, -1)
    cc = np.einsum("ni,nj->nij", sf, af).reshape(ntraj, -1)
    mu = sf.mean(axis=-1, keepdims=True)
    std = sf.std(axis=-1, ddof=1, keepdims=True)
    return np.concatenate([cc, mu, std], axis=-1)


class TestCrossCorrelation:
    @pytest.mark.parametrize("diff", [False, True])
    def test_matches_reference_formula(self, diff):
        s, a = _rand((5, 10, 3), 2), _rand((5, 10, 1), 3)
        fn = summary_corrdiff if diff else summary_corr
        np.testing.assert_allclose(
            fn(s, a), _cross_corr_oracle(s, a, diff), rtol=2e-5, atol=1e-6)

    def test_long_traj_downsampled(self):
        s, a = _rand((4, 50, 3), 4), _rand((4, 50, 1), 5)
        out = summary_corr(s, a)
        np.testing.assert_allclose(
            out, _cross_corr_oracle(s, a, False), rtol=2e-5, atol=1e-6)
        # 10 waypoints x 2 state feats x 10 waypoints x 1 action + mu + std
        assert out.shape == (4, 20 * 10 + 2)

    def test_wide_state_uses_5_waypoints(self):
        s, a = _rand((2, 20, 60), 6), _rand((2, 20, 2), 7)
        out = summary_corrdiff(s, a)
        np.testing.assert_allclose(
            out, _cross_corr_oracle(s, a, True), rtol=2e-5, atol=1e-6)
        assert out.shape == (2, (5 * 59) * (5 * 2) + 2)


def _chen_product(A, B, d, depth):
    """Truncated tensor-algebra product (oracle)."""
    C1 = A[0] + B[0]
    out = [C1]
    if depth >= 2:
        out.append(A[1] + B[1] + np.einsum("i,j->ij", A[0], B[0]))
    if depth >= 3:
        out.append(A[2] + B[2] + np.einsum("i,jk->ijk", A[0], B[1])
                   + np.einsum("ij,k->ijk", A[1], B[0]))
    return out


def _signature_oracle(path, depth):
    """Sequential Chen-relation signature of one path (numpy, slow)."""
    path = np.asarray(path, dtype=np.float64)
    d = path.shape[-1]
    sig = None
    for t in range(path.shape[0] - 1):
        dx = path[t + 1] - path[t]
        exp_dx = [dx,
                  np.einsum("i,j->ij", dx, dx) / 2.0,
                  np.einsum("i,j,k->ijk", dx, dx, dx) / 6.0][:depth]
        sig = exp_dx if sig is None else _chen_product(sig, exp_dx, d, depth)
    return np.concatenate([lvl.ravel() for lvl in sig])


class TestSignature:
    def test_chunked_equals_unchunked(self):
        # Batches above the chunk size stream through lax.map in equal
        # chunks (bounding the (chunk, T, d, d) depth-3 peak memory, as the
        # reference does at summarizers.py:157-168); output must be
        # identical, including the non-divisible-tail case.
        paths = _rand((37, 9, 4), seed=3)
        full = path_signature(paths, 3)
        chunked = path_signature(paths, 3, chunk_size=8)
        # fp32 reassociation across the lax.map boundary: tiny abs noise.
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                                   rtol=1e-4, atol=1e-5)

    def test_depth_selection(self):
        assert signature_depth(4) == 3
        assert signature_depth(22) == 3    # 22^3 = 10648 <= 12100
        assert signature_depth(23) == 2    # 23^3 = 12167 > 12100
        assert signature_depth(110) == 2
        assert signature_depth(111) == 1

    def test_single_segment_is_exponential(self):
        d = 3
        delta = np.array([0.5, -1.0, 2.0])
        path = jnp.asarray(np.stack([np.zeros(d), delta])[None])
        sig = np.asarray(path_signature(path, depth=3))[0]
        np.testing.assert_allclose(sig[:d], delta, rtol=1e-5)
        np.testing.assert_allclose(
            sig[d:d + d * d], np.outer(delta, delta).ravel() / 2, rtol=1e-5)
        np.testing.assert_allclose(
            sig[d + d * d:],
            np.einsum("i,j,k->ijk", delta, delta, delta).ravel() / 6,
            rtol=1e-5)

    @pytest.mark.parametrize("depth", [1, 2, 3])
    def test_matches_sequential_chen_oracle(self, depth):
        rs = np.random.RandomState(8)
        paths = rs.randn(4, 7, 3).astype(np.float32)
        got = np.asarray(path_signature(jnp.asarray(paths), depth=depth))
        for b in range(4):
            want = _signature_oracle(paths[b], depth)
            np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)

    def test_levy_area_antisymmetry(self):
        # Level-2 antisymmetric part of a 2D signature is the Levy area,
        # which for a piecewise-linear path equals the exact line integral
        # 0.5 * sum(x dy - y dx) taken from the start point.
        theta = np.linspace(0, np.pi, 16)
        path = np.stack([np.cos(theta), np.sin(theta)], axis=-1)[None]
        sig = np.asarray(path_signature(jnp.asarray(path), depth=2))[0]
        lvl2 = sig[2:].reshape(2, 2)
        area = 0.5 * (lvl2[0, 1] - lvl2[1, 0])
        x, y = path[0, :, 0] - path[0, 0, 0], path[0, :, 1] - path[0, 0, 1]
        expected = 0.5 * np.sum(x[:-1] * np.diff(y) - y[:-1] * np.diff(x))
        assert area == pytest.approx(expected, rel=1e-5)

    def test_summary_signatory_shape_and_time_augmentation(self):
        s, a = _rand((3, 10, 3), 9), _rand((3, 10, 1), 10)
        out = summary_signatory(s, a)
        d = 1 + 3 + 1  # time + state + action channels
        assert out.shape == (3, d + d * d + d ** 3)
        # Level-1 time channel = total time increments = path_len - 1.
        np.testing.assert_allclose(np.asarray(out)[:, 0], 9.0, rtol=1e-6)

    def test_differentiable(self):
        s, a = _rand((2, 6, 2), 11), _rand((2, 6, 1), 12)

        def loss(s):
            return summary_signatory(s, a).sum()

        g = jax.grad(loss)(s)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


def test_registry():
    assert get_summarizer("summary_corrdiff") is summary_corrdiff
    with pytest.raises(KeyError):
        get_summarizer("nope")
