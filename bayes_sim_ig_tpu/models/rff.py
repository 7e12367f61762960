"""Random Fourier Features with RBF / Matern kernel spectral densities.

JAX rebuild of the reference RFF front-end
(``/root/reference/bayes_sim_ig/models/rff.py:44-184``). Frequencies are
drawn once at construction on the host (quasi-random generalized-Halton
points pushed through the kernel's inverse spectral CDF when input dim <=
100, reference rff.py:111-120; direct sampling otherwise) and stored as a
device array. The feature map itself — one matmul fused with cos/sin — is a
pure jittable function that runs on the MXU.
"""

from __future__ import annotations

import numpy as np
from scipy.special import erfinv

import jax.numpy as jnp

from ..distributions.halton import halton_sequence


class RFFKernel:
    """Spectral density of a shift-invariant kernel."""

    def sample_freqs(self, shape):
        raise NotImplementedError

    def inv_cdf(self, x):
        raise NotImplementedError


class RFFKernelRBF(RFFKernel):
    def sample_freqs(self, shape):
        return np.random.normal(0.0, 1.0, shape)

    def inv_cdf(self, x):
        return erfinv(2.0 * x - 1.0) * np.sqrt(2.0)


class RFFKernelMatern12(RFFKernel):
    """Laplace kernel; spectral density is a standard Cauchy."""

    def sample_freqs(self, shape):
        return np.random.normal(0, 1, shape) * np.sqrt(
            1.0 / np.random.chisquare(1, shape))

    def inv_cdf(self, x):
        return np.tan(np.pi * (x - 0.5))


class RFFKernelMatern32(RFFKernel):
    """Spectral density is Student-t with 3 dof (inverse CDF per Shaw 2006)."""

    def sample_freqs(self, shape):
        return np.random.normal(0, 1, shape) * np.sqrt(
            3.0 / np.random.chisquare(3, shape))

    def inv_cdf(self, x):
        return (2.0 * x - 1.0) / np.sqrt(2.0 * x * (1.0 - x))


class RFFKernelMatern52(RFFKernel):
    """Spectral density is Student-t with 5 dof (inverse CDF per Shaw 2006)."""

    def sample_freqs(self, shape):
        return np.random.normal(0, 1, shape) * np.sqrt(
            5.0 / np.random.chisquare(5, shape))

    def inv_cdf(self, x):
        alpha = 4.0 * x * (1.0 - x)
        p = 4.0 * np.cos(np.arccos(np.sqrt(alpha)) / 3.0) / np.sqrt(alpha)
        return np.sign(x - 0.5) * np.sqrt(p - 4.0)


_KERNELS = {
    "RBF": RFFKernelRBF,
    "Laplace": RFFKernelMatern12,
    "Matern12": RFFKernelMatern12,
    "Matern32": RFFKernelMatern32,
    "Matern52": RFFKernelMatern52,
}


class RFF:
    """Random Fourier feature map phi: R^d -> R^n_feat.

    Make sure the input space is roughly normalized (range within ~one order
    of magnitude), as in the reference (rff.py:46-48).
    """

    def __init__(self, n_feat, d, sigma, cos_only=False, quasi_random=True,
                 kernel="RBF", dtype=jnp.float32):
        self.n_feat = int(n_feat)
        self.d = int(d)
        if isinstance(sigma, (list, tuple, np.ndarray)):
            sigma = np.asarray(sigma, dtype=np.float64)
            assert sigma.shape == (self.d,)
        else:
            sigma = np.full(self.d, float(sigma))
        self.cos_only = cos_only
        if kernel not in _KERNELS:
            raise ValueError(f"Kernel {kernel} is not recognised.")
        rff_kernel = _KERNELS[kernel]()
        if cos_only:
            freqs = self.draw_freqs(rff_kernel, self.n_feat, self.d,
                                    quasi_random)
            # numpy: inlines as an HLO literal in jitted training scans
            # (a jax.Array const would stall every scan iteration here).
            self.offset = np.asarray(
                2.0 * np.pi * np.random.rand(1, self.n_feat),
                np.float32 if dtype == jnp.float32 else dtype)
            self.a = float(np.sqrt(1.0 / self.n_feat))
        else:
            assert self.n_feat % 2 == 0
            freqs = self.draw_freqs(rff_kernel, self.n_feat // 2, self.d,
                                    quasi_random)
            self.offset = None
            self.a = float(np.sqrt(1.0 / (self.n_feat / 2)))
        # Pre-divide by the lengthscale: phi uses x @ (freqs/sigma)^T.
        self.coeff = np.asarray(
            (freqs / sigma).T,
            np.float32 if dtype == jnp.float32 else dtype)  # (d, m)

    @staticmethod
    def draw_freqs(rff_kernel, m, d, quasi_random):
        """(m, d) frequency draws from the kernel's spectral density
        (rff.py:111-120)."""
        if quasi_random:
            points = halton_sequence(m, d)
            return rff_kernel.inv_cdf(points)
        return rff_kernel.sample_freqs((m, d))

    def to_features(self, x):
        """Feature map. On TPU the cos/sin variant runs as a fused Pallas
        kernel (ops/rff_kernel.py); elsewhere (and for cos-only) the jnp
        path is used, which is also the differentiable-through-inputs
        path."""
        if self.cos_only:
            inner = jnp.dot(x, self.coeff)
            return self.a * jnp.cos(inner + self.offset)
        if x.ndim == 2:
            from ..ops import rff_features
            return rff_features(x, self.coeff, self.a)
        inner = jnp.dot(x, self.coeff)
        return self.a * jnp.concatenate(
            [jnp.cos(inner), jnp.sin(inner)], axis=-1)
