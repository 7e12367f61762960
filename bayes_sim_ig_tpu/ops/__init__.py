"""Custom TPU (Pallas) kernels for the inference hot path.

The reference's only native compute dependencies are ghalton (host-side,
replaced in distributions/halton.py) and signatory (replaced by the
closed-form XLA formulation in summarizers/signature.py). These kernels
cover the remaining hot ops called out in BASELINE.json: the RFF feature
projection (matmul fused with cos/sin, models/rff.py) and the
mixture-density log-prob reduction (models/mdnn.py loss inner loop).

Each kernel has a pure-jnp reference fallback; ``use_pallas()`` gates on
actually running on TPU so CPU tests exercise the same code paths via the
fallbacks (or interpret mode in the kernel unit tests).
"""

import jax


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"


from .rff_kernel import rff_features, rff_features_reference  # noqa: E402
from .mog_kernel import (  # noqa: E402
    diag_mixture_logprob, diag_mixture_logprob_reference,
)
from .spd_kernel import spd_solve, spd_solve_lanes  # noqa: E402

__all__ = ["use_pallas", "rff_features", "rff_features_reference",
           "diag_mixture_logprob", "diag_mixture_logprob_reference",
           "spd_solve", "spd_solve_lanes"]
