"""BayesSimIG-TPU: a TPU-native adaptive domain-randomization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
NVlabs/bayes-sim-ig (arXiv:2107.04527): likelihood-free simulation-parameter
inference (BayesSim) coupled with massively vectorized RL environments for
adaptive domain randomization (ADR).

Unlike the reference (PyTorch + closed-source Isaac Gym / PhysX), everything
here is TPU-first:

* physics parameters are *data* — one batched params array with a leading env
  axis; "applying randomization" is indexing fresh rows, never a scene rebuild;
* environments are pure functions ``step(state, action, params)`` composed
  with ``jax.vmap`` over envs and ``jax.lax.scan`` over time;
* rollout collection, summarization, mixture-density-network training and PPO
  are jit-compiled programs with host round-trips only at ADR iteration
  boundaries;
* multi-chip scaling is data-parallel over an env-sharded
  ``jax.sharding.Mesh`` with XLA collectives (no NCCL/MPI).

Layer map (mirrors reference SURVEY.md):
  L6 orchestrator  -> bayes_sim_main.py
  L5 inference     -> engine.py (BayesSim)
  L4a models       -> models/ (MDNN, MDRFF, RFF)
  L4b collection   -> utils/collect.py
  L3 summaries     -> summarizers/, distributions/
  L2 env + DR      -> sim/, dr/
  L1 engine + RL   -> sim/physics (replaces PhysX), rl/ (replaces rlgpu PPO)
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """Persistent XLA compilation cache, opt-IN via BSIM_COMPILE_CACHE=<dir>.

    Off by default: cached CPU executables are AOT-specialized to the
    exact XLA feature flags of the writing process, and loading an entry
    written under different flags (e.g. a forced multi-device test env)
    segfaults the interpreter outright. The TPU path never benefited
    anyway — its remote compiler bypasses this cache."""
    import os
    if not os.environ.get("BSIM_COMPILE_CACHE"):
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["BSIM_COMPILE_CACHE"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:  # older jax or read-only fs: not fatal
        pass


_enable_persistent_compile_cache()
