"""Identifiability report over a grasp-ADR run's checkpointed posteriors.

For every `checkpoints/posterior_<N>.pkl` under the given run dir
(bayes_sim_main writes one per ADR iteration), reports per selected
parameter dim the posterior marginal mean/std, plus log p(truth) under
the full MoG vs the uniform prior — the table PARITY.md's
"identifiable dims" rows are built from (VERDICT round-4 item 4: the
full_state-obs rerun re-measures it).

Usage: python experiments/identifiability_report.py RUNDIR [TRUTH]
RUNDIR is the --logdir passed to bayes_sim_main (the script descends
into the generated run-name subdir). TRUTH defaults to 1.8 broadcast
(the shadow_hand_grasp realParams value).
"""

import glob
import os
import pickle
import sys

# Host-side MoG algebra only — never claim the (possibly busy) TPU.
# The axon sitecustomize pins JAX_PLATFORMS, so force through
# jax.config (which wins) as tests/conftest.py does.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(rundir, truth_val=1.8):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bayes_sim_ig_tpu.distributions import MoG, Uniform
    import yaml

    cfgs = glob.glob(os.path.join(rundir, "**", "cfg_env.yaml"),
                     recursive=True)
    ckpts = sorted(
        glob.glob(os.path.join(rundir, "**", "posterior_*.pkl"),
                  recursive=True),
        key=lambda f: int(os.path.splitext(
            os.path.basename(f))[0].split("_")[1]))
    assert ckpts, f"no posterior checkpoints under {rundir}"

    # Param names from the task spec (the run's own cfg if archived,
    # else the shipped grasp cfg — same DR tree).
    from bayes_sim_ig_tpu.sim import make_env
    cfg_path = cfgs[0] if cfgs else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bayes_sim_ig_tpu", "cfg", "shadow_hand_grasp.yaml")
    cfg = yaml.safe_load(open(cfg_path))
    cfg["env"]["numEnvs"] = 2
    env = make_env("ShadowHand", cfg)
    spec = env.task.params_spec
    names = list(spec.names)
    dim = spec.dim
    truth = np.full(dim, truth_val)
    prior = Uniform(np.asarray(spec.lows), np.asarray(spec.highs))
    lp_prior = float(prior.eval(truth[None], log=True)[0])

    watch = [i for i, n in enumerate(names)
             if "object" in n or "T_" in n][:6]
    print(f"{len(ckpts)} posteriors, {dim} dims; "
          f"log p(truth) under prior = {lp_prior:.1f}")
    print("iter | log p(truth) | " + " | ".join(
        f"{names[i]} mean+-std" for i in watch))
    lps = []
    for f in ckpts:
        d = pickle.load(open(f, "rb"))
        mog = MoG(a=d["weights"], ms=list(d["means"]),
                  Ss=list(d["covs"]))
        lp = float(mog.eval(truth[None], log=True)[0])
        lps.append(lp)
        m, S = mog.calc_mean_and_cov()
        sd = np.sqrt(np.diag(S))
        cells = " | ".join(f"{m[i]:.2f}+-{sd[i]:.2f}" for i in watch)
        print(f"{d['real_iter_id']:4d} | {lp:8.1f} | {cells}")
    print(f"log p(truth) band: {min(lps):.1f} .. {max(lps):.1f} "
          f"(prior {lp_prior:.1f})")


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 1.8)
