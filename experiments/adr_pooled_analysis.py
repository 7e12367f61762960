"""Pooled multi-seed grasp-ADR vs DR-control analysis (PARITY.md item 4).

Reads SurrogateReal/real_rewards_mean from the TB event files of the
grasp/drctl run pairs for the given seeds, drops each grasp run's
iteration 0 (that policy trains before any posterior exists, so it is a
prior-trained sample, not a posterior-trained one), and reports
per-seed and pooled mean/median plus a one-sided Mann-Whitney U
(posterior-trained > prior-trained) with exact tie handling via
scipy.stats.mannwhitneyu (round-4 ADVICE: the hand-rolled normal
approximation omitted the tie-correction term in sigma). Reference
analogue: the headline posterior-vs-prior comparison in
/root/reference/README.md:174-188.

Each series read from TB is also archived as JSON under
``experiments/data/`` (git-tracked; ``runs/`` is gitignored and did not
survive the round-4 environment reset), and a ``PAIR`` argument may
name an archived JSON pair directly, so recorded analyses stay
reproducible without the multi-hour reruns.

Usage: python experiments/adr_pooled_analysis.py PAIR [PAIR ...]
  PAIR = RUNDIR_GRASP:RUNDIR_CTL (TB event dirs), or
         FILE_GRASP.json:FILE_CTL.json (archived series)
e.g.   python experiments/adr_pooled_analysis.py \
           runs/shadowhand_grasp_s7:runs/shadowhand_drctl_s7 \
           experiments/data/r5_grasp_s23.json:experiments/data/r5_drctl_s23.json
"""
import glob
import json
import os
import sys

import numpy as np
from scipy.stats import mannwhitneyu


def series(path):
    """Per-iteration surrogate-real reward means from a TB run dir (also
    archived to experiments/data/) or an archived JSON file."""
    if path.endswith(".json"):
        return np.array(json.load(open(path))["real_rewards_mean"])
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    d = glob.glob(path.rstrip("/") + "/Shadow*/bsim")[0]
    ea = EventAccumulator(d)
    ea.Reload()
    vals = [x.value for x in ea.Scalars("SurrogateReal/real_rewards_mean")]
    data_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data")
    os.makedirs(data_dir, exist_ok=True)
    out = os.path.join(
        data_dir, os.path.basename(path.rstrip("/")) + ".json")
    json.dump({"run": path, "tag": "SurrogateReal/real_rewards_mean",
               "real_rewards_mean": vals}, open(out, "w"))
    return np.array(vals)


def mwu_one_sided(a, b):
    """One-sided Mann-Whitney U, H1 = a stochastically > b, with
    midranks AND tie correction (scipy's implementation)."""
    res = mannwhitneyu(a, b, alternative="greater")
    return res.statistic, res.pvalue


def main(pairs):
    pooled_g, pooled_c = [], []
    for pair in pairs:
        gdir, cdir = pair.split(":")
        g = series(gdir)[1:]  # drop iter 0: trained pre-posterior
        c = series(cdir)
        pooled_g.append(g)
        pooled_c.append(c)
        u, p = mwu_one_sided(g, c)
        print(
            f"{gdir}: grasp n={len(g)} mean={g.mean():.1f} "
            f"med={np.median(g):.1f} | ctl n={len(c)} mean={c.mean():.1f} "
            f"med={np.median(c):.1f} | MWU one-sided p={p:.4f}"
        )
    if len(pairs) > 1:
        g = np.concatenate(pooled_g)
        c = np.concatenate(pooled_c)
        u, p = mwu_one_sided(g, c)
        print(
            f"pooled: grasp n={len(g)} mean={g.mean():.1f} "
            f"med={np.median(g):.1f} | ctl n={len(c)} mean={c.mean():.1f} "
            f"med={np.median(c):.1f} | MWU one-sided p={p:.4f}"
        )


if __name__ == "__main__":
    main(sys.argv[1:])
