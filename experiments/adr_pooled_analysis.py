"""Pooled multi-seed grasp-ADR vs DR-control analysis (PARITY.md item 4).

Reads SurrogateReal/real_rewards_mean from the TB event files of the
grasp/drctl run pairs for the given seeds, drops each grasp run's
iteration 0 (that policy trains before any posterior exists, so it is a
prior-trained sample, not a posterior-trained one), and reports
per-seed and pooled mean/median plus a one-sided Mann-Whitney U
(posterior-trained > prior-trained). Reference analogue: the headline
posterior-vs-prior comparison in /root/reference/README.md:174-188.

Usage: python experiments/adr_pooled_analysis.py RUNDIR_GRASP:RUNDIR_CTL ...
e.g.   python experiments/adr_pooled_analysis.py \
           runs/shadowhand_grasp_r4:runs/shadowhand_drctl_r4 \
           runs/shadowhand_grasp_r4s11:runs/shadowhand_drctl_r4s11
"""
import glob
import sys
from math import erf

import numpy as np
from tensorboard.backend.event_processing.event_accumulator import (
    EventAccumulator,
)


def series(run_dir):
    d = glob.glob(run_dir.rstrip("/") + "/Shadow*/bsim")[0]
    ea = EventAccumulator(d)
    ea.Reload()
    return np.array(
        [x.value for x in ea.Scalars("SurrogateReal/real_rewards_mean")]
    )


def mwu_one_sided(a, b):
    """One-sided Mann-Whitney U: H1 = a stochastically > b.

    Normal approximation with midrank tie handling and continuity
    correction (fine at the n~20-40 per arm these runs produce).
    """
    n1, n2 = len(a), len(b)
    allv = np.concatenate([a, b])
    ranks = np.empty(len(allv))
    order = np.argsort(allv)
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1
        i = j + 1
    r1 = ranks[:n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2
    mu = n1 * n2 / 2
    sigma = np.sqrt(n1 * n2 * (n1 + n2 + 1) / 12)
    z = (u1 - mu - 0.5) / sigma
    p = 1 - 0.5 * (1 + erf(z / np.sqrt(2)))
    return u1, p


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
            f"med={np.median(c):.1f} | MWU one-sided p={p:.3f}"
        )
    if len(pairs) > 1:
        g = np.concatenate(pooled_g)
        c = np.concatenate(pooled_c)
        u, p = mwu_one_sided(g, c)
        print(
            f"pooled: grasp n={len(g)} mean={g.mean():.1f} "
            f"med={np.median(g):.1f} | ctl n={len(c)} mean={c.mean():.1f} "
            f"med={np.median(c):.1f} | MWU one-sided p={p:.3f}"
        )


if __name__ == "__main__":
    main(sys.argv[1:])
