#!/usr/bin/env python
"""Classifier-run instability of near-threshold fusions (VERDICT r2
item 5, part 2).

The reference's run_adaboost.R never seeds R's RNG, and ada() defaults
to bag.frac=0.5 stochastic bagging — so the reference's probabilities
differ between IDENTICAL runs.  This script freezes one 10M-pair
dataset's feature table and classifies it under 20 different bagging
seeds: the filtered-recall spread across seeds bounds how much of the
recall-at-depth decay is attributable to borderline fusions that any
deFuse run may keep or drop by chance.
"""
import glob
import os
import pathlib
import random
import shutil
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "scripts_dev"))


def sweep_results(results_path, truth, seeds=20):
    """20-seed classifier sweep over a finished run's results.tsv:
    emulates the reference's unseeded ada() bagging (run_adaboost.R
    never seeds R's RNG, bag.frac=0.5) to bound how much filtered
    recall moves between IDENTICAL runs.  Returns summary stats plus
    per-truth-fusion keep counts and mean probability margins."""
    import numpy as np

    from defuse_tpu.annotate import adaboost as A
    header, rows = A._read_table(results_path)
    idx = {f: header.index(f) for f in A.FEATURES}
    X = np.array([[float(r[idx[f]]) for f in A.FEATURES] for r in rows])
    gi1, gi2 = header.index("gene1"), header.index("gene2")
    pairs = [frozenset((r[gi1], r[gi2])) for r in rows]
    Xc, yc = A.load_controls()

    recalls = []
    per_pair_hits = {t: 0 for t in truth}
    prob_sum = {t: 0.0 for t in truth}
    prob_n = {t: 0 for t in truth}
    for seed in range(seeds):
        probs = A.AdaBoostClassifier(50, seed=seed).fit(
            Xc, yc).predict_proba(X)
        by_pair = {}
        for pr, pa in zip(probs, pairs):
            by_pair[pa] = max(by_pair.get(pa, 0.0), float(pr))
        kept = {pa for pa, pr in by_pair.items() if pr > 0.5}
        recalls.append(sum(1 for t in truth if t in kept))
        for t in truth:
            if t in kept:
                per_pair_hits[t] += 1
            if t in by_pair:
                prob_sum[t] += by_pair[t]
                prob_n[t] += 1
    margins = {
        "|".join(sorted(t)): {
            "kept_seeds": per_pair_hits[t],
            "mean_prob": round(prob_sum[t] / prob_n[t], 4)
            if prob_n[t] else None,
            "margin_to_0.5": round(prob_sum[t] / prob_n[t] - 0.5, 4)
            if prob_n[t] else None,
        }
        for t in truth
        if prob_n[t] == 0 or per_pair_hits[t] < seeds}
    return {
        "seeds": seeds,
        "recall_min": min(recalls), "recall_max": max(recalls),
        "recall_mean": round(sum(recalls) / len(recalls), 2),
        "n_truth": len(truth),
        "always_kept": sum(1 for h in per_pair_hits.values()
                           if h == seeds),
        "never_kept": sum(1 for t, h in per_pair_hits.items()
                          if h == 0),
        "seed_dependent_or_lost": margins,
    }


def main(n=10_000_000, seeds=20):
    import numpy as np
    from sim_validation import generate
    import scale10m
    from defuse_tpu.annotate import adaboost as A

    _, _, _, _, truth, _ = generate(random.Random(777), 0)
    before = set(glob.glob(tempfile.gettempdir() +
                           "/defuse_10m_%d_*" % os.getpid()))
    scale10m.main(n)
    after = set(glob.glob(tempfile.gettempdir() +
                          "/defuse_10m_%d_*" % os.getpid()))
    (new,) = after - before
    results = pathlib.Path(new) / "out" / "results.tsv"

    header, rows = A._read_table(results)
    idx = {f: header.index(f) for f in A.FEATURES}
    X = np.array([[float(r[idx[f]]) for f in A.FEATURES] for r in rows])
    gi1, gi2 = header.index("gene1"), header.index("gene2")
    pairs = [frozenset((r[gi1], r[gi2])) for r in rows]
    Xc, yc = A.load_controls()

    recalls = []
    per_pair_hits = {t: 0 for t in truth}
    for seed in range(seeds):
        probs = A.AdaBoostClassifier(50, seed=seed).fit(
            Xc, yc).predict_proba(X)
        kept = {p for p, pr in zip(pairs, probs) if pr > 0.5}
        rec = sum(1 for t in truth if t in kept)
        for t in truth:
            per_pair_hits[t] += t in kept
        recalls.append(rec)
    print(f"filtered recall across {seeds} classifier seeds at "
          f"{n // 1_000_000}M pairs: min={min(recalls)} "
          f"max={max(recalls)} mean={sum(recalls) / len(recalls):.1f} "
          f"of {len(truth)}")
    unstable = {tuple(sorted(t)): h for t, h in per_pair_hits.items()
                if 0 < h < seeds}
    print(f"always kept: "
          f"{sum(1 for h in per_pair_hits.values() if h == seeds)}; "
          f"never kept: "
          f"{sum(1 for h in per_pair_hits.values() if h == 0)}; "
          f"seed-dependent: {unstable}")
    shutil.rmtree(new, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
