#!/usr/bin/env python
"""Recall-decay diagnosis (VERDICT r2 item 5).

Filtered recall on the scale10m dataset decays with background depth
(29/30 @1M -> 26/30 @50M) while classified recall stays 30/30 — i.e.
every lost fusion is still *called*, but its classifier probability
drops below probability_threshold.  This script runs the same seed-777
dataset at two background depths, extracts the per-truth-fusion
probability and all ~45 feature columns from results.classified.tsv,
and prints the features that moved for the lost fusions.

Usage: python scripts_dev/diag_recall.py [n_small] [n_big]
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


def truth_pairs():
    """Reproduce the seed-777 truth set cheaply: the fusion loop runs
    before any background generation, so its rng draws are independent
    of n_background."""
    from sim_validation import generate
    _, _, _, _, truth, _ = generate(random.Random(777), 0)
    return truth


def run_at(n_background):
    """Run scale10m.main at the given depth and harvest the classified
    table (main leaves its tmpdir in place; we adopt and clean it)."""
    import scale10m
    before = set(glob.glob(tempfile.gettempdir() +
                           "/defuse_10m_%d_*" % os.getpid()))
    report = scale10m.main(n_background)
    after = set(glob.glob(tempfile.gettempdir() +
                          "/defuse_10m_%d_*" % os.getpid()))
    (new,) = after - before
    rows = {}
    path = pathlib.Path(new) / "out" / "results.classify.tsv"
    lines = path.read_text().splitlines()
    header = lines[0].split("\t")
    gi1, gi2 = header.index("gene1"), header.index("gene2")
    for line in lines[1:]:
        f = line.split("\t")
        rows[frozenset((f[gi1], f[gi2]))] = dict(zip(header, f))
    shutil.rmtree(new, ignore_errors=True)
    return report, header, rows


def main(n_small=1_000_000, n_big=10_000_000):
    truth = truth_pairs()
    rep_s, header, rows_s = run_at(n_small)
    rep_b, _, rows_b = run_at(n_big)
    print("\nsmall:", rep_s["recall_filtered"],
          " big:", rep_b["recall_filtered"])

    thresh = 0.50
    lost = [t for t in truth
            if t in rows_s and t in rows_b
            and float(rows_s[t]["probability"]) > thresh
            >= float(rows_b[t]["probability"])]
    kept = [t for t in truth if t in rows_b
            and float(rows_b[t]["probability"]) > thresh]
    print(f"\nlost between depths: {len(lost)}; kept at big: {len(kept)}")

    numeric = [c for c in header
               if c not in ("gene1", "gene2", "cluster_id") and
               all(_isnum(rows_b[t].get(c, "")) for t in truth
                   if t in rows_b)]

    for t in lost:
        a, b = sorted(t)
        print(f"\n=== lost fusion {a}/{b}: "
              f"p {rows_s[t]['probability']} -> {rows_b[t]['probability']}")
        deltas = []
        for c in numeric:
            vs, vb = float(rows_s[t][c]), float(rows_b[t][c])
            if vs == vb:
                continue
            scale = max(abs(vs), abs(vb), 1e-12)
            deltas.append((abs(vb - vs) / scale, c, vs, vb))
        for rel, c, vs, vb in sorted(deltas, reverse=True)[:14]:
            print(f"  {c:28s} {vs:12.6g} -> {vb:12.6g}")
    # population context: feature means over kept fusions at both depths
    print("\nkept-fusion feature means (small -> big):")
    for c in numeric:
        ms = sum(float(rows_s[t][c]) for t in kept if t in rows_s) / \
            max(1, sum(1 for t in kept if t in rows_s))
        mb = sum(float(rows_b[t][c]) for t in kept) / max(1, len(kept))
        if abs(ms - mb) / max(abs(ms), abs(mb), 1e-12) > 0.25:
            print(f"  {c:28s} {ms:12.6g} -> {mb:12.6g}")


def _isnum(v):
    try:
        float(v)
        return True
    except ValueError:
        return False


if __name__ == "__main__":
    n_s = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_b = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    main(n_s, n_b)
