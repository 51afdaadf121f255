"""Tests for the denovo path assembler and hierarchical clusterer."""

import random

from defuse_tpu.align.denovo import PathFinder
from defuse_tpu.cluster.hierarchical import hierarchical_cluster
from defuse_tpu.core.types import revcomp


def test_pathfinder_reconstructs_fusion():
    rng = random.Random(4)
    left = "".join(rng.choice("ACGT") for _ in range(80))
    right = "".join(rng.choice("ACGT") for _ in range(80))
    fusion = left + right

    reads, lflag, rflag = [], [], []
    # anchor reads: pure-left and pure-right sequences
    for i in range(0, 40, 4):
        reads.append(left[i:i + 36])
        lflag.append(1)
        rflag.append(0)
    for i in range(0, 40, 4):
        reads.append(right[i:i + 36])
        lflag.append(0)
        rflag.append(1)
    # crossing reads tile the junction
    for i in range(40, 120, 3):
        reads.append(fusion[i:i + 36])
        lflag.append(0)
        rflag.append(0)

    pf = PathFinder(k=21, max_length=400, find_all=False, min_count=1)
    assert pf.find_path(reads, lflag, rflag)
    # the assembled path must be a substring of the true fusion sequence
    assert pf.sequences[0] in fusion
    assert len(pf.sequences[0]) > 60


def test_pathfinder_min_count_prunes():
    reads = ["AAAACCCCGGGG", "CCCCGGGGTTTT"]
    pf = PathFinder(k=8, max_length=100, find_all=False, min_count=5)
    assert not pf.find_path(reads, [1, 0], [0, 1])


def test_hierarchical_average_linkage():
    # two tight groups far apart
    points = [0.0, 1.0, 2.0, 50.0, 51.0]
    n = len(points)
    d = [[abs(points[i] - points[j]) for j in range(n)] for i in range(n)]
    clusters = hierarchical_cluster(d, threshold=10.0)
    assert sorted(sorted(c) for c in clusters) == [[0, 1, 2], [3, 4]]

    # threshold below everything: no merges
    clusters = hierarchical_cluster(d, threshold=0.5)
    assert sorted(sorted(c) for c in clusters) == [[0], [1], [2], [3], [4]]
