"""Byte-parity of greedy set cover against the golden reference build."""

import pytest

from defuse_tpu.cluster.setcover import run_setcover_file, set_cover

from helpers import TEST_SAM, run_ref_clustermatepairs, run_ref_setcover, \
    sam_to_compact


def test_setcover_simple():
    # cluster 2 (size 4) wins first: takes 4,5,6,7; then cluster 0 takes
    # 1,2,3; cluster 1's remaining size is 0; cluster 3 takes 8.
    clusters = [[1, 2, 3], [3, 4], [4, 5, 6, 7], [8]]
    assert set_cover(clusters) == [[1, 2, 3], [], [4, 5, 6, 7], [8]]


def test_setcover_tie_lowest_id():
    clusters = [[1, 2], [3, 4]]
    assert set_cover(clusters) == [[1, 2], [3, 4]]


def test_setcover_byte_parity(ref_binaries, tmp_path):
    compact = tmp_path / "disc.compact"
    sam_to_compact(TEST_SAM, compact)
    clusters = tmp_path / "clusters"
    run_ref_clustermatepairs(ref_binaries, compact, clusters,
                             mean=200, stddev=20, precision=0.95,
                             min_cluster_size=2)
    golden = tmp_path / "clusters.sc.golden"
    run_ref_setcover(ref_binaries, clusters, golden, min_cluster_size=2)

    ours = tmp_path / "clusters.sc.ours"
    run_setcover_file(str(clusters), str(ours), 2)

    golden_text = golden.read_text()
    assert golden_text
    assert ours.read_text() == golden_text
