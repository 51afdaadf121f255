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


def test_setcover_file_native_matches_python(tmp_path):
    """dt_setcover_file (whole stage in C++) is byte-identical to the
    Python read/solve/rewrite pipeline on fuzzed cluster-row files,
    including sub-min-size drops, gap cluster ids, and rows for both
    read ends."""
    import random

    from defuse_tpu.cluster import native
    from defuse_tpu.cluster.setcover import (read_cluster_fragments,
                                             rewrite_clusters)

    if not native.available():
        pytest.skip("native library unavailable")

    rng = random.Random(7)
    for trial in range(8):
        n_clusters = rng.randrange(1, 40)
        lines = []
        for cid in range(n_clusters):
            if rng.random() < 0.2:
                continue  # gap id
            frags = rng.sample(range(60), rng.randrange(1, 8))
            for f in frags:
                for end in (0, 1):
                    lines.append(f"{cid}\t{end}\t{f}\tchr{f % 3}\t+\t"
                                 f"{f * 10}\t{f * 10 + 50}")
        rng.shuffle(lines)
        src = tmp_path / f"clusters.{trial}"
        src.write_text("\n".join(lines) + ("\n" if trial % 2 else ""))
        min_size = rng.randrange(1, 4)

        py_out = tmp_path / f"sc.py.{trial}"
        clusters = read_cluster_fragments(str(src))
        rewrite_clusters(str(src), str(py_out),
                         native.set_cover(clusters), min_size)

        nat_out = tmp_path / f"sc.nat.{trial}"
        rc = native.setcover_file(str(src), str(nat_out), min_size)
        assert rc is not None
        assert nat_out.read_bytes() == py_out.read_bytes(), trial
