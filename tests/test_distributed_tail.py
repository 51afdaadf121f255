"""Distributed pipeline tail: partitioned clustering.

The reference fans clustering per chr-pair across cluster jobs
(``defuse_run.pl:448-459``); the rebuild partitions the canonical
bin-pair sequence round-robin across ranks
(``dt_clustermatepairs_part``) and interleaves the rank outputs back
into the exact single-process byte stream
(``parallel.shard.merge_cluster_parts``).  These tests pin the
byte-identity contract for every rank count without needing the gloo
runtime: the rank programs are pure functions of (spanning, params,
part, n_parts).
"""

import pytest

from defuse_tpu.cluster import native
from defuse_tpu.cluster.matepair_em import EMParams
from defuse_tpu.parallel.shard import merge_cluster_parts

from helpers import TEST_SAM, sam_to_compact

PARAMS = EMParams(250.0, 30.0, 0.95, 3)


@pytest.fixture(scope="module")
def compact_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dist_tail")
    compact = tmp / "discordant.compact"
    sam_to_compact(TEST_SAM, compact)
    return compact


@pytest.mark.parametrize("n_parts", [1, 2, 3, 4, 7])
def test_partitioned_clustering_byte_identity(compact_fixture, tmp_path,
                                              n_parts):
    if not native.available():
        pytest.skip("native library not built")
    whole = tmp_path / "clusters.whole"
    native.clustermatepairs(compact_fixture, whole, PARAMS, n_threads=2)

    parts, sidecars = [], []
    for r in range(n_parts):
        part = tmp_path / f"clusters.part{r}"
        side = tmp_path / f"clusters.part{r}.counts"
        native.clustermatepairs_part(compact_fixture, part, side,
                                     PARAMS, r, n_parts, n_threads=2)
        parts.append(part)
        sidecars.append(side)
    merged = tmp_path / "clusters.merged"
    merge_cluster_parts(parts, sidecars, merged)
    assert merged.read_bytes() == whole.read_bytes()
    # the partition really split the work (n>1: no rank owns everything)
    if n_parts > 1 and whole.stat().st_size:
        sizes = [p.stat().st_size for p in parts]
        assert max(sizes) < whole.stat().st_size


def test_partitioned_clustering_empty_rank(compact_fixture, tmp_path):
    """More ranks than bin pairs: surplus ranks emit empty parts and
    empty sidecars; the merge still reproduces the whole file."""
    if not native.available():
        pytest.skip("native library not built")
    whole = tmp_path / "w"
    native.clustermatepairs(compact_fixture, whole, PARAMS)
    n = 64
    parts, sidecars = [], []
    for r in range(n):
        part = tmp_path / f"p{r}"
        side = tmp_path / f"p{r}.counts"
        native.clustermatepairs_part(compact_fixture, part, side,
                                     PARAMS, r, n)
        parts.append(part)
        sidecars.append(side)
    merged = tmp_path / "m"
    merge_cluster_parts(parts, sidecars, merged)
    assert merged.read_bytes() == whole.read_bytes()
