"""Order-insensitive content parity for cluster files.

The byte-parity harness (ref_build + ordered-container shims) pins our
canonical output order.  Stock deFuse builds emit the same *content* in a
boost-hash-dependent order; this module compares cluster files as
sets-of-clusters so outputs of unshimmed reference builds can also be
validated (DESIGN.md "Determinism contract").

Cluster file rows: clusterID end fragment readEnd ref strand start end
(``clustermatepairs.cpp:549-583``).  Two files are content-equal when the
multiset of clusters matches, where a cluster is identified by the frozen
set of its member rows with the cluster ID column dropped.
"""

from __future__ import annotations


def cluster_contents(path: str) -> dict:
    """Map clusterID -> frozenset of member rows (ID column dropped)."""
    clusters: dict[str, set] = {}
    with open(path) as fh:
        for line in fh:
            f = line.rstrip("\n").split("\t")
            clusters.setdefault(f[0], set()).add(tuple(f[1:]))
    return {cid: frozenset(rows) for cid, rows in clusters.items()}


def clusters_content_equal(path_a: str, path_b: str) -> bool:
    """True when both files contain the same multiset of clusters,
    irrespective of cluster numbering and row order."""
    a = sorted(map(sorted, cluster_contents(path_a).values()))
    b = sorted(map(sorted, cluster_contents(path_b).values()))
    return a == b


def breaks_content_equal(path_a: str, path_b: str) -> bool:
    """Break files (``splitreads.break``): rows keyed by cluster, compared
    as sets (cluster renumbering-insensitive via position columns)."""
    def load(path):
        rows = set()
        with open(path) as fh:
            for line in fh:
                f = line.rstrip("\n").split("\t")
                rows.add(tuple(f[1:]))
        return rows
    return load(path_a) == load(path_b)
