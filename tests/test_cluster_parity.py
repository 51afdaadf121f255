"""Byte-parity of the clustering stage against the golden reference build.

Runs the reference ``clustermatepairs`` (compiled with ordered-container
shims — see ref_build/) and our implementation on the bundled discordant
SAM fixture and asserts identical output bytes.
"""

import pathlib

import pytest

from defuse_tpu.cluster.discordant import cluster_alignments
from defuse_tpu.cluster.matepair_em import EMParams
from defuse_tpu.io.sam import iter_compact, load_alignments

from helpers import TEST_SAM, run_ref_clustermatepairs, sam_to_compact

PARAMS = dict(mean=250.0, stddev=30.0, precision=0.95, min_cluster_size=3)


@pytest.fixture(scope="module")
def compact_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cluster_parity")
    compact = tmp / "discordant.compact"
    sam_to_compact(TEST_SAM, compact)
    return compact


def test_clustermatepairs_byte_parity(ref_binaries, compact_fixture,
                                      tmp_path):
    golden = tmp_path / "clusters.golden"
    run_ref_clustermatepairs(ref_binaries, compact_fixture, golden, **PARAMS)

    table = load_alignments(iter_compact(compact_fixture))
    params = EMParams(fragment_mean=PARAMS["mean"],
                      fragment_stddev=PARAMS["stddev"],
                      precision=PARAMS["precision"],
                      min_cluster_size=PARAMS["min_cluster_size"])
    rows = cluster_alignments(table, params)
    ours = "".join(r.format() + "\n" for r in rows)

    golden_text = golden.read_text()
    assert golden_text, "golden clusters file is empty"
    assert ours == golden_text


def test_native_clustermatepairs_byte_parity(compact_fixture, tmp_path):
    """The full native file->file clustering driver matches the Python
    path byte for byte (which the test above pins to the golden build)."""
    from defuse_tpu.cluster import native
    if not native.available():
        pytest.skip("native library not built")

    params = EMParams(fragment_mean=PARAMS["mean"],
                      fragment_stddev=PARAMS["stddev"],
                      precision=PARAMS["precision"],
                      min_cluster_size=PARAMS["min_cluster_size"])

    table = load_alignments(iter_compact(compact_fixture))
    rows = cluster_alignments(table, params, em_mode="oracle")
    py_text = "".join(r.format() + "\n" for r in rows)

    out = tmp_path / "clusters.native"
    native.clustermatepairs(compact_fixture, out, params, n_threads=3)
    assert out.read_text() == py_text


def test_content_parity_checker(ref_binaries, compact_fixture, tmp_path):
    """tests/parity.py compares cluster *content* irrespective of
    numbering/row order (for validating against stock deFuse builds)."""
    from parity import cluster_contents, clusters_content_equal

    golden = tmp_path / "clusters.golden"
    run_ref_clustermatepairs(ref_binaries, compact_fixture, golden, **PARAMS)

    # identical file -> equal
    assert clusters_content_equal(str(golden), str(golden))

    # renumber clusters + shuffle rows -> still content-equal
    import random
    lines = golden.read_text().splitlines()
    ids = sorted({l.split("\t", 1)[0] for l in lines}, key=int)
    remap = {cid: str(len(ids) - 1 - i) for i, cid in enumerate(ids)}
    shuffled = ["\t".join([remap[l.split("\t", 1)[0]],
                           l.split("\t", 1)[1]]) for l in lines]
    random.Random(5).shuffle(shuffled)
    perm = tmp_path / "clusters.perm"
    perm.write_text("\n".join(shuffled) + "\n")
    assert clusters_content_equal(str(golden), str(perm))

    # drop one row -> unequal
    broken = tmp_path / "clusters.broken"
    broken.write_text("\n".join(shuffled[1:]) + "\n")
    assert not clusters_content_equal(str(golden), str(broken))
    assert cluster_contents(str(golden))
