"""Shared test helpers: fixture conversion and golden runners."""

from __future__ import annotations

import pathlib
import subprocess

from defuse_tpu.io.sam import iter_sam, load_alignments, write_compact

REFERENCE = pathlib.Path("/root/reference")
TEST_SAM = REFERENCE / "tools" / "discordant.test.sam"


def sam_to_compact(sam_path, compact_path):
    """Convert a SAM file to the compact clusterer input, renaming
    fragments to integer ids in first-appearance order (the pipeline does
    this up front via ``scripts/index_paired_fastq.pl``)."""
    name_to_id: dict[str, int] = {}
    recs = []
    for rec in iter_sam(sam_path):
        fid = name_to_id.setdefault(rec.fragment, len(name_to_id))
        rec.fragment = str(fid)
        recs.append(rec)
    table = load_alignments(recs, fragment_ids_are_ints=True)
    write_compact(table, compact_path)
    return table


def run_ref_clustermatepairs(ref_bin, compact_path, out_path, *, mean, stddev,
                             precision, min_cluster_size):
    subprocess.run(
        [str(ref_bin / "clustermatepairs"),
         "-a", str(compact_path), "-c", str(out_path),
         "-u", str(mean), "-s", str(stddev),
         "-p", str(precision), "-m", str(min_cluster_size)],
        check=True, capture_output=True)


def run_ref_setcover(ref_bin, clusters_path, out_path, *, min_cluster_size):
    subprocess.run(
        [str(ref_bin / "setcover"),
         "-c", str(clusters_path), "-o", str(out_path),
         "-m", str(min_cluster_size)],
        check=True, capture_output=True)
