"""Cluster post-filter cascade: line filters byte-identical to the
reference Perl scripts; dedupe content-identical (survivor order is
hash-dependent in the reference)."""

import os
import subprocess

from defuse_tpu.annotate.gene_models import GeneModels
from defuse_tpu.filters.cluster_filters import (merge_clusters,
                                                remove_duplicates,
                                                segregate_mitochondrial,
                                                select_fusion_clusters)
from defuse_tpu.pipeline.discover import discover_fusions

from synthdata import make_dataset, write_dataset, write_gtf

REF_SCRIPTS = "/root/reference/scripts"
PENV = dict(os.environ, PERL_HASH_SEED="0", PERL_PERTURB_KEYS="0")


def _cluster_lines(tmp_path, ds):
    paths = write_dataset(ds, tmp_path)
    outs = discover_fusions(
        spanning=str(paths["spanning"]), improper=str(paths["improper"]),
        fastq1=str(paths["fastq1"]), fastq2=str(paths["fastq2"]),
        reference=str(paths["reference"]), exons=str(paths["exons"]),
        fragment_mean=200.0, fragment_stddev=20.0, precision=0.95,
        min_cluster_size=3, min_read_length=50, max_read_length=50,
        outdir=str(tmp_path / "disc"), use_device=False)
    with open(outs["clusters"]) as fh:
        return paths, fh.readlines()


def test_select_fusion_clusters_golden(tmp_path):
    ds = make_dataset(seed=7)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    paths, lines = _cluster_lines(tmp_path, ds)

    proc = subprocess.run(
        ["perl", f"{REF_SCRIPTS}/select_fusion_clusters.pl", str(gtf)],
        input="".join(lines), capture_output=True, text=True, env=PENV)
    assert proc.returncode == 0, proc.stderr

    gm = GeneModels(str(gtf))
    ours = "".join(select_fusion_clusters(lines, gm))
    assert ours == proc.stdout
    assert ours, "everything filtered — test data too weak"


def test_segregate_mitochondrial_golden(tmp_path):
    ds = make_dataset(seed=7)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    paths, lines = _cluster_lines(tmp_path, ds)

    # no MT chromosome in the synthetic data: everything passes, and the
    # byte contract still holds
    proc = subprocess.run(
        ["perl", f"{REF_SCRIPTS}/segregate_mitochondrial.pl", str(gtf),
         "MT"],
        input="".join(lines), capture_output=True, text=True, env=PENV)
    assert proc.returncode == 0, proc.stderr
    gm = GeneModels(str(gtf))
    ours = "".join(segregate_mitochondrial(lines, gm, "MT"))
    assert ours == proc.stdout


def test_remove_duplicates_content(tmp_path):
    ds = make_dataset(seed=7)
    paths, lines = _cluster_lines(tmp_path, ds)
    proc = subprocess.run(
        ["perl", f"{REF_SCRIPTS}/remove_duplicates.pl", "3"],
        input="".join(lines), capture_output=True, text=True, env=PENV)
    assert proc.returncode == 0, proc.stderr
    ours = remove_duplicates(lines, 3)
    # survivor identity is hash-order-dependent in Perl; the kept
    # position-pair multiset per cluster must match
    def pairsets(text_lines):
        out = {}
        rows = [l.rstrip("\n").split("\t") for l in text_lines if
                l.strip()]
        by_cluster = {}
        for f in rows:
            by_cluster.setdefault(int(f[0]), {}).setdefault(
                int(f[2]), {})[int(f[1])] = \
                int(f[6]) if f[5] == "+" else int(f[7])
        for cid, frags in by_cluster.items():
            out[cid] = sorted((v.get(0), v.get(1)) for v in
                              frags.values())
        return out
    assert pairsets(ours) == pairsets(proc.stdout.splitlines(True))


def test_merge_clusters_golden(tmp_path):
    ds = make_dataset(seed=7)
    paths, lines = _cluster_lines(tmp_path, ds)
    half = len(lines) // 2
    # split at a cluster boundary
    while half < len(lines) and lines[half].split("\t")[0] == \
            lines[half - 1].split("\t")[0]:
        half += 1
    f1 = tmp_path / "part1"
    f2 = tmp_path / "part2"
    f1.write_text("".join(lines[:half]))
    f2.write_text("".join(lines[half:]))
    proc = subprocess.run(
        ["perl", f"{REF_SCRIPTS}/merge_clusters.pl", str(f1), str(f2)],
        capture_output=True, text=True, env=PENV)
    assert proc.returncode == 0, proc.stderr
    ours = "".join(merge_clusters([lines[:half], lines[half:]]))
    assert ours == proc.stdout
