"""Shard-merge equivalence: the reference's distribution contracts.

* chr-pair-partitioned clustering + merge == whole-input clustering
  (cluster content; ids renumbered)
* fastq shards through the aligner frontend concatenate to the
  unsharded outputs
* read-stats shard merge recovers the unsharded statistics
"""

import pathlib

from defuse_tpu.align.frontend import align_job
from defuse_tpu.align.seedindex import SeedIndex
from defuse_tpu.annotate.gene_models import GeneModels
from defuse_tpu.cluster.discordant import cluster_alignments
from defuse_tpu.cluster.matepair_em import EMParams
from defuse_tpu.filters.cluster_filters import merge_clusters
from defuse_tpu.io.sam import iter_compact, load_alignments
from defuse_tpu.parallel.shard import (divide_spanning_by_chr_pair,
                                       split_fastq)
from defuse_tpu.stats.readstats import merge_read_stats

from synthdata import make_dataset, write_dataset, write_gtf

PARAMS = EMParams(200.0, 20.0, 0.95, 3)


def _cluster_content(lines_or_rows):
    """Clusters as frozensets of member tuples, id-independent."""
    clusters = {}
    for item in lines_or_rows:
        line = item if isinstance(item, str) else item.format()
        f = line.rstrip("\n").split("\t")
        clusters.setdefault(f[0], set()).add(tuple(f[1:]))
    return sorted(frozenset(v) for v in clusters.values())


def test_chr_pair_sharded_clustering_equals_whole(tmp_path):
    ds = make_dataset(seed=7)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    gm = GeneModels(str(gtf))

    with open(paths["spanning"]) as fh:
        rows = fh.readlines()

    whole = cluster_alignments(
        load_alignments(iter_compact(paths["spanning"])), PARAMS)

    partitions = divide_spanning_by_chr_pair(
        rows, gm.calc_genomic_chromosome)
    assert len(partitions) >= 2, "expected multiple chr-pair partitions"
    shard_outputs = []
    for key in sorted(partitions):
        shard_path = tmp_path / f"span.{key[0]}-{key[1]}"
        shard_path.write_text("".join(partitions[key]))
        shard_rows = cluster_alignments(
            load_alignments(iter_compact(shard_path)), PARAMS)
        shard_outputs.append([r.format() + "\n" for r in shard_rows])

    merged = merge_clusters(shard_outputs)
    assert _cluster_content(merged) == _cluster_content(whole)


def test_fastq_shards_concatenate(tmp_path):
    ds = make_dataset(seed=77, n_fusion_frags=60, n_background_frags=40)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    gm = GeneModels(str(gtf))
    cdna_seqs = {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
                 for g in ds.genes}
    cdna_index = SeedIndex(cdna_seqs)
    genome_index = SeedIndex(ds.genome)

    def reads_of(path):
        out = []
        with open(path) as fh:
            while True:
                h = fh.readline()
                if not h:
                    break
                out.append(fh.readline().rstrip("\n"))
                fh.readline()
                fh.readline()
        return out

    reads1 = reads_of(paths["fastq1"])
    reads2 = reads_of(paths["fastq2"])

    whole = align_job(cdna_index=cdna_index, genome_index=genome_index,
                      rrna_index=None, gene_models=gm, reads1=reads1,
                      reads2=reads2, outdir=str(tmp_path / "whole"))

    prefixes = split_fastq(str(paths["fastq1"]), str(paths["fastq2"]),
                           str(tmp_path / "shards"), reads_per_job=40)
    assert len(prefixes) >= 2
    spanning_parts = []
    stats_parts = []
    for i, prefix in enumerate(prefixes):
        sub1 = reads_of(f"{prefix}.1.fastq")
        sub2 = reads_of(f"{prefix}.2.fastq")
        offset = i * 40
        res = align_job(cdna_index=cdna_index, genome_index=genome_index,
                        rrna_index=None, gene_models=gm, reads1=sub1,
                        reads2=sub2,
                        outdir=str(tmp_path / f"shard{i}"))
        stats_parts.append(res["stats"])
        # fragment ids are shard-local; globalize by offset like the
        # reference's global renaming
        for line in open(res["spanning"]):
            f = line.split("\t")
            f[0] = str(int(f[0]) + offset)
            spanning_parts.append("\t".join(f))

    whole_rows = sorted(open(whole["spanning"]).read().splitlines())
    shard_rows = sorted(l.rstrip("\n") for l in spanning_parts)
    assert shard_rows == whole_rows

    merged_stats = merge_read_stats(stats_parts)
    whole_stats = whole["stats"]
    assert merged_stats.frag_count == whole_stats.frag_count
    assert abs(merged_stats.fraglength_mean
               - whole_stats.fraglength_mean) < 1e-9
    assert abs(merged_stats.fraglength_stddev
               - whole_stats.fraglength_stddev) < 1e-9


def test_launch_merge_artifacts(tmp_path):
    """Shard-order artifact concatenation + read-stats file merge
    (parallel.launch contracts)."""
    from defuse_tpu.parallel.launch import (init_distributed,
                                            merge_artifacts,
                                            merge_stats_files)
    from defuse_tpu.stats.readstats import ReadStats

    # single-process degenerate init (no coordinator in env)
    assert init_distributed() == (0, 1)

    shards = []
    for i in range(3):
        d = tmp_path / f"shard{i}"
        d.mkdir()
        (d / "spanning.compact").write_text(f"{i}\t0\tchr1\t+\t1\t50\n")
        (d / "improper.sam").write_text(f"row{i}\n")
        shards.append(str(d))
    merged = merge_artifacts(shards, str(tmp_path / "merged"))
    assert open(merged["spanning.compact"]).read() == (
        "0\t0\tchr1\t+\t1\t50\n1\t0\tchr1\t+\t1\t50\n"
        "2\t0\tchr1\t+\t1\t50\n")
    assert open(merged["improper.sam"]).read() == "row0\nrow1\nrow2\n"

    stats_paths = []
    for i, (n, mean, std) in enumerate([(100, 200.0, 20.0),
                                        (300, 210.0, 25.0)]):
        p = tmp_path / f"stats{i}"
        p.write_text(ReadStats(n, mean, std, 50, 50, (50,)).format())
        stats_paths.append(str(p))
    out = merge_stats_files(stats_paths, str(tmp_path / "stats.merged"))
    f = open(out).read().splitlines()[1].split("\t")
    assert int(f[0]) == 400
    assert abs(float(f[1]) - (100 * 200.0 + 300 * 210.0) / 400) < 1e-9


def test_launch_global_mesh():
    from defuse_tpu.parallel.launch import global_mesh
    mesh = global_mesh(inst_size=2)
    assert mesh.axis_names == ("data", "inst")
    assert mesh.devices.shape[1] == 2
