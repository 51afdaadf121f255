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


def test_native_globalize_byte_parity(tmp_path):
    """dt_globalize_ids == the Python globalize loop, byte for byte
    (decompressed content for .gz), across all three qname styles."""
    import gzip

    from defuse_tpu.cluster import native
    from defuse_tpu.io.sam import open_text
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    def py_globalize(src, dst, offset, qname_style):
        ctx = (gzip.open(dst, "at", compresslevel=1)
               if str(dst).endswith(".gz") else open(dst, "a"))
        with open_text(src) as fin, ctx as fout:
            for line in fin:
                f = line.split("\t")
                if qname_style == "frag/end":
                    frag, end = f[0].split("/")
                    f[0] = f"{int(frag) + offset}/{end}"
                else:
                    f[0] = str(int(f[0]) + offset)
                fout.write("\t".join(f))

    span = tmp_path / "spanning.compact"
    span.write_text("0\tchr1\t+\t10\t60\tACGT\n7\tchr2\t-\t5\t55\tGGCC\n")
    improper = tmp_path / "improper.sam"
    improper.write_text("3/1\t16\tchr1\t100\t255\t50M\t*\t0\t0\tA\tI\n"
                        "3/2\t0\tchr1\t400\t255\t50M\t*\t0\t0\tC\tI\n")
    sam_gz = tmp_path / "cdna.sam.gz"
    with gzip.open(sam_gz, "wt", compresslevel=1) as f:
        f.write("12\t99\tENST1\t55\t255\t50M\t=\t155\t150\tA\tI\n")

    cases = [(span, "frag", "a"), (improper, "frag/end", "b"),
             (sam_gz, "sam", "c.gz"), (span, "frag", "d.gz")]
    for src, style, suffix in cases:
        for offset in (0, 1000, 2 ** 33):
            pdst = tmp_path / f"py_{offset}_{suffix}"
            ndst = tmp_path / f"nat_{offset}_{suffix}"
            py_globalize(src, pdst, offset, style)
            n = native.globalize_ids(src, ndst, offset, style)
            assert n is not None and n > 0
            with open_text(pdst) as f:
                want = f.read()
            with open_text(ndst) as f:
                got = f.read()
            assert got == want, (style, offset, suffix)

    # appending a second shard extends, never truncates (gz: two members)
    dst = tmp_path / "merged.compact.gz"
    assert native.globalize_ids(span, dst, 0, "frag")
    assert native.globalize_ids(span, dst, 100, "frag")
    with open_text(dst) as f:
        lines = f.read().splitlines()
    assert len(lines) == 4 and lines[2].split("\t")[0] == "100"

    # malformed leading id -> None, nothing appended
    bad = tmp_path / "bad.compact"
    bad.write_text("notanint\tchr1\n")
    out = tmp_path / "bad.out"
    assert native.globalize_ids(bad, out, 5, "frag") is None
    assert out.read_text() == ""
