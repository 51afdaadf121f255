"""Full-pipeline shard identity: running the aligner frontend
data-parallel over N fastq shards and merging (the reference's
per-shard alignjob + merge contracts, ``defuse_run.pl:315-400``,
``merge_read_stats.pl``) must produce byte-identical final results to
the unsharded run.
"""

import pathlib

import pytest

from defuse_tpu.align.frontend import align_job, index_paired_fastq
from defuse_tpu.align.seedindex import SeedIndex
from defuse_tpu.annotate.gene_models import GeneModels
from defuse_tpu.config import Config
from defuse_tpu.parallel.shard import split_fastq
from defuse_tpu.pipeline.run import run_pipeline
from defuse_tpu.stats.readstats import merge_read_stats

from synthdata import make_dataset, write_dataset, write_genome_fasta, \
    write_gtf, write_repeats


def _reads_of(path):
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


def _globalize(src, dst, offset, qname_style):
    """Rewrite shard-local fragment ids to global ids.

    qname_style: 'frag' (spanning first column), 'frag/end' (improper
    SAM qname), 'sam' (pair SAM qname = frag).
    """
    import gzip

    from defuse_tpu.io.sam import open_text
    fout_ctx = gzip.open(dst, "at", compresslevel=1) \
        if str(dst).endswith(".gz") else open(dst, "a")
    with open_text(src) as fin, fout_ctx as fout:
        for line in fin:
            f = line.split("\t")
            if qname_style == "frag/end":
                frag, end = f[0].split("/")
                f[0] = f"{int(frag) + offset}/{end}"
            else:
                f[0] = str(int(f[0]) + offset)
            fout.write("\t".join(f))


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_pipeline_byte_identity(tmp_path, n_shards):
    ds = make_dataset(seed=31, n_fusion_frags=140, n_background_frags=100)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp_path / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    repeats = tmp_path / "repeats.regions"
    write_repeats(ds, repeats)

    reads1, reads2, _ = index_paired_fastq(
        str(paths["fastq1"]), str(paths["fastq2"]),
        str(tmp_path / "reads"))
    gm = GeneModels(str(gtf))
    cdna_index = SeedIndex(
        {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
         for g in ds.genes})
    genome_index = SeedIndex(ds.genome)

    def frontend(r1, r2, outdir):
        return align_job(cdna_index=cdna_index, genome_index=genome_index,
                         rrna_index=None, gene_models=gm, reads1=r1,
                         reads2=r2, outdir=str(outdir))

    # --- unsharded ------------------------------------------------------
    whole = frontend(reads1, reads2, tmp_path / "whole")

    # --- sharded frontend + merge --------------------------------------
    per_shard = (len(reads1) + n_shards - 1) // n_shards
    prefixes = split_fastq(str(tmp_path / "reads" / "reads.1.fastq"),
                           str(tmp_path / "reads" / "reads.2.fastq"),
                           str(tmp_path / "shards"),
                           reads_per_job=per_shard)
    assert len(prefixes) == n_shards
    merged_dir = tmp_path / "merged"
    merged_dir.mkdir()
    merged = {k: merged_dir / n for k, n in
              (("spanning", "spanning.compact"),
               ("improper", "improper.sam"),
               ("concordant_sam", "cdna.pair.sam.gz"))}
    stats_parts = []
    tbl_parts, tbl_offsets = [], []
    for i, prefix in enumerate(prefixes):
        res = frontend(_reads_of(f"{prefix}.1.fastq"),
                       _reads_of(f"{prefix}.2.fastq"),
                       tmp_path / f"shard{i}")
        offset = i * per_shard
        _globalize(res["spanning"], merged["spanning"], offset, "frag")
        _globalize(res["improper"], merged["improper"], offset,
                   "frag/end")
        _globalize(res["concordant_sam"], merged["concordant_sam"],
                   offset, "sam")
        stats_parts.append(res["stats"])
        tbl_parts.append(res["pair_table"])
        tbl_offsets.append(offset)

    from defuse_tpu.parallel.shard import merge_pair_tables
    merged["pair_table"] = merged_dir / "cdna.pair.tbl"
    merge_pair_tables(tbl_parts, tbl_offsets, merged["pair_table"])
    assert merged["pair_table"].read_bytes() == \
        pathlib.Path(whole["pair_table"]).read_bytes()

    # frontend artifacts merge to the unsharded (decompressed) bytes
    from defuse_tpu.io.sam import read_decompressed
    for key in ("spanning", "improper", "concordant_sam"):
        assert read_decompressed(merged[key]) == \
            read_decompressed(whole[key]), key
    ms = merge_read_stats(stats_parts)
    assert ms.frag_count == whole["stats"].frag_count
    assert abs(ms.fraglength_mean - whole["stats"].fraglength_mean) < 1e-9

    # --- full pipeline on both -----------------------------------------
    config = Config.defaults(
        reference_fasta=str(paths["reference"]),
        cdna_regions=str(paths["exons"]),
        span_count_threshold=3,
    )
    expression = {g.name: "50" for g in ds.genes}
    # per-part tables with globalized ids: the distributed tail's list
    # form (read-stats sums and covariance parts merge in rank order
    # instead of scanning a concatenation)
    rebased_parts = []
    for part, off in zip(tbl_parts, tbl_offsets):
        dst = merged_dir / f"rebased.{off}.tbl"
        merge_pair_tables([part], [off], dst)
        rebased_parts.append(str(dst))
    parts_inputs = {k: str(v) for k, v in merged.items()}
    parts_inputs["pair_table"] = rebased_parts
    parts_inputs["concordant_sam"] = None  # force the table-parts path
    outs = {}
    for name, inputs in (("whole", whole),
                         ("sharded", {k: str(v) for k, v in
                                      merged.items()}),
                         ("parts", parts_inputs)):
        outs[name] = run_pipeline(
            config=config, output_dir=str(tmp_path / f"out_{name}"),
            library_name="shard-identity",
            spanning=inputs["spanning"], improper=inputs["improper"],
            fastq1=str(tmp_path / "reads" / "reads.1.fastq"),
            fastq2=str(tmp_path / "reads" / "reads.2.fastq"),
            concordant_sam=inputs["concordant_sam"],
            pair_table=inputs.get("pair_table"),
            gene_models_gtf=str(gtf), genome_fasta=str(genome_fa),
            repeats_regions=str(repeats), expression=expression,
            use_device=False)

    for artifact in ("results", "classified", "filtered"):
        a = pathlib.Path(outs["whole"][artifact]).read_bytes()
        b = pathlib.Path(outs["sharded"][artifact]).read_bytes()
        c = pathlib.Path(outs["parts"][artifact]).read_bytes()
        assert a == b, f"{artifact} differs between 1- and {n_shards}-shard"
        assert a == c, f"{artifact} differs for the part-table list form"
    # the run found real fusions (non-trivial identity)
    assert len(pathlib.Path(
        outs["whole"]["results"]).read_text().splitlines()) > 1


def test_pair_table_fast_path_equivalence(tmp_path):
    """run_pipeline with the binary pair table (native tbl scanners +
    cov merge) and without it (SAM text paths) produces byte-identical
    results — the fast path cannot drift from the checkpoint
    contract."""
    ds = make_dataset(seed=47, n_fusion_frags=120, n_background_frags=90)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp_path / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    repeats = tmp_path / "repeats.regions"
    write_repeats(ds, repeats)
    reads1, reads2, _ = index_paired_fastq(
        str(paths["fastq1"]), str(paths["fastq2"]),
        str(tmp_path / "reads"))
    gm = GeneModels(str(gtf))
    cdna_index = SeedIndex(
        {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
         for g in ds.genes})
    genome_index = SeedIndex(ds.genome)
    res = align_job(cdna_index=cdna_index, genome_index=genome_index,
                    rrna_index=None, gene_models=gm, reads1=reads1,
                    reads2=reads2, outdir=str(tmp_path / "aligned"))
    config = Config.defaults(
        reference_fasta=str(paths["reference"]),
        cdna_regions=str(paths["exons"]),
        span_count_threshold=3,
    )
    expression = {g.name: "50" for g in ds.genes}
    outs = {}
    for name, tbl in (("tbl", res["pair_table"]), ("sam", None)):
        outs[name] = run_pipeline(
            config=config, output_dir=str(tmp_path / f"out_{name}"),
            library_name="tbl-equiv",
            spanning=res["spanning"], improper=res["improper"],
            fastq1=str(tmp_path / "reads" / "reads.1.fastq"),
            fastq2=str(tmp_path / "reads" / "reads.2.fastq"),
            concordant_sam=res["concordant_sam"], pair_table=tbl,
            gene_models_gtf=str(gtf), genome_fasta=str(genome_fa),
            repeats_regions=str(repeats), expression=expression,
            use_device=False)
    for artifact in ("results", "classified", "filtered"):
        assert pathlib.Path(outs["tbl"][artifact]).read_bytes() == \
            pathlib.Path(outs["sam"][artifact]).read_bytes(), artifact
    # intermediate stage artifacts identical too (the tbl path gzips
    # the covariance samples — compare decompressed content)
    from defuse_tpu.io.sam import read_decompressed

    def _inter(name, inter):
        p = tmp_path / name / inter
        if not p.exists():
            p = tmp_path / name / (inter + ".gz")
        return read_decompressed(p)

    assert _inter("out_tbl", "concordant.read.stats") == \
        _inter("out_sam", "concordant.read.stats")
    # the tbl path is lazy about covariance samples (only the fused
    # cov.merged.tsv is emitted) — the merged covariances must match
    # the sam path's bit for bit, and materializing the samples on
    # demand must reproduce the sam path's files
    assert (tmp_path / "out_tbl" / "cov.merged.tsv").read_bytes() == \
        (tmp_path / "out_sam" / "cov.merged.tsv").read_bytes()
    from defuse_tpu.pipeline.run import materialize_cov_samples
    mat = materialize_cov_samples(config, tmp_path / "aligned",
                                  tmp_path / "mat_cov")
    from defuse_tpu.io.sam import read_decompressed as _rd
    for kind in ("span", "pos", "min"):
        assert _rd(mat[kind]) == \
            _inter("out_sam", f"cov.{kind}.samples"), kind
    assert len(pathlib.Path(
        outs["tbl"]["results"]).read_text().splitlines()) > 1


def test_align_reads_reads_per_job_sharding(tmp_path):
    """align_reads honors reads_per_job: the sharded frontend merge is
    byte-identical to an unsharded run."""
    from defuse_tpu.align.frontend import align_reads

    ds = make_dataset(seed=19, n_fusion_frags=80, n_background_frags=80)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp_path / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    from defuse_tpu.io.fasta import write_fasta
    cdna_fa = tmp_path / "cdna.fa"
    write_fasta(str(cdna_fa),
                {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
                 for g in ds.genes})

    def run(outdir, rpj, checkpoint):
        config = Config.defaults(
            genome_fasta=str(genome_fa), gene_models=str(gtf),
            cdna_fasta=str(cdna_fa), reads_per_job=rpj,
            pair_sam_checkpoint=checkpoint)
        return align_reads(config, str(tmp_path / outdir),
                           str(paths["fastq1"]), str(paths["fastq2"]),
                           use_device=False)

    whole = run("whole", 10_000_000, "eager")
    sharded = run("sharded", 40, "lazy")  # forces several shards
    for key in ("spanning", "improper"):
        assert pathlib.Path(sharded[key]).read_bytes() == \
            pathlib.Path(whole[key]).read_bytes(), key
    assert pathlib.Path(sharded["spanning"]).stat().st_size > 0

    # pair SAM: the lazy sharded run writes none up front; the SAM
    # regenerated from its (multi-segment) pair table must match the
    # unsharded eager writer's text exactly
    from defuse_tpu.io.sam import read_decompressed
    assert sharded["concordant_sam"] is None
    from defuse_tpu.align.frontend import pair_sam_from_tbl
    lazy_sam = pair_sam_from_tbl(
        sharded["pair_table"], tmp_path / "sharded" / "reads" / "reads",
        tmp_path / "lazy.pair.sam.gz")
    assert read_decompressed(lazy_sam) == \
        read_decompressed(whole["concordant_sam"])
    assert read_decompressed(whole["concordant_sam"])

    # pair table: shards append one segment each — logical content
    # identical via both the Python and the native segment readers
    from defuse_tpu.cluster import native
    from defuse_tpu.parallel.shard import read_pair_table
    names_s, recs_s = read_pair_table(sharded["pair_table"])
    names_w, recs_w = read_pair_table(whole["pair_table"])
    assert names_s == names_w
    assert len(recs_w) > 0
    assert (recs_s == recs_w).all()
    if native.available():
        st_s = native.read_stats_tbl(sharded["pair_table"])
        st_w = native.read_stats_tbl(whole["pair_table"])
        assert st_s is not None and st_s == st_w


@pytest.mark.parametrize("force_python", [False, True])
def test_frag_base_global_ids(tmp_path, force_python):
    """align_job(frag_base=k) writes globally-offset fragment ids in
    every artifact, byte-identical (after decompression) to rewriting a
    frag_base=0 run with +k — on both the native and oracle paths — so
    merge_frontend_shards(ids_global=True) can raw-append shard files."""
    from defuse_tpu.cluster import native
    from defuse_tpu.io.sam import read_decompressed
    from defuse_tpu.parallel.shard import read_pair_table

    if force_python is False and not native.available():
        pytest.skip("native library unavailable")

    ds = make_dataset(seed=47, n_fusion_frags=60, n_background_frags=60)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    reads1, reads2, _ = index_paired_fastq(
        str(paths["fastq1"]), str(paths["fastq2"]),
        str(tmp_path / "reads"))
    gm = GeneModels(str(gtf))
    cdna_index = SeedIndex(
        {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
         for g in ds.genes})
    genome_index = SeedIndex(ds.genome)

    def run(outdir, base):
        return align_job(cdna_index=cdna_index, genome_index=genome_index,
                         rrna_index=None, gene_models=gm, reads1=reads1,
                         reads2=reads2, outdir=str(tmp_path / outdir),
                         frag_base=base, force_python=force_python)

    BASE = 1_000_000
    local = run("local", 0)
    shifted = run("shifted", BASE)

    # local sets are base-independent
    assert local["concordant_fragments"] == shifted["concordant_fragments"]
    assert local["blacklist"] == shifted["blacklist"]

    for key, style in (("spanning", "frag"), ("improper", "frag/end"),
                       ("concordant_sam", "sam")):
        rewritten = tmp_path / f"rewritten.{key}"
        _globalize(local[key], rewritten, BASE, style)
        assert read_decompressed(shifted[key]) == \
            read_decompressed(rewritten), key
        assert read_decompressed(shifted[key]) != \
            read_decompressed(local[key]) or \
            not read_decompressed(local[key]), key

    names_l, recs_l = read_pair_table(local["pair_table"])
    names_s, recs_s = read_pair_table(shifted["pair_table"])
    assert names_l == names_s
    assert len(recs_s) > 0
    assert (recs_s["frag"] == recs_l["frag"] + BASE).all()
