"""Lazy pair-SAM checkpoint: the binary pair table (with its packed
end-1 strand bit) fully determines the concordant pair SAM, so the
frontend can skip the text write and downstream consumers derive what
they need from the table.

Pins:
* ``pair_sam_from_tbl`` regenerates byte-identical SAM text (native
  eager writer and the Python oracle writer as ground truth);
* ``index_tbl_by_ref`` == ``index_sam_by_ref`` on the same run;
* the full pipeline (extra annotations ON, exercising the strand bit)
  produces byte-identical results lazy vs eager;
* the strand bit survives the pos1 == pos2 ambiguity that positions
  alone cannot resolve.
"""

import pathlib

import pytest

from defuse_tpu.align.frontend import (SingleAlignment, align_job,
                                       index_paired_fastq,
                                       pair_sam_from_tbl, write_pair_sam,
                                       write_pair_tbl)
from defuse_tpu.align.seedindex import SeedIndex
from defuse_tpu.annotate.gene_models import GeneModels
from defuse_tpu.cluster import native
from defuse_tpu.config import Config
from defuse_tpu.io.sam import read_decompressed

from synthdata import make_dataset, write_dataset, write_genome_fasta, \
    write_gtf, write_repeats


def _frontend_artifacts(tmp_path, write_sam, force_python=False):
    ds = make_dataset(seed=23, n_fusion_frags=60, n_background_frags=60)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    cdna = {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
            for g in ds.genes}
    cdna_index = SeedIndex(cdna)
    genome_index = SeedIndex(ds.genome)
    reads1, reads2, _names = index_paired_fastq(
        str(paths["fastq1"]), str(paths["fastq2"]), str(tmp_path / "rd"))
    out = tmp_path / ("py" if force_python else
                      ("eager" if write_sam else "lazy"))
    res = align_job(
        cdna_index=cdna_index, genome_index=genome_index,
        rrna_index=None, gene_models=GeneModels(str(gtf)),
        reads1=reads1, reads2=reads2, outdir=str(out),
        write_sam=write_sam, force_python=force_python)
    return res, tmp_path / "rd" / "reads"


@pytest.mark.skipif(not native.available(), reason="needs native lib")
def test_materializer_matches_eager_and_oracle(tmp_path):
    eager, _ = _frontend_artifacts(tmp_path / "a", write_sam=True)
    lazy, reads_prefix = _frontend_artifacts(tmp_path / "b",
                                             write_sam=False)
    oracle, _ = _frontend_artifacts(tmp_path / "c", write_sam=True,
                                    force_python=True)
    assert lazy["concordant_sam"] is None
    regen = pair_sam_from_tbl(lazy["pair_table"], reads_prefix,
                              tmp_path / "regen.pair.sam.gz")
    text = read_decompressed(regen)
    assert text
    assert text == read_decompressed(eager["concordant_sam"])
    assert text == read_decompressed(oracle["concordant_sam"])


@pytest.mark.skipif(not native.available(), reason="needs native lib")
def test_index_tbl_matches_index_sam(tmp_path):
    from defuse_tpu.annotate.extra import index_sam_by_ref, \
        index_tbl_by_ref
    from defuse_tpu.io.sam import open_text
    eager, _ = _frontend_artifacts(tmp_path, write_sam=True)
    with open_text(eager["concordant_sam"]) as fh:
        by_sam = index_sam_by_ref(fh)
    by_tbl = index_tbl_by_ref(eager["pair_table"])
    assert by_tbl == by_sam
    assert by_tbl, "empty index would prove nothing"
    assert any(s == "-" for rows in by_tbl.values()
               for (_q, s, _a, _b) in rows)


def test_strand_bit_resolves_pos_tie(tmp_path):
    """pos1 == pos2 with different read lengths: the flag bits (and
    downstream strand index) are unrecoverable from positions alone —
    the table's strand bit must round-trip them."""
    r1, r2 = "ACGTACGTAC", "TTGCATGCAT"  # lens 10
    fq1 = tmp_path / "a.1.fastq"
    fq2 = tmp_path / "a.2.fastq"
    fq1.write_text(f"@f/1\n{r1}\n+\n{'I' * len(r1)}\n")
    fq2.write_text(f"@f/2\n{r2}\n+\n{'I' * len(r2)}\n")
    reads1, reads2, _ = index_paired_fastq(str(fq1), str(fq2),
                                           str(tmp_path / "rd"))
    # end-1 REVERSE at the same start position as end-2 forward
    a1 = SingleAlignment("T1", 1, 5, 14, 0)
    a2 = SingleAlignment("T1", 0, 5, 14, 0)
    pairs = {0: (a1, a2, 10)}
    sam = tmp_path / "pair.sam"
    tbl = tmp_path / "pair.tbl"
    write_pair_sam(pairs, reads1, reads2, sam)
    write_pair_tbl(pairs, reads1, reads2, ["T1"], tbl)
    regen = pair_sam_from_tbl(tbl, tmp_path / "rd" / "reads",
                              tmp_path / "regen.sam")
    assert pathlib.Path(regen).read_text() == sam.read_text()
    # 0x1|0x2|0x10|0x40 = 83: end-1 carries the reverse bit
    assert "\t83\t" in sam.read_text()


@pytest.mark.skipif(not native.available(), reason="needs native lib")
def test_pipeline_lazy_vs_eager_identical(tmp_path):
    """Full align_reads -> run_pipeline with extra annotations ON:
    lazy and eager pair-SAM checkpoints produce byte-identical
    results / classified / filtered outputs."""
    from defuse_tpu.align.frontend import align_reads
    from defuse_tpu.pipeline.run import run_pipeline

    ds = make_dataset(seed=29, n_fusion_frags=80, n_background_frags=80)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp_path / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    repeats = tmp_path / "repeats.regions"
    write_repeats(ds, repeats)
    from defuse_tpu.io.fasta import write_fasta
    cdna_fa = tmp_path / "cdna.fa"
    write_fasta(str(cdna_fa),
                {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
                 for g in ds.genes})

    def run(tag, checkpoint):
        config = Config.defaults(
            reference_fasta=str(paths["reference"]),
            cdna_regions=str(paths["exons"]),
            genome_fasta=str(genome_fa), gene_models=str(gtf),
            cdna_fasta=str(cdna_fa), span_count_threshold=3,
            calculate_extra_annotations="yes",
            pair_sam_checkpoint=checkpoint)
        outdir = tmp_path / tag
        inputs = align_reads(config, str(outdir), str(paths["fastq1"]),
                             str(paths["fastq2"]), use_device=False)
        if checkpoint == "lazy":
            assert inputs["concordant_sam"] is None
        else:
            assert inputs["concordant_sam"]
        return run_pipeline(
            config=config, output_dir=str(outdir), library_name="x",
            gene_models_gtf=str(gtf), genome_fasta=str(genome_fa),
            repeats_regions=str(repeats),
            expression={g.name: "100" for g in ds.genes},
            use_device=False, **inputs)

    lazy = run("lazy", "lazy")
    eager = run("eager", "eager")
    for key in ("results", "classified", "filtered"):
        if lazy[key] is None or eager[key] is None:
            assert lazy[key] == eager[key]
            continue
        assert pathlib.Path(lazy[key]).read_bytes() == \
            pathlib.Path(eager[key]).read_bytes(), key
    assert pathlib.Path(lazy["results"]).stat().st_size > 0


def test_v1_table_compat(tmp_path):
    """Pre-strand-bit (v1, DPTBL1) tables still load, but
    strand-dependent consumers refuse them instead of silently decoding
    all-forward; merging any v1 part yields a v1 table."""
    from defuse_tpu.annotate.extra import index_tbl_by_ref
    from defuse_tpu.parallel.shard import (
        PAIR_TBL_MAGIC_V1, merge_pair_tables, pair_table_has_strand,
        read_pair_table)

    r1, r2 = "ACGTACGTAC", "TTGCATGCAT"
    fq1, fq2 = tmp_path / "a.1.fastq", tmp_path / "a.2.fastq"
    fq1.write_text(f"@f/1\n{r1}\n+\n{'I' * 10}\n")
    fq2.write_text(f"@f/2\n{r2}\n+\n{'I' * 10}\n")
    reads1, reads2, _ = index_paired_fastq(str(fq1), str(fq2),
                                           str(tmp_path / "rd"))
    a1 = SingleAlignment("T1", 1, 5, 14, 0)
    a2 = SingleAlignment("T1", 0, 7, 16, 0)
    tbl = tmp_path / "pair.tbl"
    write_pair_tbl({0: (a1, a2, 12)}, reads1, reads2, ["T1"], tbl)
    assert pair_table_has_strand(tbl)

    v1 = tmp_path / "pair.v1.tbl"
    data = bytearray(tbl.read_bytes())
    data[:8] = PAIR_TBL_MAGIC_V1
    # v1 files never carried the bit: clear it from the packed seq
    import numpy as np
    rec = np.frombuffer(bytes(data[-32:]), dtype="<i4").copy()
    rec[2] &= 0x7FFFFFFF
    data[-32:] = rec.tobytes()
    v1.write_bytes(bytes(data))
    assert not pair_table_has_strand(v1)
    names, recs = read_pair_table(v1)  # loads fine
    assert names == ["T1"] and len(recs) == 1

    with pytest.raises(ValueError):
        index_tbl_by_ref(v1)
    with pytest.raises(ValueError):
        pair_sam_from_tbl(v1, tmp_path / "rd" / "reads",
                          tmp_path / "x.sam")

    merged = tmp_path / "merged.tbl"
    merge_pair_tables([str(tbl), str(v1)], [0, 10], merged)
    assert not pair_table_has_strand(merged)


def test_cov_samples_lazy_and_materializable(tmp_path):
    """A native+table pipeline run is lazy about covariance samples: it
    emits only the fused cov.merged.tsv, and `export cov-samples`
    materializes the text artifacts on demand — gzipped, and
    bit-identical to what re-merging them yields vs the recorded
    merge."""
    from defuse_tpu.cluster import native
    if not native.available():
        pytest.skip("native library not built")
    from defuse_tpu.align.frontend import align_reads
    from defuse_tpu.io.fasta import write_fasta
    from defuse_tpu.pipeline.run import run_pipeline
    from synthdata import write_genome_fasta, write_gtf

    ds = make_dataset(seed=31, n_fusion_frags=60, n_background_frags=60)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp_path / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    cdna_fa = tmp_path / "cdna.fa"
    write_fasta(str(cdna_fa),
                {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
                 for g in ds.genes})
    config = Config.defaults(
        reference_fasta=str(paths["reference"]),
        cdna_regions=str(paths["exons"]),
        genome_fasta=str(genome_fa), gene_models=str(gtf),
        cdna_fasta=str(cdna_fa), span_count_threshold=3)
    outdir = tmp_path / "out"
    inputs = align_reads(config, str(outdir), str(paths["fastq1"]),
                         str(paths["fastq2"]), use_device=False)
    run_pipeline(config=config, output_dir=str(outdir),
                 library_name="gz", gene_models_gtf=str(gtf),
                 genome_fasta=str(genome_fa), use_device=False, **inputs)
    # lazy: the stage emitted only the fused merge result
    assert (outdir / "cov.merged.tsv").exists()
    assert not (outdir / "cov.span.samples.gz").exists()

    # materialize on demand via the CLI and cross-check: gzipped bytes,
    # and re-merging the materialized files reproduces the recorded
    # merged covariances bit for bit
    cfg_path = tmp_path / "config.txt"
    cfg_path.write_text(
        f"reference_fasta = {paths['reference']}\n"
        f"cdna_regions = {paths['exons']}\n"
        f"genome_fasta = {genome_fa}\n"
        f"gene_models = {gtf}\n"
        f"cdna_fasta = {cdna_fa}\n"
        "span_count_threshold = 3\n")
    from defuse_tpu.cli.main import main as cli_main
    mat = tmp_path / "mat"
    rc = cli_main(["export", "cov-samples", "-i", str(outdir),
                   "-o", str(mat), "-c", str(cfg_path)])
    assert rc == 0
    p = mat / "cov.span.samples.gz"
    assert p.exists()
    assert p.read_bytes()[:2] == b"\x1f\x8b", \
        "cov samples artifact is not gzipped"
    merged_rec = {}
    for line in (outdir / "cov.merged.tsv").read_text().splitlines():
        f = line.split("\t")
        if len(f) == 3:
            merged_rec[f[0]] = (float.fromhex(f[1]), float.fromhex(f[2]))
        else:
            merged_rec[f[0]] = None
    for kind in ("span", "pos", "min"):
        try:
            got = native.cov_merge_file(mat / f"cov.{kind}.samples.gz")
        except ValueError:
            got = None
        assert got == merged_rec[kind], kind
