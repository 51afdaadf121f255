"""create-ref dataset builder + the full CLI-shaped loop:
create-ref -> align from fastqs -> pipeline -> classified fusion."""

from defuse_tpu.config import Config
from defuse_tpu.core.exons import ExonRegions
from defuse_tpu.io.fasta import FastaStore
from defuse_tpu.pipeline.create_ref import create_reference

from synthdata import make_dataset, write_dataset, write_genome_fasta, \
    write_gtf, write_repeats


def _setup(tmp_path, ds):
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp_path / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    config = Config.defaults(
        genome_fasta=str(genome_fa), gene_models=str(gtf),
        gene_biotypes="synth", chromosomes="1,2",
        span_count_threshold=3)
    return paths, gtf, genome_fa, config


def test_create_reference(tmp_path):
    ds = make_dataset(seed=7)
    paths, gtf, genome_fa, config = _setup(tmp_path, ds)
    outs = create_reference(config, str(tmp_path / "dataset"))

    cdna = FastaStore.from_file(outs["cdna_fasta"])
    for gene in ds.genes:
        tid = f"{gene.name}|{gene.transcript}"
        assert tid in cdna
        assert cdna.sequence(tid) == gene.cdna(ds.genome) + "A" * 50

    er = ExonRegions.from_file(outs["cdna_regions"])
    for gene in ds.genes:
        assert er.is_transcript(gene.transcript)
        assert er.transcript_length(gene.transcript) == \
            sum(e - s + 1 for s, e in gene.exons)

    ref = FastaStore.from_file(outs["reference_fasta"])
    assert "1" in ref and "2" in ref and "GA|TA" in ref

    exons = FastaStore.from_file(outs["exons_fasta"])
    ga = ds.genes[0]
    s, e = ga.exons[1]
    assert exons.sequence("GA|TA|1") == ds.genome["1"][s - 1:e]

    # CDS spliced from interior exons (write_gtf convention)
    cds = FastaStore.from_file(outs["cds_fasta"])
    assert "GA|TA" in cds


def test_create_ref_then_full_run(tmp_path):
    """The complete user loop: dataset build, aligner frontend from raw
    fastqs against the built dataset, discovery pipeline, classifier."""
    ds = make_dataset(seed=91, n_fusion_frags=150)
    paths, gtf, genome_fa, config = _setup(tmp_path, ds)
    write_repeats(ds, tmp_path / "repeats.regions")
    dataset_outs = create_reference(config, str(tmp_path / "dataset"))

    config2 = Config.defaults(
        genome_fasta=str(genome_fa), gene_models=str(gtf),
        repeats_regions=str(tmp_path / "repeats.regions"),
        span_count_threshold=3, **dataset_outs)

    from defuse_tpu.align.frontend import align_reads
    from defuse_tpu.pipeline.run import run_pipeline
    aligned = align_reads(config2, str(tmp_path / "out"),
                          str(paths["fastq1"]), str(paths["fastq2"]))
    outs = run_pipeline(
        config=config2, output_dir=str(tmp_path / "out"),
        library_name="cli-e2e", use_device=False,
        gene_models_gtf=str(gtf), genome_fasta=str(genome_fa),
        repeats_regions=str(tmp_path / "repeats.regions"),
        **aligned)

    classified = open(outs["classified"]).read().splitlines()
    header = classified[0].split("\t")
    g1 = header.index("gene1")
    g2 = header.index("gene2")
    rows = [r.split("\t") for r in classified[1:]]
    assert any({r[g1], r[g2]} == {"GA", "GB"} for r in rows), \
        "GA-GB fusion not recovered through the full create-ref loop"
