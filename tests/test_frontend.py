"""Aligner frontend end-to-end: from raw fastqs to a discovered fusion,
with no truth alignments provided."""

from defuse_tpu.align.frontend import align_job, index_paired_fastq
from defuse_tpu.align.seedindex import SeedIndex
from defuse_tpu.annotate.gene_models import GeneModels
from defuse_tpu.config import Config
from defuse_tpu.pipeline.run import run_pipeline

from synthdata import make_dataset, write_dataset, write_genome_fasta, \
    write_gtf, write_repeats


def test_frontend_to_fusion(tmp_path):
    ds = make_dataset(seed=77, n_fusion_frags=150, n_background_frags=80)
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
    gene_models = GeneModels(str(gtf))
    cdna_seqs = {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
                 for g in ds.genes}
    cdna_index = SeedIndex(cdna_seqs)
    genome_index = SeedIndex(ds.genome)

    res = align_job(
        cdna_index=cdna_index, genome_index=genome_index, rrna_index=None,
        gene_models=gene_models, reads1=reads1, reads2=reads2,
        outdir=str(tmp_path / "aligned"))

    # read stats recovered from the aligner's own proper pairs
    assert res["stats"].frag_count > 50
    assert abs(res["stats"].fraglength_mean - 200.0) < 15.0
    assert res["stats"].readlength_min == 50

    # background fragments screened as concordant
    n_background = 80
    assert len(res["concordant_fragments"]) > 0.8 * n_background

    spanning_rows = open(res["spanning"]).read().splitlines()
    assert len(spanning_rows) > 100, "aligner found too few spanning rows"

    config = Config.defaults(
        reference_fasta=str(paths["reference"]),
        cdna_regions=str(paths["exons"]),
        span_count_threshold=3,
    )
    outs = run_pipeline(
        config=config, output_dir=str(tmp_path / "out"),
        library_name="frontend-e2e",
        spanning=res["spanning"], improper=res["improper"],
        fastq1=str(tmp_path / "reads" / "reads.1.fastq"),
        fastq2=str(tmp_path / "reads" / "reads.2.fastq"),
        concordant_sam=res["concordant_sam"],
        gene_models_gtf=str(gtf), genome_fasta=str(genome_fa),
        repeats_regions=str(repeats),
        expression={g.name: "50" for g in ds.genes},
        use_device=False)

    classified = open(outs["classified"]).read().splitlines()
    header = classified[0].split("\t")
    g1 = header.index("gene1")
    g2 = header.index("gene2")
    rows = [r.split("\t") for r in classified[1:]]
    assert any({r[g1], r[g2]} == {"GA", "GB"} for r in rows), \
        "GA-GB fusion not recovered from raw fastqs"
