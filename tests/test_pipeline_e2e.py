"""End-to-end pipeline test: prealigned synthetic inputs ->
results.filtered.tsv with a classified true fusion."""

from defuse_tpu.config import Config
from defuse_tpu.pipeline.run import run_pipeline

from synthdata import make_dataset, write_dataset, write_genome_fasta, \
    write_gtf, write_repeats
from test_stats_filters import _make_concordant_sam


def test_run_pipeline_e2e(tmp_path):
    ds = make_dataset(seed=63)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp_path / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    repeats = tmp_path / "repeats.regions"
    write_repeats(ds, repeats)
    concordant = tmp_path / "concordant.sam"
    _make_concordant_sam(ds, concordant, n_pairs=3000)

    config = Config.defaults(
        reference_fasta=str(paths["reference"]),
        cdna_regions=str(paths["exons"]),
        span_count_threshold=3,
    )

    outs = run_pipeline(
        config=config, output_dir=str(tmp_path / "out"),
        library_name="e2e",
        spanning=str(paths["spanning"]), improper=str(paths["improper"]),
        fastq1=str(paths["fastq1"]), fastq2=str(paths["fastq2"]),
        concordant_sam=str(concordant),
        gene_models_gtf=str(gtf), genome_fasta=str(genome_fa),
        repeats_regions=str(repeats),
        expression={g.name: "100" for g in ds.genes},
        use_device=False)

    results = open(outs["results"]).read().splitlines()
    assert len(results) >= 2, "no fusions in results.tsv"
    header = results[0].split("\t")
    for col in ("cluster_id", "splitr_sequence", "splitr_count",
                "splitr_span_pvalue", "splitr_pos_pvalue",
                "splitr_min_pvalue", "gene1", "gene2", "span_count",
                "splice_score", "break_adj_entropy_min",
                "genome_breakseqs_percident", "orf", "adjacent",
                "interchromosomal", "num_splice_variants",
                "max_repeat_proportion", "mean_map_count"):
        assert col in header, f"missing results column {col}"

    classified = open(outs["classified"]).read().splitlines()
    assert "probability" in classified[0].split("\t")
    # the fusion joins GA (chr1) and GB (chr2): interchromosomal
    hidx = classified[0].split("\t").index("interchromosomal")
    g1 = classified[0].split("\t").index("gene1")
    found = [r.split("\t") for r in classified[1:]]
    assert any(r[hidx] == "Y" for r in found)
    assert any(r[g1] in ("GA", "GB") for r in found)

    # resume: rerunning skips the read-stats stage (up-to-date runner)
    outs2 = run_pipeline(
        config=config, output_dir=str(tmp_path / "out"),
        library_name="e2e",
        spanning=str(paths["spanning"]), improper=str(paths["improper"]),
        fastq1=str(paths["fastq1"]), fastq2=str(paths["fastq2"]),
        concordant_sam=str(concordant),
        gene_models_gtf=str(gtf), genome_fasta=str(genome_fa),
        repeats_regions=str(repeats),
        expression={g.name: "100" for g in ds.genes},
        use_device=False)
    assert open(outs2["results"]).read() == "\n".join(results) + "\n"


def test_run_pipeline_denovo_stage(tmp_path):
    """denovo_assembly=yes produces per-cluster assemblies that span the
    breakpoint, without touching the results.tsv schema."""
    ds = make_dataset(seed=63)
    paths = write_dataset(ds, tmp_path)
    concordant = tmp_path / "concordant.sam"
    _make_concordant_sam(ds, concordant, n_pairs=500)

    config = Config.defaults(
        reference_fasta=str(paths["reference"]),
        cdna_regions=str(paths["exons"]),
        span_count_threshold=3,
        denovo_assembly="yes",
    )

    outs = run_pipeline(
        config=config, output_dir=str(tmp_path / "out"),
        library_name="denovo",
        spanning=str(paths["spanning"]), improper=str(paths["improper"]),
        fastq1=str(paths["fastq1"]), fastq2=str(paths["fastq2"]),
        concordant_sam=str(concordant),
        use_device=False)

    assert "denovo_seq" in outs
    rows = [l.split("\t") for l in open(outs["denovo_seq"])]
    assert rows, "no denovo assemblies"
    # the true fusion junction sequence must appear in an assembly
    _ta, break_a, _tb, _bb = ds.fusion
    junction = ds.fusion_seq[break_a - 20:break_a + 20]
    assert any(junction in r[1] or junction in _rc(r[1]) for r in rows), \
        "no assembly spans the breakpoint junction"
    predict = dict(l.split("\t") for l in
                   open(outs["denovo_predict"]).read().splitlines())
    assert set(predict.values()) <= {"splitr", "denovo"}


def _rc(seq):
    from defuse_tpu.core.types import revcomp
    return revcomp(seq)
