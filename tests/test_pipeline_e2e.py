"""End-to-end pipeline test: prealigned synthetic inputs ->
results.filtered.tsv with a classified true fusion."""

import os

import pytest

from defuse_tpu.config import Config
from defuse_tpu.pipeline.run import _notify_completion, run_pipeline

from synthdata import make_dataset, write_dataset, write_genome_fasta, \
    write_gtf, write_repeats
from test_stats_filters import _make_concordant_sam


def test_completion_notification(tmp_path, monkeypatch):
    """mailto config fires the defuse_run.pl:188-216 notification on
    both failure (pipeline raises) and success."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    log = tmp_path / "mail.log"
    mail = bin_dir / "mail"
    mail.write_text(f'#!/bin/sh\necho "$@" >> {log}\ncat >> {log}\n')
    mail.chmod(0o755)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")

    config = Config.defaults(mailto="dev@example.com")
    with pytest.raises(Exception):
        run_pipeline(config=config, output_dir=str(tmp_path / "out"),
                     library_name="notif",
                     spanning=str(tmp_path / "missing.spanning"),
                     improper=str(tmp_path / "missing.sam"),
                     fastq1=str(tmp_path / "missing.1.fq"),
                     fastq2=str(tmp_path / "missing.2.fq"),
                     use_device=False)
    text = log.read_text()
    assert "status failure" in text and "dev@example.com" in text

    _notify_completion(config, "notif", "success")
    assert "status success" in log.read_text()


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
    breakpoint and surfaces the documented break_predict / denovo_*
    columns (README.md:276-287) in results.tsv."""
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

    # documented denovo columns surface in results.tsv
    results = open(outs["results"]).read().splitlines()
    header = results[0].split("\t")
    for col in ("break_predict", "denovo_sequence", "denovo_min_count",
                "denovo_span_pvalue"):
        assert col in header, f"missing denovo column {col}"
    bp_idx = header.index("break_predict")
    seq_idx = header.index("denovo_sequence")
    mc_idx = header.index("denovo_min_count")
    got_rows = [r.split("\t") for r in results[1:]]
    assert all(r[bp_idx] in ("splitr", "denovo") for r in got_rows)
    # at least one assembled cluster carries its sequence + min count
    assembled = [r for r in got_rows if r[seq_idx]]
    assert assembled, "no denovo_sequence surfaced in results.tsv"
    assert all(int(r[mc_idx]) >= 1 for r in assembled)


def test_denovo_annotation_rows_arbitration():
    """denovo-wins and splitr-wins rows per select_breakpoint_seq.pl:
    the winning source is recorded in break_predict; assembly payloads
    surface regardless of the winner; clusters without a junction-
    locatable assembly keep splitr with empty denovo fields."""
    from defuse_tpu.pipeline.denovo_arbitration import arbitrate
    from defuse_tpu.pipeline.denovo_stage import denovo_annotation_rows

    assemblies = {1: ("ACGT" * 30, 8, 5), 2: ("TTGG" * 30, 6, 3)}
    dn_pval = {1: (0.9, 8), 2: (0.01, 6)}  # 1: denovo wins, 2: splitr
    splitr_pval = {1: 0.2, 2: 0.5, 3: 0.7}
    verdict = arbitrate(splitr_pval, {c: p for c, (p, _n) in
                                      dn_pval.items()})
    assert verdict == {1: "denovo", 2: "splitr", 3: "splitr"}
    rows = denovo_annotation_rows([1, 2, 3], assemblies, dn_pval, verdict)
    assert rows[1]["break_predict"] == "denovo"
    assert rows[1]["denovo_sequence"] == "ACGT" * 30
    assert rows[1]["denovo_min_count"] == "5"
    assert rows[1]["denovo_span_pvalue"].startswith("0.9")
    assert rows[2]["break_predict"] == "splitr"
    assert rows[2]["denovo_sequence"] == "TTGG" * 30
    assert rows[3] == {"break_predict": "splitr", "denovo_sequence": "",
                       "denovo_min_count": "", "denovo_span_pvalue": ""}


def _rc(seq):
    from defuse_tpu.core.types import revcomp
    return revcomp(seq)
