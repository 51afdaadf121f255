#!/usr/bin/env python
"""Simulated-real validation (BASELINE config 2 shape; VERDICT r1 item 3).

Chromosome-scale synthetic tumour RNA-Seq: multi-megabase two-chromosome
genome, a few hundred multi-exon genes on both strands, 30 fusion
events, ~1M read pairs with per-base sequencing errors, plus genomic
(DNA) background pairs.  Runs the full frontend+pipeline, then reports
fusion recall, precision at the default probability threshold, and the
fastq->results end-to-end throughput.

Usage: python scripts_dev/sim_validation.py [n_background_pairs] [--small]
Writes SIM_VALIDATION_r2.md at the repo root when run at full scale.
"""

import json
import os
import pathlib
import random
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

N_GENES = 240
N_FUSIONS = 30
FRAGS_PER_FUSION = 220
CHROM_MB = 14
ERROR_RATE = 0.005


def generate(rng, n_background, chrom_mb=CHROM_MB, n_genes=N_GENES,
             n_fusions=N_FUSIONS, frags_per_fusion=FRAGS_PER_FUSION,
             error_rate=ERROR_RATE, fusion_pairs=None, genome=None,
             genes=None):
    """fusion_pairs: optional list of (gene_index_a, gene_index_b) to
    pin WHICH genes fuse (cohort recurrence engineering); genome/genes
    may be passed in so several libraries share one reference."""
    from defuse_tpu.core.types import revcomp
    from synthdata import Gene, random_seq

    chrom_len = int(chrom_mb * 1_000_000)
    if genome is None:
        genome = {"1": random_seq(rng, chrom_len),
                  "2": random_seq(rng, chrom_len)}
    if genes is None:
        genes = []
        pos = {"1": 60_000, "2": 60_000}
        for gi in range(n_genes):
            chrom = "1" if gi % 2 == 0 else "2"
            strand = rng.randint(0, 1)
            exons = []
            p = pos[chrom]
            for _ in range(rng.randint(4, 7)):
                length = rng.randint(350, 900)
                exons.append((p, p + length - 1))
                p += length + rng.randint(900, 5000)
            pos[chrom] = p + rng.randint(20_000, 80_000)
            genes.append(Gene(f"G{gi}", f"T{gi}", chrom, strand, exons))
    n_genes = len(genes)

    # per-base sequencing errors (binomial via two bernoulli draws)
    p1 = 1.0 - (1.0 - error_rate) ** 50

    def noisy(read):
        if rng.random() >= p1:
            return read
        r = list(read)
        n_err = 1 + (rng.random() < p1 / 2)
        for _ in range(n_err):
            q = rng.randrange(len(r))
            r[q] = rng.choice([c for c in "ACGT" if c != r[q]])
        return "".join(r)

    reads1, reads2 = [], []
    truth = set()
    if fusion_pairs is not None:
        pair_iter = [(genes[a], genes[b]) for a, b in fusion_pairs]
    else:
        pair_iter = [(genes[rng.randrange(n_genes)],
                      genes[rng.randrange(n_genes)])
                     for _ in range(n_fusions)]
    for ga, gb in pair_iter:
        if ga is gb or frozenset((ga.name, gb.name)) in truth:
            continue
        ca, cb = ga.cdna(genome), gb.cdna(genome)
        break_a = rng.randint(500, len(ca) - 300)
        break_b = rng.randint(300, len(cb) - 500)
        fusion_seq = ca[:break_a] + cb[break_b - 1:]
        truth.add(frozenset((ga.name, gb.name)))
        for _ in range(frags_per_fusion):
            flen = max(110, int(rng.gauss(200, 20)))
            lo = max(1, break_a - flen + 10)
            hi = min(break_a + 40, len(fusion_seq) - flen)
            if hi <= lo:
                continue
            start = rng.randint(lo, hi)
            frag = fusion_seq[start - 1:start - 1 + flen]
            reads1.append(noisy(frag[:50]))
            reads2.append(noisy(revcomp(frag[-50:])))
    n_fusion_pairs = len(reads1)

    # transcriptomic background (concordant cdna pairs)
    n_dna = n_background // 10
    for _ in range(n_background - n_dna):
        gene = genes[rng.randrange(n_genes)]
        cdna = gene.cdna(genome)
        flen = max(110, int(rng.gauss(200, 20)))
        if flen >= len(cdna):
            flen = len(cdna) - 1
        start = rng.randint(1, len(cdna) - flen)
        frag = cdna[start - 1:start - 1 + flen]
        reads1.append(noisy(frag[:50]))
        reads2.append(noisy(revcomp(frag[-50:])))
    # genomic background (concordant on dna only — pre-mRNA/intergenic)
    for _ in range(n_dna):
        chrom = genome[rng.choice(["1", "2"])]
        flen = max(110, int(rng.gauss(200, 20)))
        start = rng.randint(1, len(chrom) - flen)
        frag = chrom[start - 1:start - 1 + flen]
        reads1.append(noisy(frag[:50]))
        reads2.append(noisy(revcomp(frag[-50:])))

    # interleave read types (real libraries are not sorted by locus):
    # the blocked fusion/transcriptomic/genomic layout concentrates
    # whole classes in single contiguous multi-process shards (the
    # genomic-background block made the last shard ~2x slower in
    # scaling runs — an artifact no real library has)
    order = list(range(len(reads1)))
    rng.shuffle(order)
    reads1 = [reads1[i] for i in order]
    reads2 = [reads2[i] for i in order]

    return genome, genes, reads1, reads2, truth, n_fusion_pairs


def main(n_background=1_000_000, write_report=True):
    from defuse_tpu.align.frontend import align_job
    from defuse_tpu.align.seedindex import SeedIndex
    from defuse_tpu.annotate.gene_models import GeneModels
    from defuse_tpu.config import Config
    from defuse_tpu.io.fasta import write_fasta
    from defuse_tpu.pipeline.run import run_pipeline
    from synthdata import SynthDataset, write_genome_fasta, write_gtf, \
        write_repeats

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="defuse_sim_%d_" % os.getpid()))
    rng = random.Random(4242)
    t0 = time.time()
    marks = {}

    def mark(label):
        nonlocal t0
        marks[label] = time.time() - t0
        print(f"  {label}: {marks[label]:.1f}s", flush=True)
        t0 = time.time()

    genome, genes, reads1, reads2, truth, n_fusion_pairs = generate(
        rng, n_background)
    n_pairs = len(reads1)
    mark(f"generate ({n_pairs} pairs, {n_fusion_pairs} fusion, "
         f"{len(truth)} fusions)")

    ds = SynthDataset(genome, genes, ("", 0, "", 0), "", reads1, reads2,
                      [])
    gtf = tmp / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    repeats = tmp / "repeats.regions"
    write_repeats(ds, repeats)
    cdna_seqs = {f"{g.name}|{g.transcript}": g.cdna(genome) + "A" * 50
                 for g in genes}
    cdna_fa = tmp / "cdna.fa"
    write_fasta(str(cdna_fa), cdna_seqs)
    ref_fa = tmp / "reference.fa"
    allseq = dict(genome)
    allseq.update(cdna_seqs)
    write_fasta(str(ref_fa), allseq)
    regions = tmp / "cdna.regions"
    with open(regions, "w") as out:
        for g in genes:
            fields = [g.name, g.transcript, g.chromosome,
                      "+" if g.strand == 0 else "-"]
            for s, e in g.exons:
                fields += [str(s), str(e)]
            out.write("\t".join(fields) + "\t\n")
    mark("dataset files")

    gm = GeneModels(str(gtf))
    cdna_index = SeedIndex(cdna_seqs)
    genome_index = SeedIndex(genome)
    mark("seed indices (one-time create-ref cost)")

    t_run = time.time()
    res = align_job(cdna_index=cdna_index, genome_index=genome_index,
                    rrna_index=None, gene_models=gm, reads1=reads1,
                    reads2=reads2, outdir=str(tmp / "aligned"))
    mark(f"frontend (stats n={res['stats'].frag_count})")
    frontend_s = marks[f"frontend (stats n={res['stats'].frag_count})"]

    with open(tmp / "reads.1.fastq", "w") as f1, \
            open(tmp / "reads.2.fastq", "w") as f2:
        for i, (a, b) in enumerate(zip(reads1, reads2)):
            f1.write(f"@{i}/1\n{a}\n+\n{'I' * len(a)}\n")
            f2.write(f"@{i}/2\n{b}\n+\n{'I' * len(b)}\n")
    mark("fastq write")

    config = Config.defaults(
        reference_fasta=str(ref_fa), cdna_regions=str(regions),
        cdna_fasta=str(cdna_fa), span_count_threshold=5)
    outs = run_pipeline(
        config=config, output_dir=str(tmp / "out"),
        library_name="sim", use_device=True,
        spanning=res["spanning"], improper=res["improper"],
        fastq1=str(tmp / "reads.1.fastq"),
        fastq2=str(tmp / "reads.2.fastq"),
        concordant_sam=res["concordant_sam"],
        pair_table=res.get("pair_table"),
        gene_models_gtf=str(gtf), genome_fasta=str(genome_fa),
        repeats_regions=str(repeats),
        expression={g.name: "10" for g in genes},
        target_indices={"genome": genome_index, "cdna": cdna_index})
    mark("pipeline")
    e2e_s = time.time() - t_run - marks["fastq write"]

    def pairs_of(path):
        lines = open(path).read().splitlines()
        header = lines[0].split("\t")
        g1, g2 = header.index("gene1"), header.index("gene2")
        return [frozenset((r.split("\t")[g1], r.split("\t")[g2]))
                for r in lines[1:]]

    classified = pairs_of(outs["classified"])
    filtered = pairs_of(outs["filtered"])
    recall_raw = sum(1 for f in truth if f in set(classified))
    recall_filt = sum(1 for f in truth if f in set(filtered))
    fp = sum(1 for f in filtered if f not in truth)
    precision = (len(filtered) - fp) / len(filtered) if filtered else 1.0

    report = {
        "n_read_pairs": n_pairs,
        "n_true_fusions": len(truth),
        "recall_classified": f"{recall_raw}/{len(truth)}",
        "recall_filtered": f"{recall_filt}/{len(truth)}",
        "false_positives_filtered": fp,
        "precision_filtered": round(precision, 4),
        "frontend_s": round(frontend_s, 1),
        "e2e_s": round(e2e_s, 1),
        "frontend_pairs_per_s": round(n_pairs / frontend_s, 1),
        "e2e_pairs_per_s": round(n_pairs / e2e_s, 1),
        "error_rate": ERROR_RATE,
    }
    print(json.dumps(report))
    if write_report and n_pairs >= 500_000:
        md = REPO / "SIM_VALIDATION_r2.md"
        md.write_text(
            "# Simulated-real validation (round 2)\n\n"
            "BASELINE config-2-shaped run: "
            f"{CHROM_MB * 2}Mb genome, {N_GENES} genes, "
            f"{len(truth)} fusions, {n_pairs} read pairs, "
            f"{ERROR_RATE:.1%} per-base error.\n\n"
            "| metric | value |\n|---|---|\n" +
            "".join(f"| {k} | {v} |\n" for k, v in report.items()) +
            "\nGenerated by scripts_dev/sim_validation.py (seed 4242).\n")
        print(f"wrote {md}")
    return report


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 1_000_000
    try:
        main(n)
    finally:
        import glob
        import shutil
        for d in glob.glob(tempfile.gettempdir() + "/defuse_sim_%d_*" % os.getpid()):
            shutil.rmtree(d, ignore_errors=True)
