#!/usr/bin/env python
"""Mid-scale end-to-end demo: synthetic multi-megabase genome, ~100k read
pairs, full FASTQ -> results path with per-stage timings (BASELINE
config-2-shaped workload)."""

import os
import pathlib
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

N_GENES = 120
N_FUSIONS = 30
FRAGS_PER_FUSION = 200
N_BACKGROUND = 60000
CHROM_MB = 12


def main(n_background=N_BACKGROUND, use_device=True):
    import random

    from defuse_tpu.align.frontend import align_job
    from defuse_tpu.align.seedindex import SeedIndex
    from defuse_tpu.annotate.gene_models import GeneModels
    from defuse_tpu.config import Config
    from defuse_tpu.core.types import revcomp
    from defuse_tpu.pipeline.run import run_pipeline
    from synthdata import Gene, SynthDataset, random_seq, write_dataset, \
        write_genome_fasta, write_gtf, write_repeats

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="defuse_scale_%d_" % os.getpid()))
    rng = random.Random(2024)
    t0 = time.time()

    def mark(label):
        nonlocal t0
        print(f"  {label}: {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()

    chrom_len = CHROM_MB * 1_000_000
    genome = {"1": random_seq(rng, chrom_len),
              "2": random_seq(rng, chrom_len)}
    genes = []
    pos = {"1": 50_000, "2": 50_000}
    for gi in range(N_GENES):
        chrom = "1" if gi % 2 == 0 else "2"
        strand = rng.randint(0, 1)
        exons = []
        p = pos[chrom]
        for _ in range(5):
            length = rng.randint(400, 900)
            exons.append((p, p + length - 1))
            p += length + rng.randint(1000, 4000)
        pos[chrom] = p + rng.randint(30_000, 120_000)
        genes.append(Gene(f"G{gi}", f"T{gi}", chrom, strand, exons))
    mark("genome+genes")

    reads1, reads2 = [], []
    truth_fusions = set()
    for fi in range(N_FUSIONS):
        ga = genes[rng.randrange(N_GENES)]
        gb = genes[rng.randrange(N_GENES)]
        if ga is gb:
            continue
        ca, cb = ga.cdna(genome), gb.cdna(genome)
        break_a = rng.randint(400, len(ca) - 200)
        break_b = rng.randint(200, len(cb) - 400)
        fusion_seq = ca[:break_a] + cb[break_b - 1:]
        truth_fusions.add(frozenset((ga.name, gb.name)))
        for _ in range(FRAGS_PER_FUSION):
            flen = max(110, int(rng.gauss(200, 20)))
            lo = max(1, break_a - flen + 10)
            hi = min(break_a + 40, len(fusion_seq) - flen)
            if hi <= lo:
                continue
            start = rng.randint(lo, hi)
            frag = fusion_seq[start - 1:start - 1 + flen]
            reads1.append(frag[:50])
            reads2.append(revcomp(frag[-50:]))
    n_fusion_pairs = len(reads1)
    for _ in range(n_background):
        gene = genes[rng.randrange(N_GENES)]
        cdna = gene.cdna(genome)
        flen = max(110, int(rng.gauss(200, 20)))
        if flen >= len(cdna):
            flen = len(cdna) - 1
        start = rng.randint(1, len(cdna) - flen)
        frag = cdna[start - 1:start - 1 + flen]
        reads1.append(frag[:50])
        reads2.append(revcomp(frag[-50:]))
    n_pairs = len(reads1)
    mark(f"reads ({n_pairs} pairs, {n_fusion_pairs} fusion)")

    ds = SynthDataset(genome, genes, ("", 0, "", 0), "", reads1, reads2,
                      [])
    gtf = tmp / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    repeats = tmp / "repeats.regions"
    write_repeats(ds, repeats)
    from defuse_tpu.io.fasta import write_fasta
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
    mark("seed indices")

    res = align_job(cdna_index=cdna_index, genome_index=genome_index,
                    rrna_index=None, gene_models=gm, reads1=reads1,
                    reads2=reads2, outdir=str(tmp / "aligned"))
    mark(f"frontend (stats n={res['stats'].frag_count})")

    with open(tmp / "reads.1.fastq", "w") as f1, \
            open(tmp / "reads.2.fastq", "w") as f2:
        for i, (a, b) in enumerate(zip(reads1, reads2)):
            f1.write(f"@{i}/1\n{a}\n+\n{'I' * 50}\n")
            f2.write(f"@{i}/2\n{b}\n+\n{'I' * 50}\n")

    config = Config.defaults(
        reference_fasta=str(ref_fa), cdna_regions=str(regions),
        cdna_fasta=str(cdna_fa), span_count_threshold=5)
    outs = run_pipeline(
        config=config, output_dir=str(tmp / "out"),
        library_name="scale", use_device=use_device,
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

    lines = open(outs["classified"]).read().splitlines()
    header = lines[0].split("\t")
    g1 = header.index("gene1")
    g2 = header.index("gene2")
    found = {frozenset((r.split("\t")[g1], r.split("\t")[g2]))
             for r in lines[1:]}
    hits = sum(1 for f in truth_fusions if f in found)
    print(f"recovered {hits}/{len(truth_fusions)} true fusions; "
          f"{len(lines) - 1} candidate rows")


if __name__ == "__main__":
    try:
        main(use_device="--cpu" not in sys.argv)
    finally:
        import glob
        import shutil
        for d in glob.glob(tempfile.gettempdir() + "/defuse_scale_%d_*" % os.getpid()):
            shutil.rmtree(d, ignore_errors=True)
