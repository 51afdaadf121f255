#!/usr/bin/env python
"""Profile the sharded fastq frontend at scale.

Generates the scale10m dataset once into /tmp/defuse_prof10m (reused on
subsequent runs), then times align_reads with per-phase breakdown
(DEFUSE_ALIGNJOB_TIMING).  Usage:
    python scripts_dev/prof_frontend10m.py [n_background] [reads_per_job]
"""

import json
import os
import pathlib
import random
import shutil
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "scripts_dev"))

os.environ.setdefault("DEFUSE_ALIGNJOB_TIMING", "1")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
RPJ = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
BASE = pathlib.Path(f"/tmp/defuse_prof10m_{N}")


def build_dataset():
    from sim_validation import generate
    from defuse_tpu.io.fasta import write_fasta
    from scale10m import write_fastqs
    from synthdata import SynthDataset, write_genome_fasta, write_gtf

    rng = random.Random(777)
    genome, genes, reads1, reads2, truth, _ = generate(rng, N)
    BASE.mkdir(parents=True)
    write_gtf(SynthDataset(genome, genes, ("", 0, "", 0), "", [], [], []),
              BASE / "genes.gtf")
    write_genome_fasta(
        SynthDataset(genome, genes, ("", 0, "", 0), "", [], [], []),
        BASE / "genome.fa")
    cdna_seqs = {f"{g.name}|{g.transcript}": g.cdna(genome) + "A" * 50
                 for g in genes}
    write_fasta(str(BASE / "cdna.fa"), cdna_seqs)
    write_fastqs(reads1, reads2, BASE / "reads.1.fastq",
                 BASE / "reads.2.fastq")


def main():
    if not BASE.exists():
        t = time.time()
        build_dataset()
        print(f"dataset built: {time.time() - t:.1f}s", flush=True)

    from defuse_tpu.align.frontend import align_reads
    from defuse_tpu.config import Config

    config = Config.defaults(
        cdna_fasta=str(BASE / "cdna.fa"),
        genome_fasta=str(BASE / "genome.fa"),
        gene_models=str(BASE / "genes.gtf"),
        reads_per_job=RPJ)
    outdir = BASE / "out"
    if outdir.exists():
        shutil.rmtree(outdir)
    t = time.time()
    align_reads(config, str(outdir), str(BASE / "reads.1.fastq"),
                str(BASE / "reads.2.fastq"))
    dt = time.time() - t
    print(json.dumps({"frontend_s": round(dt, 1),
                      "pairs_per_s": round(N / dt)}))


if __name__ == "__main__":
    main()
