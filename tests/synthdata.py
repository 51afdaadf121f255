"""Synthetic fusion dataset generator for end-to-end parity tests.

Builds a small two-chromosome genome with multi-exon genes, a fusion
transcript joining two genes, and simulated paired-end reads with
aligner-emulated improper SAM output — enough to drive the full
cluster -> setcover -> split-align -> evaluate chain through both the
golden reference binaries and our implementation.
"""

from __future__ import annotations

import dataclasses
import random

from defuse_tpu.core.exons import ExonRegions
from defuse_tpu.core.types import revcomp
from defuse_tpu.io.fasta import write_fasta

READ_LEN = 50


@dataclasses.dataclass
class Gene:
    name: str
    transcript: str
    chromosome: str
    strand: int
    exons: list[tuple[int, int]]

    def cdna(self, genome: dict[str, str]) -> str:
        chrom = genome[self.chromosome]
        seq = "".join(chrom[s - 1:e] for s, e in self.exons)
        if self.strand == 1:
            seq = revcomp(seq)
        return seq

    def transcript_to_genome(self, pos: int) -> int:
        """1-based transcript position -> genomic position."""
        length = sum(e - s + 1 for s, e in self.exons)
        if self.strand == 1:
            pos = length - pos + 1
        off = 0
        for s, e in self.exons:
            if pos <= off + (e - s + 1):
                return s + (pos - off - 1)
            off += e - s + 1
        raise ValueError(pos)


def random_seq(rng: random.Random, n: int) -> str:
    import numpy as np
    nprng = np.random.default_rng(rng.getrandbits(63))
    return nprng.integers(0, 4, n, dtype=np.uint8).astype("uint8") \
        .choose(np.frombuffer(b"ACGT", dtype=np.uint8)) \
        .tobytes().decode()


@dataclasses.dataclass
class SynthDataset:
    genome: dict[str, str]
    genes: list[Gene]
    fusion: tuple[str, int, str, int]  # transcriptA, breakA, transcriptB, breakB
    fusion_seq: str
    reads1: list[str]
    reads2: list[str]
    sam_rows: list[tuple]  # (fragment, read_end, ref, strand, pos, seq)

    def gene_by_transcript(self, t):
        return next(g for g in self.genes if g.transcript == t)


def make_dataset(seed: int = 7, n_fusion_frags: int = 120,
                 n_background_frags: int = 60,
                 frag_mean: float = 200.0, frag_std: float = 20.0,
                 fusion_pair: tuple[str, str] = ("TA", "TB"),
                 break_a: int = 1700, break_b: int = 1500):
    rng = random.Random(seed)
    genome = {
        "1": random_seq(rng, 120000),
        "2": random_seq(rng, 120000),
    }

    genes = [
        Gene("GA", "TA", "1", 0,
             [(20000, 20800), (22000, 22900), (24000, 24700),
              (26000, 26900)]),
        Gene("GB", "TB", "2", 0,
             [(40000, 40900), (42000, 42800), (44000, 44900),
              (46000, 46800)]),
        Gene("GC", "TC", "1", 1,
             [(60000, 60700), (62000, 62600), (64000, 64800)]),
        Gene("GD", "TD", "2", 1,
             [(80000, 80600), (82000, 82700), (84000, 84500)]),
    ]

    by_transcript = {g.transcript: g for g in genes}
    ga = by_transcript[fusion_pair[0]]
    gb = by_transcript[fusion_pair[1]]
    cdna_a = ga.cdna(genome)
    cdna_b = gb.cdna(genome)

    # fusion: A[1..break_a] + B[break_b..] (transcript space)
    fusion_seq = cdna_a[:break_a] + cdna_b[break_b - 1:]

    reads1: list[str] = []
    reads2: list[str] = []
    sam_rows: list[tuple] = []

    def emit_alignments(frag_id, read_end, tpos_start, gene, read_seq,
                        read_from_plus):
        """Emit cdna + (when intra-exon) genome alignment rows for a read
        lying entirely within ``gene``'s transcript at 1-based transcript
        position ``tpos_start``.  ``read_from_plus``: read sequence equals
        transcript-forward slice (strand + on cdna)."""
        ref_cdna = f"{gene.name}|{gene.transcript}"
        strand = 0 if read_from_plus else 1
        sam_rows.append((frag_id, read_end, ref_cdna, strand, tpos_start,
                         read_seq))
        # genome alignment when contained in a single exon
        g_start = gene.transcript_to_genome(tpos_start)
        g_end = gene.transcript_to_genome(tpos_start + READ_LEN - 1)
        if abs(g_end - g_start) == READ_LEN - 1:
            gs = min(g_start, g_end)
            if gene.strand == 1:
                g_strand = 1 - strand
            else:
                g_strand = strand
            sam_rows.append((frag_id, read_end, gene.chromosome, g_strand,
                             gs, read_seq))

    frag_id = 0

    # --- fusion-spanning fragments --------------------------------------
    for _ in range(n_fusion_frags):
        flen = max(2 * READ_LEN,
                   int(rng.gauss(frag_mean, frag_std)))
        start = rng.randint(max(1, break_a - flen + 10),
                            min(break_a + 40, len(fusion_seq) - flen))
        frag = fusion_seq[start - 1:start - 1 + flen]
        r1 = frag[:READ_LEN]
        r2 = revcomp(frag[-READ_LEN:])
        reads1.append(r1)
        reads2.append(r2)

        # read 1 forward at fusion pos [start, start+49]
        r1_end = start + READ_LEN - 1
        r2_start = start + flen - READ_LEN
        r2_end = start + flen - 1
        if r1_end <= break_a:
            emit_alignments(frag_id, 0, start, ga, r1, True)
        elif start > break_a:
            tb_pos = start - break_a + break_b - 1
            emit_alignments(frag_id, 0, tb_pos, gb, r1, True)
        # else: crosses the breakpoint -> unaligned (split candidate)

        if r2_start > break_a:
            tb_pos = r2_start - break_a + break_b - 1
            emit_alignments(frag_id, 1, tb_pos, gb, r2, False)
        elif r2_end <= break_a:
            emit_alignments(frag_id, 1, r2_start, ga, r2, False)
        # else crosses breakpoint
        frag_id += 1

    # --- concordant background fragments --------------------------------
    for _ in range(n_background_frags):
        gene = rng.choice(genes)
        cdna = gene.cdna(genome)
        flen = max(2 * READ_LEN, int(rng.gauss(frag_mean, frag_std)))
        if flen >= len(cdna):
            flen = len(cdna) - 1
        start = rng.randint(1, len(cdna) - flen)
        frag = cdna[start - 1:start - 1 + flen]
        r1 = frag[:READ_LEN]
        r2 = revcomp(frag[-READ_LEN:])
        reads1.append(r1)
        reads2.append(r2)
        emit_alignments(frag_id, 0, start, gene, r1, True)
        emit_alignments(frag_id, 1, start + flen - READ_LEN, gene, r2,
                        False)
        frag_id += 1

    return SynthDataset(genome, genes, ("TA", break_a, "TB", break_b),
                        fusion_seq, reads1, reads2, sam_rows)


# ---------------------------------------------------------------------------

def write_dataset(ds: SynthDataset, outdir):
    """Write reference.fa(.fai), cdna.regions, fastqs, improper.sam,
    spanning compact file.  Returns a dict of paths."""
    outdir.mkdir(parents=True, exist_ok=True)
    paths = {}

    sequences = dict(ds.genome)
    for gene in ds.genes:
        sequences[f"{gene.name}|{gene.transcript}"] = \
            gene.cdna(ds.genome) + "A" * 50
    paths["reference"] = outdir / "reference.fa"
    write_fasta(str(paths["reference"]), sequences)

    paths["exons"] = outdir / "cdna.regions"
    with open(paths["exons"], "w") as out:
        for gene in ds.genes:
            fields = [gene.name, gene.transcript, gene.chromosome,
                      "+" if gene.strand == 0 else "-"]
            for s, e in gene.exons:
                fields += [str(s), str(e)]
            out.write("\t".join(fields) + "\n")

    paths["fastq1"] = outdir / "reads.1.fastq"
    paths["fastq2"] = outdir / "reads.2.fastq"
    for path, reads, end in ((paths["fastq1"], ds.reads1, 1),
                             (paths["fastq2"], ds.reads2, 2)):
        with open(path, "w") as out:
            for i, seq in enumerate(reads):
                out.write(f"@{i}/{end}\n{seq}\n+\n{'I' * len(seq)}\n")

    paths["improper"] = outdir / "improper.sam"
    with open(paths["improper"], "w") as out:
        for (frag, read_end, ref, strand, pos, seq) in ds.sam_rows:
            flag = (0x10 if strand else 0)
            out.write(f"{frag}/{read_end + 1}\t{flag}\t{ref}\t{pos}\t255\t"
                      f"{len(seq)}M\t*\t0\t0\t{seq}\t{'I' * len(seq)}\n")

    # spanning file: both-ends-aligned fragments, compact format
    paths["spanning"] = outdir / "spanning.compact"
    ends_seen: dict[int, set[int]] = {}
    for (frag, read_end, *_rest) in ds.sam_rows:
        ends_seen.setdefault(frag, set()).add(read_end)
    with open(paths["spanning"], "w") as out:
        for (frag, read_end, ref, strand, pos, seq) in ds.sam_rows:
            if len(ends_seen[frag]) < 2:
                continue
            out.write(f"{frag}\t{read_end}\t{ref}\t"
                      f"{'-' if strand else '+'}\t{pos}\t"
                      f"{pos + len(seq) - 1}\n")

    return paths


from defuse_tpu.pipeline.regions import align_regions_lines  # noqa: E402,F401


def write_gtf(ds: SynthDataset, path) -> None:
    """GTF gene models for the synthetic genes (exons + CDS covering the
    interior exons, so UTR/ORF features are exercised)."""
    with open(path, "w") as out:
        for gene in ds.genes:
            strand = "+" if gene.strand == 0 else "-"
            attrs = (f'gene_id "{gene.name}"; '
                     f'transcript_id "{gene.transcript}"; '
                     f'gene_name "{gene.name}_name";')
            for i, (s, e) in enumerate(gene.exons):
                out.write(f"{gene.chromosome}\tsynth\texon\t{s}\t{e}\t.\t"
                          f"{strand}\t.\t{attrs}\n")
                # CDS: all but the first and last exon (UTR ends)
                if 0 < i < len(gene.exons) - 1:
                    out.write(f"{gene.chromosome}\tsynth\tCDS\t{s}\t{e}"
                              f"\t.\t{strand}\t.\t{attrs}\n")


def write_genome_fasta(ds: SynthDataset, path) -> None:
    from defuse_tpu.io.fasta import write_fasta
    write_fasta(str(path), dict(ds.genome))


def write_repeats(ds: SynthDataset, path, seed=17, n=300) -> None:
    rng = random.Random(seed)
    with open(path, "w") as out:
        for _ in range(n):
            chrom = rng.choice(list(ds.genome))
            start = rng.randint(0, len(ds.genome[chrom]) - 2000)
            end = start + rng.randint(100, 1900)
            out.write(f"{chrom}\t{start}\t{end}\tSynthRep\n")
