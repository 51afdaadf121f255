"""Breakpoint-sequence aligner validation across every target class the
reference fans out to (``defuse_run.pl:672-796``): genome spliced
(per-chromosome gmap), genome --nosplicing, cdna, ESTs, exons (blat),
cds (blat) — with hand-constructed fixtures whose expected chains,
match counts, insert sizes and block structures are derivable by eye.

gmap/blat cannot be built in this image (external tarballs, zero
egress), so these pin the *consumer-visible* contract instead: the
percident / homology / exon-boundary / ORF feature inputs computed by
``annotate.features`` from the PSLs.
"""

import random

import pytest

from defuse_tpu.align.breakseq import align_breakpoints, align_breakseq
from defuse_tpu.align.seedindex import SeedIndex
from defuse_tpu.annotate.features import (find_breakseqs_overlap,
                                          find_breakseqs_percident)
from defuse_tpu.core.types import revcomp

from synthdata import random_seq


@pytest.fixture(scope="module")
def fx():
    rng = random.Random(1234)
    chrom1 = random_seq(rng, 40000)
    chrom2 = random_seq(rng, 40000)
    exons_a = [(5000, 5400), (9000, 9500), (12000, 12400)]
    exons_b = [(7000, 7600), (11000, 11500)]
    ex_a = [chrom1[s:e] for s, e in exons_a]
    ex_b = [chrom2[s:e] for s, e in exons_b]
    cdna_a = "".join(ex_a)
    cdna_b = "".join(ex_b)
    # left flank: last 100bp of exonA1 + first 150bp of exonA2
    left = cdna_a[300:550]
    # right flank: last 150bp of exonB1 + first 100bp of exonB2
    right = cdna_b[450:700]
    fusion = left + right
    return dict(chrom1=chrom1, chrom2=chrom2, exons_a=exons_a,
                exons_b=exons_b, ex_a=ex_a, ex_b=ex_b, cdna_a=cdna_a,
                cdna_b=cdna_b, left=left, right=right, fusion=fusion,
                genome=SeedIndex({"1": chrom1, "2": chrom2}),
                cdna=SeedIndex({"GA|TA": cdna_a, "GB|TB": cdna_b}))


def _best(rows):
    return max(rows, key=lambda r: r.matches)


def test_genome_spliced_chain_exact(fx):
    """A flank spanning one intron chains into exactly two blocks with
    the intron as target insert and a perfect match count."""
    rows = align_breakseq(fx["genome"], "0", fx["left"],
                          max_gap=500000, spliced=True)
    best = _best(rows)
    assert best.t_name == "1" and best.strand == "+"
    assert best.matches == 250
    assert len(best.blocks) == 2
    (s1, q1, t1), (s2, q2, t2) = best.blocks
    assert (s1, q1, t1) == (100, 0, 5300)   # exonA1 suffix
    assert (s2, q2, t2) == (150, 100, 9000)  # exonA2 prefix
    assert best.t_base_insert == 9000 - 5400  # the intron
    # consumer contract: percident 1.0
    pid = find_breakseqs_percident([best.format()])
    assert pid[0] == 1.0


def test_genome_percident_counts_planted_mismatches(fx):
    """Planted mismatches reduce the match count by exactly their
    number (blocks re-seed around isolated mismatches)."""
    q = list(fx["left"])
    for pos in (50, 130, 200):
        q[pos] = {"A": "C", "C": "G", "G": "T", "T": "A"}[q[pos]]
    rows = align_breakseq(fx["genome"], "7", "".join(q),
                          max_gap=500000, spliced=True)
    best = _best(rows)
    assert best.matches == 247
    pid = find_breakseqs_percident([best.format()])
    assert pid[7] == 247 / 250


def test_fusion_seq_never_fully_aligns_to_one_chromosome(fx):
    """The full breakpoint sequence spans two chromosomes: no single
    chain may cover it, so max genome percident stays ~0.5 — the
    artifact-detection semantics of genome_breakseqs_percident."""
    rows = align_breakseq(fx["genome"], "3", fx["fusion"],
                          max_gap=500000, spliced=True)
    pid = find_breakseqs_percident([r.format() for r in rows])
    assert 0.4 < pid[3] < 0.6


def test_nointron_mode_splits_at_intron(fx, tmp_path):
    """align_breakpoints emits genome + genome.nointron; the unspliced
    variant must not chain across the intron."""
    paths = align_breakpoints({0: fx["left"]}, {"genome": fx["genome"]},
                              tmp_path)
    assert set(paths) == {"genome", "genome.nointron"}
    spliced_rows = open(paths["genome"]).read().splitlines()
    ns_rows = open(paths["genome.nointron"]).read().splitlines()
    assert max(int(r.split("\t")[0]) for r in spliced_rows) == 250
    for r in ns_rows:
        assert int(r.split("\t")[7]) <= 30  # no intron-sized inserts
    assert max(int(r.split("\t")[0]) for r in ns_rows) < 250


def test_cdna_halves_and_homology_extents(fx):
    """cdna alignments of the fusion sequence: the left half ends at the
    junction, the right half starts there; find_breakseqs_overlap turns
    the extents into breakpoint homology."""
    rows = align_breakseq(fx["cdna"], "5", fx["fusion"],
                          max_gap=500000, spliced=True)
    lines = [r.format() for r in rows]
    left_end: dict = {}
    right_start: dict = {}
    find_breakseqs_overlap(lines, 0.9, left_end, right_start)
    # exact split: no designed homology; chance extension < 6bp
    assert 250 <= left_end[5] <= 256
    assert 245 <= right_start[5] <= 251
    homology = left_end[5] - right_start[5] + 1
    assert homology <= 12

    # plant 12bp of homology: right flank begins with the 12 bases that
    # continue the A transcript past the junction
    fusion_hom = fx["left"] + fx["cdna_a"][550:562] + fx["right"][12:]
    rows = align_breakseq(fx["cdna"], "6", fusion_hom,
                          max_gap=500000, spliced=True)
    left_end, right_start = {}, {}
    find_breakseqs_overlap([r.format() for r in rows], 0.9, left_end,
                           right_start)
    assert left_end[6] >= 262  # extends >= 12bp past the junction
    assert left_end[6] - 250 >= 12


def test_est_target_spliced(fx):
    """EST-like target (a spliced EST covering the A exons) recovers the
    left flank at percident 1.0 — the est percident feature input."""
    est = SeedIndex({"EST1": fx["ex_a"][0] + fx["ex_a"][1]})
    rows = align_breakseq(est, "9", fx["left"], max_gap=500000,
                          spliced=True)
    pid = find_breakseqs_percident([r.format() for r in rows])
    assert pid[9] == 1.0
    best = _best(rows)
    assert best.t_start == 300 and best.t_end == 550
    assert len(best.blocks) == 1  # contiguous on the spliced EST


def test_exons_target_boundary_blocks(fx):
    """Per-exon targets: a junction-spanning flank hits the two exons as
    separate rows whose target coords snap to the exon boundaries — the
    exonboundaries feature's evidence (annotate_fusions.pl:717-818)."""
    exons = SeedIndex({f"GA|TA|{i}": s for i, s in enumerate(fx["ex_a"])})
    rows = align_breakseq(exons, "2", fx["left"], max_gap=30,
                          spliced=False)
    by_target = {}
    for r in rows:
        if r.strand == "+":
            by_target.setdefault(r.t_name, []).append(r)
    r1 = _best(by_target["GA|TA|0"])
    r2 = _best(by_target["GA|TA|1"])
    # left 100bp = exonA1 suffix: ends exactly at the exon end
    assert (r1.q_start, r1.q_end) == (0, 100)
    assert (r1.t_start, r1.t_end) == (300, 400)
    assert r1.t_end == len(fx["ex_a"][0])  # boundary snap
    # right 150bp = exonA2 prefix: starts exactly at the exon start
    assert (r2.q_start, r2.q_end) == (100, 250)
    assert (r2.t_start, r2.t_end) == (0, 150)
    assert r1.matches + r2.matches == 250


def test_cds_target_orf_coords(fx):
    """cds target: block coordinates preserve reading-frame arithmetic
    (the ORF phase check reads q/t starts mod 3,
    annotate_fusions.pl:686-715)."""
    cds = SeedIndex({"GA|TA": fx["cdna_a"][30:990]})
    q = fx["cdna_a"][129:279]  # in-frame 150bp window (129-30 = 99 ≡ 0 mod 3)
    rows = align_breakseq(cds, "4", q, max_gap=30, spliced=False)
    best = _best(rows)
    assert best.matches == 150
    assert best.t_start == 99 and best.t_end == 249
    assert (best.t_start - best.q_start) % 3 == 0


def test_chain_selection_prefers_true_locus_over_paralog(fx):
    """A decoy paralog of exonA2 with 8% divergence must lose chain
    selection (max matches) to the true locus."""
    rng = random.Random(5)
    decoy = list(fx["ex_a"][1])
    for _ in range(40):
        p = rng.randrange(len(decoy))
        decoy[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[decoy[p]]
    chrom3 = random_seq(rng, 3000) + "".join(decoy) + random_seq(rng, 3000)
    genome = SeedIndex({"1": fx["chrom1"], "2": fx["chrom2"],
                        "3": chrom3})
    rows = align_breakseq(genome, "8", fx["left"], max_gap=500000,
                          spliced=True)
    best = _best(rows)
    assert best.t_name == "1" and best.matches == 250
    decoy_rows = [r for r in rows if r.t_name == "3"]
    assert decoy_rows, "decoy should still produce a (weaker) alignment"
    assert max(r.matches for r in decoy_rows) < 250


def test_minus_strand_coordinates_roundtrip(fx):
    """PSL minus-strand query coords are reported on the query plus
    strand; the homology extents must therefore be strand-insensitive."""
    rows = align_breakseq(fx["genome"], "11", revcomp(fx["left"]),
                          max_gap=500000, spliced=True)
    best = _best(rows)
    assert best.strand == "-"
    assert best.matches == 250
    assert (best.q_start, best.q_end) == (0, 250)
    assert best.t_base_insert == 3600
