"""Breakseq behavior on adversarial genomic structure (small-scale
twins of scripts_dev/breakseq_sensitivity.py; the full study writes
BREAKSEQ_SENSITIVITY_r4.md).  Pins the two classifier-visible
contracts: measured percident tracks an engineered paralog's identity,
and a processed pseudogene flips the genome.nointron flag for a
spliced-junction (non-fusion) query."""

import random

from defuse_tpu.align.breakseq import align_breakseq
from defuse_tpu.align.seedindex import SeedIndex
from defuse_tpu.annotate.features import find_breakseqs_percident

BASES = "ACGT"


def _rnd(rng, n):
    return "".join(rng.choice(BASES) for _ in range(n))


def _mutate(rng, seq, identity):
    out = list(seq)
    for i in range(len(out)):
        if rng.random() > identity:
            out[i] = rng.choice([c for c in BASES if c != out[i]])
    return "".join(out)


def _pid(index, seq, spliced, max_gap):
    rows = align_breakseq(index, "0", seq, max_gap=max_gap,
                          spliced=spliced)
    lines = [r.format() for r in rows]
    return find_breakseqs_percident(iter(lines)).get(0, 0.0)


def test_paralog_identity_tracks_percident():
    rng = random.Random(17)
    flank1, flank2 = _rnd(rng, 200), _rnd(rng, 200)
    for p in (0.88, 0.97):
        chr1 = _rnd(rng, 8000) + flank1 + _rnd(rng, 8000)
        chr3 = _rnd(rng, 8000) + flank2 + _rnd(rng, 8000)
        chr2 = _rnd(rng, 6000) + _mutate(rng, flank1, p) \
            + _rnd(rng, 20000) + _mutate(rng, flank2, p) + _rnd(rng, 6000)
        index = SeedIndex({"1": chr1, "2": chr2, "3": chr3})
        pid = _pid(index, flank1 + flank2, True, 500000)
        assert abs(pid - p) <= 0.05, (p, pid)


def test_pseudogene_flips_nointron_flag():
    rng = random.Random(23)
    e1, e2, e3 = _rnd(rng, 300), _rnd(rng, 280), _rnd(rng, 250)
    gene = e1 + _rnd(rng, 1500) + e2 + _rnd(rng, 2500) + e3
    junction = e1[-180:] + e2[:180]
    base1 = _rnd(rng, 9000) + gene + _rnd(rng, 9000)
    with_pg = SeedIndex({"1": base1,
                         "2": _rnd(rng, 5000) + e1 + e2 + e3
                         + _rnd(rng, 5000)})
    without_pg = SeedIndex({"1": base1, "2": _rnd(rng, 12000)})
    assert _pid(with_pg, junction, False, 30) >= 0.95
    assert _pid(without_pg, junction, False, 30) <= 0.80
