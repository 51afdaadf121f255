"""Seed-and-extend aligner sensitivity vs a brute-force oracle — the
bowtie ``-v 2`` model equivalence check (VERDICT r1 item 3).

For reads >= 3*seed_len the 3-seed pigeonhole guarantees every
<=2-mismatch end-to-end placement is found: the hit set must equal the
brute-force scan exactly (both strands).  Shorter reads use staggered
seeds: hits must be a subset of the oracle (no false placements) with a
measured sensitivity floor.
"""

import random

import numpy as np
import pytest

from defuse_tpu.align.seedindex import SeedIndex, encode
from defuse_tpu.core.types import revcomp

from synthdata import random_seq

GENOME_LEN = 300_000


@pytest.fixture(scope="module")
def genome_fx():
    rng = random.Random(2026)
    seq = random_seq(rng, GENOME_LEN)
    return seq, SeedIndex({"g": seq}), rng


def brute_force_hits(genome_codes, read, max_mm=2):
    """All (pos1, strand, mm) end-to-end placements by full scan."""
    out = []
    for strand, seq in ((0, read), (1, revcomp(read))):
        rc = encode(seq)
        L = len(rc)
        windows = np.lib.stride_tricks.sliding_window_view(
            genome_codes, L)
        mm = (windows != rc[None, :]).sum(axis=1)
        for pos0 in np.nonzero(mm <= max_mm)[0]:
            out.append((int(pos0) + 1, strand, int(mm[pos0])))
    return sorted(out)


def _mutate(rng, read, n):
    r = list(read)
    for q in rng.sample(range(len(r)), n):
        r[q] = rng.choice([c for c in "ACGT" if c != r[q]])
    return "".join(r)


def test_full_sensitivity_at_50bp(genome_fx):
    """50bp reads (>= 3*16): exact hit-set equality with brute force for
    0/1/2 planted mismatches, fwd and revcomp."""
    seq, index, rng = genome_fx
    gcodes = encode(seq)
    reads = []
    for n_mm in (0, 1, 2):
        for _ in range(25):
            p = rng.randrange(0, GENOME_LEN - 50)
            r = _mutate(rng, seq[p:p + 50], n_mm)
            if rng.random() < 0.5:
                r = revcomp(r)
            reads.append(r)
    results = index.align_batch(reads, max_mismatch=2)
    for read, hits in zip(reads, results):
        ours = sorted((a.pos, a.strand, a.mismatches) for a in hits)
        oracle = brute_force_hits(gcodes, read)
        assert ours == oracle, (read, ours, oracle)
        assert len(ours) >= 1  # the planted placement itself


def test_short_reads_subset_and_sensitivity(genome_fx):
    """36bp reads: staggered seeds — no false placements, and measured
    2-mismatch sensitivity above the documented floor (~70%);
    1-mismatch placements keep >=95% sensitivity."""
    seq, index, rng = genome_fx
    gcodes = encode(seq)
    found = {1: 0, 2: 0}
    total = {1: 0, 2: 0}
    for n_mm in (1, 2):
        reads, planted = [], []
        for _ in range(60):
            p = rng.randrange(0, GENOME_LEN - 36)
            reads.append(_mutate(rng, seq[p:p + 36], n_mm))
            planted.append(p + 1)
        results = index.align_batch(reads, max_mismatch=2)
        for read, hits, pos in zip(reads, results, planted):
            ours = sorted((a.pos, a.strand, a.mismatches) for a in hits)
            oracle = brute_force_hits(gcodes, read)
            assert set(ours) <= set(oracle), "false placement emitted"
            total[n_mm] += 1
            if any(h[0] == pos and h[1] == 0 for h in ours):
                found[n_mm] += 1
    assert found[1] / total[1] >= 0.95, found
    assert found[2] / total[2] >= 0.6, found


def test_multimap_cap_matches_bowtie_m(genome_fx):
    """-m semantics: reads with more than max_alignments placements
    return the None sentinel (reported unaligned, XM-flagged)."""
    seq, index, rng = genome_fx
    # a read planted 5 times cannot survive max_alignments=4
    repeat = random_seq(rng, 50)
    s = seq
    positions = [10_000, 60_000, 110_000, 160_000, 210_000]
    for p in positions:
        s = s[:p] + repeat + s[p + 50:]
    idx = SeedIndex({"g": s})
    out = idx.align_batch([repeat], max_mismatch=2, max_alignments=4)
    assert out[0] is None
    out = idx.align_batch([repeat], max_mismatch=2, max_alignments=8)
    assert out[0] is not None and len(out[0]) == 5


def test_short_reads_full_sensitivity_with_small_k(genome_fx):
    """k = L//3 restores the exact pigeonhole guarantee for 36bp reads:
    hit sets equal brute force (the frontend auto-reindexes short-read
    libraries this way)."""
    seq, _idx16, rng = genome_fx
    idx12 = SeedIndex({"g": seq}, seed_len=12)
    gcodes = encode(seq)
    reads = []
    for n_mm in (0, 1, 2):
        for _ in range(20):
            p = rng.randrange(0, GENOME_LEN - 36)
            r = _mutate(rng, seq[p:p + 36], n_mm)
            if rng.random() < 0.5:
                r = revcomp(r)
            reads.append(r)
    results = idx12.align_batch(reads, max_mismatch=2)
    for read, hits in zip(reads, results):
        ours = sorted((a.pos, a.strand, a.mismatches) for a in hits)
        oracle = brute_force_hits(gcodes, read)
        assert ours == oracle, (read, ours, oracle)
        assert len(ours) >= 1


def test_device_verifier_hit_sets_match_oracle(genome_fx, monkeypatch):
    """The DeviceVerifier path (packed 2-bit + N planes, on-device read
    gather) must yield bit-identical hit sets to the brute-force oracle —
    including reads/reference containing N (code 4), which lives in the
    separate N plane."""
    seq, _index, rng = genome_fx
    # genome with N runs so the N plane is exercised
    seq_n = seq[:5000] + "N" * 37 + seq[5037:20000]
    index = SeedIndex({"g": seq_n})
    gcodes = encode(seq_n)

    from defuse_tpu.ops.verify_batch import DeviceVerifier
    monkeypatch.setenv("DEFUSE_DEVICE_VERIFY", "force")
    dv = DeviceVerifier(batch=257)  # multiple device batches per call

    reads = []
    for n_mm in (0, 1, 2):
        for _ in range(15):
            p = rng.randrange(0, len(seq_n) - 50)
            r = _mutate(rng, seq_n[p:p + 50].replace("N", "A"), n_mm)
            if rng.random() < 0.5:
                r = revcomp(r)
            reads.append(r)
    # reads overlapping the N run: the N plane must reproduce the host
    # verifier's N semantics exactly (N == N compares equal).  A read
    # whose seeds all fall in the N run is undiscoverable by any seed
    # lookup, so these compare device vs host, not vs brute force.
    n_reads = [seq_n[4990:5040], seq_n[5020:5070]]

    plain = index.align_batch(reads + n_reads, max_mismatch=2)
    device = index.align_batch(reads + n_reads, max_mismatch=2,
                               verify_fn=dv)
    for i, (read, hp, hd) in enumerate(zip(reads + n_reads, plain,
                                           device)):
        ours = sorted((a.pos, a.strand, a.mismatches) for a in hd)
        host = sorted((a.pos, a.strand, a.mismatches) for a in hp)
        assert ours == host, (read, ours, host)
        if i < len(reads):
            oracle = brute_force_hits(gcodes, read)
            assert ours == oracle, (read, ours, oracle)


def test_device_verifier_cost_model_routing():
    """auto mode routes tiny batches to the host oracle over a slow
    link profile; with the link terms gone the decision tracks the
    measured kernel-vs-host rates (the model must follow the module's
    calibrated constants, not hardcoded figures)."""
    from defuse_tpu.ops import verify_batch as vb
    tunnel = {"bw_MBps": 17.0, "rtt_ms": 157.0}
    t_dev, t_host = vb.verify_cost_model(5000, 500, 50, tunnel)
    assert t_dev > t_host  # small batch over a dead-slow link: host
    local = {"bw_MBps": 10000.0, "rtt_ms": 0.05}
    C, L = 2_000_000, 50
    t_dev, t_host = vb.verify_cost_model(C, 100_000, L, local)
    want_dev = C * L / vb.DEVICE_LANES_S < C / vb.HOST_CANDIDATES_S
    assert (t_dev < t_host) == want_dev
