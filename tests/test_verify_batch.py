"""Device verification produces identical alignments to the numpy path."""

import random

import numpy as np

from defuse_tpu.align.seedindex import SeedIndex
from defuse_tpu.ops.verify_batch import (DeviceVerifier, pack_codes3,
                                         pack_rows3, _verify_packed3)


def test_packed3_kernel_matches_oracle_fuzz():
    """The 3-bit packed kernel is bit-exact vs the brute-force oracle:
    every funnel lane (start % 10 in 0..9), N codes on both sides,
    read lengths not multiples of 10, zero-length reads."""
    rng = np.random.default_rng(7)
    n_ref = 5003  # not a multiple of 10
    codes = rng.integers(0, 5, n_ref).astype(np.int8)  # incl. N=4
    length = 53
    n_reads = 64
    reads = rng.integers(0, 5, (n_reads, length)).astype(np.int8)
    lens = rng.integers(0, length + 1, n_reads).astype(np.int32)
    n_cand = 1000
    starts = rng.integers(0, n_ref - length, n_cand).astype(np.int64)
    starts[:10] = np.arange(10)  # cover every lane deterministically
    ridx = rng.integers(0, n_reads, n_cand).astype(np.int32)

    got = np.asarray(_verify_packed3(
        pack_codes3(codes),
        (starts // 10).astype(np.int32), (starts % 10).astype(np.int32),
        pack_rows3(reads), ridx, lens, length))

    idx = starts[:, None] + np.arange(length)[None, :]
    windows = codes[idx]
    want = ((windows != reads[ridx])
            & (np.arange(length)[None, :] < lens[ridx][:, None])).sum(axis=1)
    assert (got == want).all()


def test_device_verifier_matches_numpy():
    rng = random.Random(21)
    seqs = {"A": "".join(rng.choice("ACGT") for _ in range(8000)),
            "B": "".join(rng.choice("ACGT") for _ in range(5000))}
    index = SeedIndex(seqs)
    reads = []
    for _ in range(40):
        src = seqs[rng.choice("AB")]
        p = rng.randint(0, len(src) - 50)
        read = list(src[p:p + 50])
        for _ in range(rng.randint(0, 2)):
            i = rng.randrange(50)
            read[i] = rng.choice([c for c in "ACGT" if c != read[i]])
        reads.append("".join(read))

    plain = index.align_batch(reads)
    dev = index.align_batch(reads, verify_fn=DeviceVerifier(batch=512))

    def norm(res):
        return [sorted((a.ref, a.pos, a.strand, a.mismatches)
                       for a in hits) for hits in res]

    assert norm(plain) == norm(dev)
