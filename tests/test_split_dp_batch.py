"""Device (batched JAX) split DP vs the exact host oracle — bit-exact."""

import random

import numpy as np

from defuse_tpu.align.split_dp import (MIN_SPLIT_SCORE, SplitReadAligner,
                                       accept_threshold, fill_matrix)
from defuse_tpu.ops.split_dp_batch import (combine_split_scores,
                                           dp_row_maxima, pad_batch)


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_row_maxima_matches_oracle():
    rng = random.Random(3)
    refs, reads = [], []
    for _ in range(17):
        refs.append(_rand_seq(rng, rng.randint(5, 90)))
        reads.append(_rand_seq(rng, rng.randint(4, 40)))
    refs_p, ref_lens = pad_batch(refs, 96)
    reads_p, read_lens = pad_batch(reads, 48)
    rowmax = np.asarray(dp_row_maxima(refs_p, ref_lens, reads_p, read_lens))

    for b, (ref, read) in enumerate(zip(refs, reads)):
        m = fill_matrix(ref, read)
        for j in range(len(read) + 1):
            mx = int(m[:, j].max(initial=0))
            expected = mx if mx >= MIN_SPLIT_SCORE else 0
            assert rowmax[b, j] == expected, (b, j)
        assert (rowmax[b, len(read) + 1:] == 0).all()


def test_combine_matches_oracle_hits():
    rng = random.Random(9)
    cases = []
    for _ in range(40):
        ref1 = _rand_seq(rng, rng.randint(30, 120))
        ref2 = _rand_seq(rng, rng.randint(30, 120))
        k = rng.randint(5, 30)
        right = rng.randint(5, 30)
        # read stitched from ref1/ref2 fragments (guaranteed good split)
        p1 = rng.randint(0, len(ref1) - k)
        p2 = rng.randint(0, len(ref2) - right)
        read = ref1[p1:p1 + k] + ref2[p2:p2 + right]
        cases.append((ref1, ref2, read))
        # plus a garbage read unlikely to align
        cases.append((ref1, ref2, _rand_seq(rng, k + right)))

    refs1, refs2, reads = zip(*cases)
    B = len(cases)
    R = 128
    L = 64
    r1p, r1l = pad_batch(list(refs1), R)
    r2p, r2l = pad_batch([r[::-1] for r in refs2], R)
    rp, rl = pad_batch(list(reads), L)
    rrp, _ = pad_batch([r[::-1] for r in reads], L)

    rm1 = dp_row_maxima(r1p, r1l, rp, rl)
    rm2 = dp_row_maxima(r2p, r2l, rrp, rl)
    min_scores = np.array([accept_threshold(len(r)) for r in reads],
                          dtype=np.int32)
    max_score, best_k = combine_split_scores(rm1, rm2, rl, min_scores)
    max_score = np.asarray(max_score)
    best_k = np.asarray(best_k)

    for b, (ref1, ref2, read) in enumerate(cases):
        hits = SplitReadAligner(ref1, ref2).align(
            read, accept_threshold(len(read)))
        if not hits:
            assert max_score[b] == 0, b
        else:
            assert max_score[b] == hits[0].score, b
            assert best_k[b] == hits[0].read_split[0], b
