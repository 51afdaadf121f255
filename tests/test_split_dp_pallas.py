"""Pallas split-DP kernel vs the exact host oracle (interpret mode on
the CPU test mesh) — bit-exact for both the int32 and int16 value
paths, across variable ref/read lengths including the mask-free
cascade's wrap-padding edge cases (ref lengths at lane-boundary
multiples)."""

import random

import numpy as np
import pytest

from defuse_tpu.align.split_dp import MIN_SPLIT_SCORE, fill_matrix
from defuse_tpu.ops.split_dp_batch import pad_batch


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


@pytest.mark.parametrize("i16", [False, True])
def test_pallas_row_maxima_matches_oracle(i16):
    from defuse_tpu.ops.split_dp_pallas import _dp_row_maxima_pallas
    rng = random.Random(11)
    refs, reads = [], []
    for _ in range(23):
        refs.append(_rand_seq(rng, rng.randint(5, 127)))
        reads.append(_rand_seq(rng, rng.randint(4, 40)))
    # lane-boundary edge: ref length exactly at the unpadded W-1
    refs.append(_rand_seq(rng, 127))
    reads.append(_rand_seq(rng, 24))
    refs_p, ref_lens = pad_batch(refs, 128)
    reads_p, read_lens = pad_batch(reads, 48)
    rowmax = np.asarray(_dp_row_maxima_pallas(
        refs_p, ref_lens, reads_p, read_lens, 8, True, i16))

    for b, (ref, read) in enumerate(zip(refs, reads)):
        m = fill_matrix(ref, read)
        for j in range(len(read) + 1):
            mx = int(m[:, j].max(initial=0))
            expected = mx if mx >= MIN_SPLIT_SCORE else 0
            assert rowmax[b, j] == expected, (b, j, i16)
        assert (rowmax[b, len(read) + 1:] == 0).all()


def test_pallas_screen_matches_batch_screen():
    """screen_candidates_pallas == the XLA batch screen on a synthetic
    candidate set (shared combine, kernel row maxima only differ)."""
    import jax.numpy as jnp

    from defuse_tpu.align.split_dp import accept_threshold
    from defuse_tpu.ops.split_dp_batch import (combine_split_scores,
                                               dp_row_maxima)
    from defuse_tpu.ops.split_dp_pallas import screen_candidates_pallas
    rng = random.Random(3)
    uref1, uref2 = [], []
    for _ in range(5):
        uref1.append(_rand_seq(rng, rng.randint(40, 90)))
        uref2.append(_rand_seq(rng, rng.randint(40, 90)))
    reads = []
    idx = []
    for i in range(40):
        k = rng.randrange(5)
        idx.append(k)
        if i % 3 == 0:
            half = rng.randrange(8, 16)
            r = uref1[k][-half:] + uref2[k][:24 - half]
        else:
            r = _rand_seq(rng, 24)
        reads.append(r)
    u1p, u1l = pad_batch(uref1, 128)
    u2p, u2l = pad_batch([s[::-1] for s in uref2], 128)
    rp, rl = pad_batch(reads, 24)
    mins = np.array([accept_threshold(len(r)) for r in reads],
                    dtype=np.int32)
    got = np.asarray(screen_candidates_pallas(
        u1p, u1l, u2p, u2l, np.array(idx, np.int32), rp, rl, mins))

    rm1 = dp_row_maxima(u1p[idx], u1l[idx], rp, rl)
    rev = np.zeros_like(rp)
    for i, r in enumerate(reads):
        rev[i, :len(r)] = rp[i, :len(r)][::-1]
    rm2 = dp_row_maxima(u2p[idx], u2l[idx], rev, rl)
    want, _ = combine_split_scores(jnp.asarray(rm1), jnp.asarray(rm2),
                                   jnp.asarray(rl),
                                   jnp.asarray(mins))
    assert (got == np.asarray(want)).all()
    assert got.max() > 0, "no candidate passed — screen untested"


def test_lane_padding_widths():
    """Width sweep vs the XLA oracle: the mask-free cascade needs
    W >= R + 1 + 2*s_max; shapes where lane rounding adds little slack
    (e.g. R=90/L=24, R=130/L=64) wrapped real maxima into the low
    lanes under the old R + 1 + s_max bound."""
    import numpy as np

    from defuse_tpu.ops.split_dp_batch import dp_row_maxima
    from defuse_tpu.ops.split_dp_pallas import _dp_row_maxima_pallas
    rng = np.random.default_rng(7)
    for (R, L) in ((60, 24), (90, 24), (100, 24), (130, 64),
                   (128, 64), (257, 64), (384, 64)):
        refs = rng.integers(1, 5, (16, R)).astype(np.int32)
        rl = rng.integers(max(1, R // 2), R + 1, 16).astype(np.int32)
        reads = rng.integers(1, 5, (16, L)).astype(np.int32)
        ql = rng.integers(max(1, L // 2), L + 1, 16).astype(np.int32)
        want = np.asarray(dp_row_maxima(refs, rl, reads, ql))
        for i16 in (False, True):
            got = np.asarray(_dp_row_maxima_pallas(
                refs, rl, reads, ql, 256, True, i16))
            assert (got == want).all(), (R, L, i16)
