"""Randomized parity fuzz: native C++ stages vs the Python oracles.

Each case generates a random alignment universe (multiple fragments,
refs, strands, overlapping coordinates, stray one-ended fragments) and
asserts byte/structural equality between the native implementations and
the Python reference paths that the golden-build tests pin.
"""

import random

import numpy as np
import pytest

from defuse_tpu.cluster.discordant import cluster_alignments, write_clusters
from defuse_tpu.cluster.matepair_em import EMParams
from defuse_tpu.io.sam import iter_compact, load_alignments, write_compact


@pytest.fixture(scope="module")
def native():
    from defuse_tpu.cluster import native as native_lib
    if not native_lib.available():
        pytest.skip("native library not built")
    return native_lib


PARAMS = EMParams(250.0, 30.0, 0.95, 3)


def _random_compact(rng, path, n_frags=120):
    """Random compact alignment file grouped by fragment."""
    refs = [f"chr{i}" for i in range(1, 5)] + ["GENE|T1", "GENE2|T2"]
    with open(path, "w") as out:
        for frag in range(n_frags):
            n_rows = rng.randint(1, 5)
            for _ in range(n_rows):
                read_end = rng.randint(0, 1)
                ref = rng.choice(refs)
                strand = rng.choice("+-")
                start = rng.randint(1, 60000)
                end = start + rng.randint(30, 80)
                out.write(f"{frag}\t{read_end}\t{ref}\t{strand}\t"
                          f"{start}\t{end}\n")


@pytest.mark.parametrize("seed", [3, 17, 92, 441])
def test_clustermatepairs_fuzz(native, tmp_path, seed):
    rng = random.Random(seed)
    compact = tmp_path / "in.compact"
    _random_compact(rng, compact)

    table = load_alignments(iter_compact(compact))
    rows = cluster_alignments(table, PARAMS, em_mode="oracle")
    py_text = "".join(r.format() + "\n" for r in rows)

    out = tmp_path / "out.native"
    native.clustermatepairs(compact, out, PARAMS, n_threads=3)
    assert out.read_text() == py_text


@pytest.mark.parametrize("seed", [5, 23])
def test_split_realign_fuzz(native, seed):
    """Random flank/read triples incl. shared substrings, empty reads,
    and junk — native rows equal the numpy-path rows."""
    from defuse_tpu.align.batch_realign import (_native_rows, Candidate,
                                                realign_candidates)
    from defuse_tpu.align.tasks import SplitRow

    rng = random.Random(seed)

    def seq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    ref1s, ref2s, reads = [], [], []
    for i in range(60):
        r1, r2 = seq(rng.randint(60, 300)), seq(rng.randint(60, 300))
        kind = rng.random()
        if kind < 0.4:     # true split read
            k = rng.randint(5, 45)
            rd = r1[-k:] + r2[:50 - k]
        elif kind < 0.6:   # one-sided
            p = rng.randint(0, len(r1) - 50)
            rd = r1[p:p + 50]
        elif kind < 0.95:  # junk
            rd = seq(50)
        else:              # empty
            rd = ""
        # sprinkle mismatches
        rd = "".join(c if rng.random() > 0.05 else rng.choice("ACGT")
                     for c in rd)
        ref1s.append(r1)
        ref2s.append(r2)
        reads.append(rd)

    packed = native.split_realign(ref1s, ref2s, reads, n_threads=2)

    # numpy oracle through the public path: fake a realigner
    class _Task:
        def __init__(self, a, b):
            self.split_align_seq = (a, b)

    class _Realigner:
        pass

    rl = _Realigner()
    rl.tasks = {i: _Task(a, b)
                for i, (a, b) in enumerate(zip(ref1s, ref2s))}
    cands = [Candidate(i, i, i, 0, 0, rd) for i, rd in enumerate(reads)]
    from defuse_tpu.ops.split_dp_batch import dp_row_maxima
    py_rows = realign_candidates(rl, cands, dp_row_maxima)

    nat_rows = []
    for ci, i1, j2, k, score in packed.tolist():
        ln = len(reads[ci])
        nat_rows.append(SplitRow(ci, ci, 0, 0, (i1, j2), (k, ln - k),
                                 score))
    assert [r.format() for r in nat_rows] == [r.format() for r in py_rows]


def test_exp_twin_bit_exact_vs_libm():
    """The vectorized exp twin (native/defuse_host.cpp, vexp::) must be
    bit-identical to the host libm's exp — the EM E-step's exponentials
    flow into emitted cluster probabilities, so byte parity of the
    cluster outputs (tools/MatePairEM.cpp contract) rides on this.
    When the twin's self-check fails on a host, the scalar path runs and
    this test only asserts the batch entry still matches libm."""
    import ctypes
    import math

    import numpy as np

    from defuse_tpu.cluster import native

    lib = native.load_library()
    if lib is None:
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(2024)
    x = np.concatenate([
        rng.uniform(-40, 0, 200_000),        # EM-typical band
        rng.uniform(-760, -700, 20_000),     # subnormal-result band
        rng.uniform(-2000, -746, 20_000),    # hard underflow
        rng.uniform(-520, -500, 20_000),     # fast-path boundary
        rng.uniform(0, 700, 20_000),         # positive side
        rng.uniform(-2.0 ** -50, 2.0 ** -50, 20_000),  # 1+x band
        np.array([0.0, -0.0, np.inf, -np.inf, 512.0, -512.0,
                  -745.133, -746.0, 709.78, 710.0]),
    ])
    dst = np.empty_like(x)
    lib.dt_exp_batch(dst.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                     x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                     ctypes.c_long(len(x)))
    # compare against libm (math.exp), not numpy's own SIMD exp, which
    # differs from libm by 1 ulp on a few percent of deep-negative args
    for i, v in enumerate(x):
        try:
            w = math.exp(v)
        except OverflowError:
            w = math.inf
        assert np.array([w]).view(np.uint64)[0] == \
            np.array([dst[i]]).view(np.uint64)[0], (v, dst[i], w)


@pytest.mark.parametrize("seed", [11, 58, 307])
def test_clustermatepairs_partition_fuzz(native, tmp_path, seed):
    """Random inputs x random rank counts: the partitioned clustering
    merge must reproduce the whole-run bytes (the distributed-tail
    contract, beyond the fixed fixture of test_distributed_tail)."""
    from defuse_tpu.parallel.shard import merge_cluster_parts
    rng = random.Random(seed)
    compact = tmp_path / "in.compact"
    _random_compact(rng, compact, n_frags=200)
    whole = tmp_path / "whole"
    native.clustermatepairs(compact, whole, PARAMS, n_threads=2)
    for n_parts in rng.sample(range(2, 9), 3):
        parts, sides = [], []
        for r in range(n_parts):
            p = tmp_path / f"p{n_parts}_{r}"
            s = tmp_path / f"s{n_parts}_{r}"
            native.clustermatepairs_part(compact, p, s, PARAMS, r,
                                         n_parts, n_threads=2)
            parts.append(p)
            sides.append(s)
        merged = tmp_path / f"m{n_parts}"
        merge_cluster_parts(parts, sides, merged)
        assert merged.read_bytes() == whole.read_bytes(), n_parts
