"""Seed-index aligner correctness: complete recovery of <=2-mismatch
plantings (pigeonhole guarantee) on random references, both strands,
against a brute-force oracle."""

import random

import numpy as np

from defuse_tpu.align.seedindex import SeedIndex, encode
from defuse_tpu.core.types import revcomp


def _brute_alignments(seqs, read, max_mm=2):
    """All end-to-end placements with <= max_mm mismatches."""
    out = []
    r_f = np.frombuffer(read.encode(), np.uint8)
    r_r = np.frombuffer(revcomp(read).encode(), np.uint8)
    for si, (name, seq) in enumerate(seqs.items()):
        s = np.frombuffer(seq.encode(), np.uint8)
        for strand, rc in ((0, r_f), (1, r_r)):
            if len(s) < len(rc):
                continue
            # sliding window mismatch counts
            win = np.lib.stride_tricks.sliding_window_view(s, len(rc))
            mm = (win != rc[None, :]).sum(axis=1)
            for p in np.nonzero(mm <= max_mm)[0]:
                out.append((si, int(p) + 1, strand, int(mm[p])))
    return sorted(out)


def test_aligner_vs_bruteforce():
    rng = random.Random(11)
    seqs = {
        "A": "".join(rng.choice("ACGT") for _ in range(5000)),
        "B": "".join(rng.choice("ACGT") for _ in range(3000)),
    }
    index = SeedIndex(seqs)

    reads = []
    for t in range(60):
        src = seqs[rng.choice("AB")]
        p = rng.randint(0, len(src) - 50)
        read = list(src[p:p + 50])
        for _ in range(rng.randint(0, 2)):  # plant <=2 mismatches
            i = rng.randrange(50)
            read[i] = rng.choice([c for c in "ACGT" if c != read[i]])
        read = "".join(read)
        if t % 3 == 0:
            read = revcomp(read)
        reads.append(read)
    # plus random unmappable reads
    reads += ["".join(rng.choice("ACGT") for _ in range(50))
              for _ in range(10)]

    results = index.align_batch(reads, max_mismatch=2)
    for read, hits in zip(reads, results):
        expected = _brute_alignments(seqs, read)
        got = sorted((a.ref, a.pos, a.strand, a.mismatches) for a in hits)
        assert got == expected, (read, got, expected)


def test_multimap_cap():
    seqs = {"R": "ACGTACGTAC" * 400}  # highly repetitive
    index = SeedIndex(seqs)
    read = ("ACGTACGTAC" * 6)[:50]
    out = index.align_batch([read], max_alignments=100)
    assert out[0] is None  # discarded like bowtie -m


def test_seedindex_save_load_roundtrip(tmp_path):
    """Persisted index (create-ref artifact) aligns identically to a
    freshly built one."""
    import random

    import numpy as np

    from defuse_tpu.io.fasta import write_fasta

    rng = random.Random(4)
    seqs = {"A": "".join(rng.choice("ACGT") for _ in range(6000)),
            "B": "".join(rng.choice("ACGTACGTACGTACGTACGTACGTN") for _ in range(4000))}
    fasta = tmp_path / "ref.fa"
    write_fasta(str(fasta), seqs)

    built = SeedIndex(seqs)
    built.save(str(tmp_path / "idx"))
    loaded = SeedIndex.load(str(tmp_path / "idx"))
    assert np.array_equal(built.keys, loaded.keys)
    assert np.array_equal(built.positions, loaded.positions)
    assert loaded.names == built.names

    reads = []
    for _ in range(30):
        src = seqs[rng.choice("AB")]
        p = rng.randint(0, len(src) - 50)
        reads.append(src[p:p + 50])
    def norm(res):
        return [sorted((a.ref, a.pos, a.strand, a.mismatches)
                       for a in hits) for hits in res]
    assert norm(built.align_batch(reads)) == norm(loaded.align_batch(reads))

    # load_or_build prefers the saved index, falls back to building
    assert SeedIndex.saved_exists(str(tmp_path / "idx"))
    via = SeedIndex.load_or_build(str(fasta), prefix=str(tmp_path / "idx"))
    assert np.array_equal(via.keys, built.keys)
    fresh = SeedIndex.load_or_build(str(fasta))
    assert np.array_equal(fresh.keys, built.keys)


def test_native_align_batch_parity():
    """Native seed+verify path returns identical per-read hit lists
    (order included) to the numpy path."""
    import random

    from defuse_tpu.cluster import native
    if not native.available():
        import pytest
        pytest.skip("native library not built")

    rng = random.Random(77)
    seqs = {"A": "".join(rng.choice("ACGT") for _ in range(9000)),
            "B": "".join(rng.choice("ACGTACGTACGTACGTACGTACGTN") for _ in range(5000)),
            # repeat-heavy sequence to exercise multi-hit caps
            "R": "ACGT" * 800}
    index = SeedIndex(seqs)
    reads = []
    for _ in range(120):
        kind = rng.random()
        if kind < 0.5:
            src = seqs[rng.choice("AB")]
            p = rng.randint(0, len(src) - 50)
            read = list(src[p:p + 50])
            for _ in range(rng.randint(0, 2)):
                i = rng.randrange(50)
                read[i] = rng.choice("ACGTACGTACGTACGTACGTACGTN")
            reads.append("".join(read))
        elif kind < 0.7:
            reads.append("ACGT" * 12 + "AC")   # repeat multi-mapper
        elif kind < 0.9:
            reads.append("".join(rng.choice("ACGT") for _ in range(50)))
        else:
            reads.append("".join(rng.choice("ACGT")
                                 for _ in range(rng.randint(20, 45))))

    from defuse_tpu.cluster import native as native_mod
    nat = index.align_batch(reads, max_alignments=100)
    avail = native_mod.available
    native_mod.available = lambda: False
    try:
        ref = index.align_batch(reads, max_alignments=100)
    finally:
        native_mod.available = avail

    def norm(res):
        return [None if hits is None else
                [(a.ref, a.pos, a.strand, a.mismatches) for a in hits]
                for hits in res]

    assert norm(nat) == norm(ref)


def test_chunked_build_byte_identical(tmp_path):
    """build_to_disk (bounded-memory per-chunk build + K-way merge)
    produces byte-identical index files to the monolithic build."""
    import random

    from defuse_tpu.cluster import native
    if not native.available():
        import pytest
        pytest.skip("native library not built")
    rng = random.Random(12)
    seqs = {f"chr{i}": "".join(rng.choice("ACGTACGTACGTACGTACGTACGTN")
                               for _ in range(rng.randint(3000, 9000)))
            for i in range(7)}

    mono = SeedIndex(seqs)
    mono.save(str(tmp_path / "mono"))
    # chunk_bp small enough to force several chunks
    sharded = SeedIndex.build_to_disk(seqs, str(tmp_path / "shard"),
                                      chunk_bp=8000)
    for suffix in (".codes.npy", ".offsets.npy", ".keys.npy",
                   ".positions.npy"):
        a = (tmp_path / ("mono" + suffix)).read_bytes()
        b = (tmp_path / ("shard" + suffix)).read_bytes()
        assert a == b, suffix

    # and the loaded index aligns identically
    reads = ["".join(rng.choice("ACGT") for _ in range(50))
             for _ in range(20)]
    p = rng.randrange(0, len(seqs["chr3"]) - 50)
    reads.append(seqs["chr3"][p:p + 50])
    a = mono.align_batch(reads, max_mismatch=2)
    b = sharded.align_batch(reads, max_mismatch=2)
    assert a == b
    assert any(hits for hits in b)


def test_persisted_prefix_table(tmp_path):
    """save() persists the bucket prefix table; load() mmaps it; its
    content matches the counting-pass definition, and the native attach
    accepts it (rejecting a corrupted one)."""
    import numpy as np

    from defuse_tpu.align.seedindex import SeedIndex
    from defuse_tpu.cluster import native
    rng = __import__("random").Random(3)
    seqs = {"a": "".join(rng.choice("ACGT") for _ in range(5000)),
            "b": "".join(rng.choice("ACGT") for _ in range(3000))}
    idx = SeedIndex(seqs)
    idx.save(str(tmp_path / "ix"))
    loaded = SeedIndex.load(str(tmp_path / "ix"))
    pt = np.asarray(loaded.prefix_table)
    assert pt[0] == 0 and pt[-1] == len(loaded.keys)
    key_bits = 2 * loaded.seed_len
    shift = key_bits - min(key_bits, 22)
    # every bucket boundary straddles its bucket id
    ids = (np.asarray(loaded.keys) >> np.uint64(shift)).astype(np.int64)
    for b in range(0, len(pt) - 1, max(1, (len(pt) - 1) // 97)):
        off = pt[b]
        assert off == np.searchsorted(ids, b)
    if native.available():
        import ctypes
        lib = native.load_library()
        keys = np.ascontiguousarray(loaded.keys, dtype=np.uint64)
        ptc = np.ascontiguousarray(pt, dtype=np.int64)
        ok = lib.dt_prefixtab_attach(
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ctypes.c_long(len(keys)), ctypes.c_int(loaded.seed_len),
            ptc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_long(len(ptc)))
        assert ok == 0
        bad = ptc.copy()
        # corrupt one of the 64 sampled boundary buckets (s=32)
        sampled = (len(bad) - 1) * 32 // 65
        bad[sampled] = max(0, bad[sampled] - 17)
        rc = lib.dt_prefixtab_attach(
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ctypes.c_long(len(keys)), ctypes.c_int(loaded.seed_len),
            bad.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_long(len(bad)))
        assert rc != 0
