"""Golden tests for localalign, estislands, calccov (vs reference
binaries) and read-stats (vs the reference Perl scripts)."""

import os
import random
import subprocess

import pytest

from defuse_tpu.align.sw import localalign_stream, simple_align_score
from defuse_tpu.filters.estislands import EstCatalog
from defuse_tpu.stats.calccov import calccov, write_samples
from defuse_tpu.stats.pvalues import cov_samples_merge, pnorm
from defuse_tpu.stats.readstats import (ReadStats, merge_read_stats,
                                        read_stats_from_sam)

from synthdata import make_dataset, write_dataset

REF_SCRIPTS = "/root/reference/scripts"


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_localalign_golden(ref_binaries, tmp_path):
    rng = random.Random(5)
    lines = []
    for i in range(200):
        ref = _rand_seq(rng, rng.randint(30, 300))
        if i % 3 == 0:
            p = rng.randint(0, len(ref) - 25)
            seq = ref[p:p + 25]  # perfect local hit
        elif i % 3 == 1:
            seq = _rand_seq(rng, rng.randint(20, 60))
        else:
            p = rng.randint(0, len(ref) - 30)
            seq = ref[p:p + 15] + _rand_seq(rng, 15)
        lines.append(f"{i}\t{ref}\t{seq}")
    input_text = "\n".join(lines) + "\n"

    proc = subprocess.run(
        [str(ref_binaries / "localalign"), "-m", "10", "-x", "-5",
         "-g", "-5", "-t", "0.8"],
        input=input_text, capture_output=True, text=True, check=True)
    ours = "".join(o + "\n" for o in localalign_stream(
        lines, 10, -5, -5, 0.8))
    assert proc.stdout
    assert ours == proc.stdout


def test_estislands_golden(ref_binaries, tmp_path):
    rng = random.Random(9)

    def psl_row(chrom, start, end, extra_lead=0):
        f = ["0"] * (21 + extra_lead)
        f[14 + extra_lead - 1] = chrom  # tName at index 13 (+1 for ests)
        f[16 + extra_lead - 1] = str(start)
        f[17 + extra_lead - 1] = str(end)
        return "\t".join(f)

    # ests: tName field 14, tStart 16, tEnd 17 (leading bin column)
    ests = []
    for _ in range(200):
        chrom = rng.choice(["chr1", "chr2", "chrM", "3"])
        start = rng.randint(0, 500000)
        ests.append(psl_row(chrom, start, start + rng.randint(100, 5000),
                            extra_lead=1))
    breaks = []
    for _ in range(300):
        chrom = rng.choice(["chr1", "chr2", "chrM", "3", "4"])
        start = rng.randint(0, 500000)
        breaks.append(psl_row(chrom, start, start + rng.randint(50, 8000),
                              extra_lead=0))

    est_path = tmp_path / "ests.psl"
    est_path.write_text("\n".join(ests) + "\n")
    break_path = tmp_path / "breaks.psl"
    break_path.write_text("\n".join(breaks) + "\n")
    out_path = tmp_path / "filtered.psl"
    subprocess.run(
        [str(ref_binaries / "estislands"), "-e", str(est_path),
         "-b", str(break_path), "-o", str(out_path)],
        check=True, capture_output=True)

    cat = EstCatalog()
    cat.read_ests(ests)
    ours = "".join(l + "\n" for l in cat.filter_contained(breaks))
    assert ours == out_path.read_text()
    assert ours, "est filter kept nothing — test data too sparse"


def _make_concordant_sam(ds, path, n_pairs=400, seed=3):
    """Concordant cdna pairs for calccov/read-stats tests."""
    from defuse_tpu.core.types import revcomp
    rng = random.Random(seed)
    rows = []
    for i in range(n_pairs):
        gene = rng.choice(ds.genes)
        cdna = gene.cdna(ds.genome)
        flen = max(100, int(rng.gauss(200, 20)))
        if flen >= len(cdna):
            continue
        start = rng.randint(1, len(cdna) - flen)
        ref = f"{gene.name}|{gene.transcript}"
        r1 = cdna[start - 1:start - 1 + 50]
        r2 = revcomp(cdna[start + flen - 51:start + flen - 1])
        # bowtie-style bare qnames: read ends carried by the flags
        rows.append(f"{i}\t99\t{ref}\t{start}\t255\t50M\t=\t"
                    f"{start + flen - 50}\t{flen}\t{r1}\t{'I' * 50}")
        rows.append(f"{i}\t147\t{ref}\t{start + flen - 50}\t255\t50M\t=\t"
                    f"{start}\t{-flen}\t{r2}\t{'I' * 50}")
    path.write_text("\n".join(rows) + "\n")
    return rows


def test_calccov_golden(ref_binaries, tmp_path):
    ds = make_dataset()
    paths = write_dataset(ds, tmp_path)
    sam = tmp_path / "concordant.sam"
    _make_concordant_sam(ds, sam)

    outs = {n: tmp_path / f"ref.{n}" for n in ("span", "pos", "min")}
    subprocess.run(
        [str(ref_binaries / "calccov"), "-t", "50", "-a", "4",
         "-d", "0.05", "-g", str(paths["exons"]), "-c", str(sam),
         "-l", str(outs["span"]), "-p", str(outs["pos"]),
         "-m", str(outs["min"])],
        check=True, capture_output=True)

    from defuse_tpu.core.exons import ExonRegions
    er = ExonRegions.from_file(str(paths["exons"]))
    span, spos, smin = calccov(str(sam), er, trim_length=50,
                               split_min_anchor=4, density=0.05)
    ours = {n: tmp_path / f"ours.{n}" for n in ("span", "pos", "min")}
    write_samples(span, str(ours["span"]), float_values=False)
    write_samples(spos, str(ours["pos"]), float_values=True)
    write_samples(smin, str(ours["min"]), float_values=True)

    for n in ("span", "pos", "min"):
        golden = outs[n].read_text()
        assert golden, f"calccov {n} golden empty"
        assert ours[n].read_text() == golden, f"calccov {n} mismatch"


def test_read_stats_vs_perl(tmp_path):
    ds = make_dataset()
    sam = tmp_path / "pairs.sam"
    rows = _make_concordant_sam(ds, sam)
    proc = subprocess.run(
        ["perl", f"{REF_SCRIPTS}/read_stats.pl", str(sam)],
        capture_output=True, text=True, check=True,
        env=dict(os.environ, PERL_HASH_SEED="0"))
    with open(sam) as fh:
        ours = read_stats_from_sam(fh)
    g_fields = proc.stdout.splitlines()[1].split("\t")
    o_fields = ours.format().splitlines()[1].split("\t")
    # all fields except the hash-ordered readlengths list must match
    assert o_fields[:5] == g_fields[:5]
    assert sorted(o_fields[5].split(",")) == sorted(g_fields[5].split(","))


def test_merge_read_stats_roundtrip():
    a = ReadStats(100, 200.5, 20.25, 50, 50)
    b = ReadStats(50, 190.0, 25.0, 45, 55)
    merged = merge_read_stats([a, b])
    assert merged.frag_count == 150
    # sums recovered exactly
    assert abs(merged.fraglength_mean
               - (100 * 200.5 + 50 * 190.0) / 150) < 1e-12
    assert merged.readlength_min == 45 and merged.readlength_max == 55


def test_cov_samples_merge_formula():
    # identical samples per marker: picks don't matter; cov must be ~0
    samples = {i: [5.0, 5.0, 5.0] for i in range(150)}
    mean, cov = cov_samples_merge(samples)
    assert mean == 5.0
    assert abs(cov) < 1e-9


def test_cov_samples_merge_arrays_bit_parity(tmp_path):
    """The vectorized file loader + array merge must be bit-identical
    to the dict form (same drand48 draws, same accumulation order) on
    interleaved markers with %.6g-formatted values, including markers
    with <2 samples."""
    import random

    from defuse_tpu.stats.pvalues import (cov_samples_merge,
                                          cov_samples_merge_arrays,
                                          load_cov_samples)
    rng = random.Random(77)
    rows = []
    for _ in range(5000):
        m = rng.randrange(0, 300)
        rows.append((m, float(f"{rng.uniform(0.0, 1.0):.6g}")))
    rows.append((999, 0.5))  # singleton marker: skipped by both
    path = tmp_path / "cov.samples"
    with open(path, "w") as fh:
        for m, v in rows:
            fh.write(f"{m}\t{v:.6g}\n")
    samples: dict = {}
    for line in open(path):
        f = line.split("\t")
        samples.setdefault(int(f[0]), []).append(float(f[1]))
    mean_d, cov_d = cov_samples_merge(samples)
    mean_a, cov_a = cov_samples_merge_arrays(*load_cov_samples(path))
    assert mean_a == mean_d
    assert cov_a == cov_d

    from defuse_tpu.cluster import native
    if native.available():
        mean_n, cov_n = native.cov_merge_file(path)
        assert mean_n == mean_d
        assert cov_n == cov_d


def test_native_localalign_batch_matches_oracle():
    """dt_localalign_batch scores == simple_align_score (integer-exact
    SimpleAligner recurrence) across random and adversarial pairs."""
    import random

    from defuse_tpu.align.sw import simple_align_score
    from defuse_tpu.cluster import native
    if not native.available():
        pytest.skip("native library not built")
    rng = random.Random(5)
    refs, seqs = [], []
    for _ in range(60):
        refs.append("".join(rng.choice("ACGT")
                            for _ in range(rng.randrange(1, 400))))
        seqs.append("".join(rng.choice("ACGT")
                            for _ in range(rng.randrange(1, 80))))
    # planted exact and near-exact matches
    refs.append("A" * 100 + "ACGTACGTACGT" + "C" * 100)
    seqs.append("ACGTACGTACGT")
    refs.append(refs[-1])
    seqs.append("ACGTATGTACGT")  # one mismatch
    scores = native.localalign_batch(refs, seqs, 10, -5, -5)
    assert scores is not None
    for r, q, s in zip(refs, seqs, scores):
        assert int(s) == simple_align_score(r, q, 10, -5, -5)


def test_pnorm_known_values():
    assert abs(pnorm(0.0) - 0.5) < 1e-15
    assert abs(pnorm(-1.959963984540054) - 0.025) < 1e-12
    assert abs(pnorm(1.6448536269514722) - 0.95) < 1e-12


def test_calccov_native_byte_parity(tmp_path):
    """The native calccov sampling pass (dt_calccov) matches the Python
    oracle byte for byte (which test_calccov_golden pins to the
    reference binary)."""
    from defuse_tpu.cluster import native
    if not native.available():
        import pytest
        pytest.skip("native library not built")
    ds = make_dataset(seed=23)
    paths = write_dataset(ds, tmp_path)
    sam = tmp_path / "concordant.sam"
    _make_concordant_sam(ds, sam, n_pairs=3000)

    from defuse_tpu.core.exons import ExonRegions
    from defuse_tpu.stats.calccov import sample_positions
    er = ExonRegions.from_file(str(paths["exons"]))
    span, spos, smin = calccov(str(sam), er, trim_length=50,
                               split_min_anchor=4, density=0.05)
    py = {n: tmp_path / f"py.{n}" for n in ("span", "pos", "min")}
    write_samples(span, str(py["span"]), float_values=False)
    write_samples(spos, str(py["pos"]), float_values=True)
    write_samples(smin, str(py["min"]), float_values=True)

    ref_index, positions = sample_positions(er, 0.05, False)
    names = [""] * len(ref_index)
    for tid, idx in ref_index.items():
        names[idx] = tid
    nat = {n: tmp_path / f"nat.{n}" for n in ("span", "pos", "min")}
    count = native.calccov_native(
        str(sam), names, [r for r, _ in positions],
        [p for _, p in positions], trim_length=50, anchor=4,
        span_path=nat["span"], pos_path=nat["pos"], min_path=nat["min"])
    assert count is not None and count > 0
    for n in ("span", "pos", "min"):
        assert nat[n].read_bytes() == py[n].read_bytes(), n
    assert py["pos"].read_text(), "empty fixture would prove nothing"


def test_read_stats_native_parity(tmp_path):
    """dt_read_stats matches the Python read_stats_from_sam exactly."""
    from defuse_tpu.cluster import native
    if not native.available():
        import pytest
        pytest.skip("native library not built")
    ds = make_dataset(seed=44)
    sam = tmp_path / "pairs.sam"
    _make_concordant_sam(ds, sam, n_pairs=2500)
    with open(sam) as fh:
        py = read_stats_from_sam(fh)
    nat = native.read_stats_native(str(sam))
    assert nat is not None
    assert nat == py
