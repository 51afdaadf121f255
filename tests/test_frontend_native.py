"""Native alignment frontend (dt_align_job) byte-parity vs the Python
oracle, across every screen: paired concordance, trimmed multimap,
unmappable / same-gene / same-region, rRNA, unigene prefilter, IG.

The Python ``align_job`` path (force_python=True) is the contract; the
native driver must produce byte-identical improper.sam /
spanning.compact / cdna.pair.sam plus equal stats and fragment sets.
"""

import random

import pytest

from defuse_tpu.align.frontend import align_job, index_paired_fastq
from defuse_tpu.align.seedindex import SeedIndex
from defuse_tpu.annotate.gene_models import GeneModels
from defuse_tpu.io.sam import read_decompressed

from synthdata import make_dataset, random_seq, write_dataset, write_gtf


def _revcomp(s):
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


@pytest.fixture(scope="module")
def rich_dataset(tmp_path_factory):
    """make_dataset base + planted reads exercising every screen."""
    tmp = tmp_path_factory.mktemp("frontend_native")
    rng = random.Random(99)
    ds = make_dataset(seed=42, n_fusion_frags=120, n_background_frags=120)

    rrna_seq = random_seq(rng, 900)
    prefilter_seq = random_seq(rng, 1400)
    ig_seq = random_seq(rng, 1600)

    reads1, reads2 = list(ds.reads1), list(ds.reads2)

    def add_pair(r1, r2):
        reads1.append(r1)
        reads2.append(r2)

    # rRNA-anchored fragments (either end mapping blacklists)
    for _ in range(6):
        p = rng.randrange(0, len(rrna_seq) - 60)
        add_pair(rrna_seq[p:p + 50], random_seq(rng, 50))
    # prefilter-concordant fragments (proper pair on the prefilter seq,
    # absent from cdna/genome)
    for _ in range(6):
        p = rng.randrange(0, len(prefilter_seq) - 220)
        frag = prefilter_seq[p:p + 200]
        add_pair(frag[:50], _revcomp(frag[-50:]))
    # IG-discordant fragments: both ends on the IG cdna but same strand
    # (never a proper pair), far apart
    for _ in range(5):
        add_pair(ig_seq[100:150], ig_seq[1200:1250])
    # multimap/unmappable: reads from a sequence repeated at many loci
    repeat = random_seq(rng, 80)
    genome = dict(ds.genome)
    g2 = genome["2"]
    # plant the repeat 14 times spread over chromosome 2 (>200kb apart
    # impossible in 120kb; use chromosome 1 + 2 alternating)
    g1 = genome["1"]
    for i in range(7):
        pos = 5000 + i * 15000
        g1 = g1[:pos] + repeat + g1[pos + 80:]
        g2 = g2[:pos] + repeat + g2[pos + 80:]
    genome["1"], genome["2"] = g1, g2
    for _ in range(4):
        add_pair(repeat[:50], _revcomp(repeat[20:70]))

    ds2 = type(ds)(genome, ds.genes, ds.fusion, ds.fusion_seq,
                   reads1, reads2, ds.sam_rows)

    paths = write_dataset(ds2, tmp)
    gtf = tmp / "genes.gtf"
    write_gtf(ds2, gtf)
    r1, r2, _ = index_paired_fastq(str(paths["fastq1"]),
                                   str(paths["fastq2"]),
                                   str(tmp / "reads"))
    gene_models = GeneModels(str(gtf))
    cdna_seqs = {f"{g.name}|{g.transcript}": g.cdna(genome) + "A" * 50
                 for g in ds2.genes}
    cdna_seqs["IGH|IGH-T"] = ig_seq  # an IG gene transcript
    cdna_index = SeedIndex(cdna_seqs)
    genome_index = SeedIndex(genome)
    rrna_index = SeedIndex({"RRNA": rrna_seq})
    prefilter_index = SeedIndex({"UG1": prefilter_seq})
    return dict(tmp=tmp, reads1=r1, reads2=r2, gene_models=gene_models,
                cdna_index=cdna_index, genome_index=genome_index,
                rrna_index=rrna_index, prefilter_index=prefilter_index)


def _run(d, outdir, force_python, **kw):
    return align_job(
        cdna_index=d["cdna_index"], genome_index=d["genome_index"],
        rrna_index=d["rrna_index"], gene_models=d["gene_models"],
        reads1=d["reads1"], reads2=d["reads2"], outdir=str(outdir),
        ig_genes={"IGH"}, prefilter_index=d["prefilter_index"],
        force_python=force_python, **kw)


def test_native_frontend_byte_parity(rich_dataset):
    from defuse_tpu.cluster import native
    if not native.available():
        pytest.skip("native library not built")
    d = rich_dataset
    py = _run(d, d["tmp"] / "py", force_python=True)
    nat = _run(d, d["tmp"] / "nat", force_python=False)

    for key in ("spanning", "improper", "concordant_sam"):
        # concordant_sam is gzipped (multi-member native vs single-member
        # python); the byte contract is on the decompressed content
        a = read_decompressed(py[key])
        b = read_decompressed(nat[key])
        assert a == b, f"{key} differs (py {len(a)}B vs native {len(b)}B)"
    # binary pair table: raw byte parity (same layout both paths)
    assert open(py["pair_table"], "rb").read() == \
        open(nat["pair_table"], "rb").read()
    assert py["stats"] == nat["stats"]
    assert py["concordant_fragments"] == nat["concordant_fragments"]
    assert py["blacklist"] == nat["blacklist"]

    # the screens actually fired on this dataset
    assert py["blacklist"], "no fragment blacklisted — screens untested"
    assert len(py["concordant_fragments"]) > 80


def test_prefilter_screen_blacklists(rich_dataset):
    """The unigene prefilter screen kills prefilter-concordant pairs
    (alignjob.pl:289-305) — with it off they leak into the improper set."""
    d = rich_dataset
    with_pre = _run(d, d["tmp"] / "pre_on", force_python=True)
    no_pre = align_job(
        cdna_index=d["cdna_index"], genome_index=d["genome_index"],
        rrna_index=d["rrna_index"], gene_models=d["gene_models"],
        reads1=d["reads1"], reads2=d["reads2"],
        outdir=str(d["tmp"] / "pre_off"), ig_genes={"IGH"},
        force_python=True)
    gained = with_pre["blacklist"] - no_pre["blacklist"]
    assert len(gained) >= 6, "prefilter screen blacklisted nothing"
    assert no_pre["concordant_fragments"] == \
        with_pre["concordant_fragments"]


@pytest.mark.parametrize("seed,kw", [
    (7, dict(max_insert_size=300)),
    (13, dict(discord_read_trim=40, max_alignments=3)),
    (21, dict(max_paired_alignments=1, dna_concordant_length=500)),
])
def test_native_frontend_fuzz(tmp_path, seed, kw):
    """Parameter sweep incl. tight -m caps (over-cap screens) and short
    trims; also mixes read lengths to exercise per-screen batch maxima."""
    from defuse_tpu.cluster import native
    if not native.available():
        pytest.skip("native library not built")
    rng = random.Random(seed)
    ds = make_dataset(seed=seed, n_fusion_frags=60,
                      n_background_frags=60)
    reads1 = [r[:rng.choice([46, 50])] for r in ds.reads1]
    reads2 = [r[:rng.choice([48, 50])] for r in ds.reads2]
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    gene_models = GeneModels(str(gtf))
    cdna_index = SeedIndex(
        {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
         for g in ds.genes})
    genome_index = SeedIndex(ds.genome)

    outs = {}
    for name, force in (("py", True), ("nat", False)):
        outs[name] = align_job(
            cdna_index=cdna_index, genome_index=genome_index,
            rrna_index=None, gene_models=gene_models, reads1=reads1,
            reads2=reads2, outdir=str(tmp_path / name),
            force_python=force, **kw)
    for key in ("spanning", "improper", "concordant_sam"):
        assert read_decompressed(outs["py"][key]) == \
            read_decompressed(outs["nat"][key]), key
    assert open(outs["py"]["pair_table"], "rb").read() == \
        open(outs["nat"]["pair_table"], "rb").read()
    assert outs["py"]["stats"] == outs["nat"]["stats"]
    assert outs["py"]["blacklist"] == outs["nat"]["blacklist"]
    assert outs["py"]["concordant_fragments"] == \
        outs["nat"]["concordant_fragments"]


def test_pair_table_scanners_match_sam(rich_dataset):
    """dt_read_stats_tbl / dt_calccov_tbl over cdna.pair.tbl produce
    bit-identical stats and byte-identical sample files to the SAM
    scanning paths (the table is the same data without the text
    parse)."""
    from defuse_tpu.cluster import native
    if not native.available():
        pytest.skip("native library not built")
    d = rich_dataset
    res = _run(d, d["tmp"] / "tbl", force_python=False)

    s_sam = native.read_stats_native(res["concordant_sam"])
    s_tbl = native.read_stats_tbl(res["pair_table"])
    assert s_sam == s_tbl
    assert s_sam.frag_count > 80

    names = d["cdna_index"].names
    # markers spread over every transcript
    marker_refs, marker_pos = [], []
    for i, n in enumerate(names):
        for p in (30, 80, 200, 500):
            marker_refs.append(i)
            marker_pos.append(p)
    outs = {}
    for tag in ("sam", "tbl"):
        paths = [str(d["tmp"] / f"cov.{tag}.{k}") for k in
                 ("span", "pos", "min")]
        fn = native.calccov_native if tag == "sam" else native.calccov_tbl
        src = res["concordant_sam"] if tag == "sam" else res["pair_table"]
        rc = fn(src, names, marker_refs, marker_pos, trim_length=25,
                anchor=4, span_path=paths[0], pos_path=paths[1],
                min_path=paths[2])
        assert rc is not None and rc > 0
        outs[tag] = (rc, [open(p, "rb").read() for p in paths])
    assert outs["sam"][0] == outs["tbl"][0]
    for a, b in zip(outs["sam"][1], outs["tbl"][1]):
        assert a == b
    assert any(outs["sam"][1]), "no covariance samples produced"

    # .gz destinations: per-thread gzip members whose decompressed
    # bytes equal the plain run, and whose merged covariance is
    # bit-identical through the magic-sniffing readers
    import gzip
    gz_paths = [str(d["tmp"] / f"cov.gz.{k}.gz") for k in
                ("span", "pos", "min")]
    rc = native.calccov_tbl(res["pair_table"], names, marker_refs,
                            marker_pos, trim_length=25, anchor=4,
                            span_path=gz_paths[0], pos_path=gz_paths[1],
                            min_path=gz_paths[2])
    assert rc == outs["tbl"][0]
    from defuse_tpu.stats.pvalues import cov_samples_merge_arrays, \
        load_cov_samples
    for gz_p, plain in zip(gz_paths, outs["tbl"][1]):
        assert gzip.open(gz_p, "rb").read() == plain

        def _merge(fn, *a):
            try:
                return fn(*a)
            except ValueError as e:  # <=100-samples contract
                return ("raises", str(e))

        a = _merge(native.cov_merge_file, gz_p)
        b = _merge(lambda p: cov_samples_merge_arrays(
            *load_cov_samples(p)), gz_p)
        assert a == b

    # fused merge (merge_seed): bit-identical to re-reading the emitted
    # files, incl. the %.6g quantization of the pos/min fractions and
    # the insufficient-samples contract
    fused_paths = [str(d["tmp"] / f"cov.fz.{k}.gz") for k in
                   ("span", "pos", "min")]
    fused = native.calccov_tbl(res["pair_table"], names, marker_refs,
                               marker_pos, trim_length=25, anchor=4,
                               span_path=fused_paths[0],
                               pos_path=fused_paths[1],
                               min_path=fused_paths[2], merge_seed=11)
    assert fused is not None
    count, merged = fused
    assert count == outs["tbl"][0]
    for kind, p in zip(("span", "pos", "min"), fused_paths):
        try:
            want = native.cov_merge_file(p)
        except ValueError:
            want = None
        assert merged[kind] == want, kind


def test_native_fastq_ingest_byte_parity(tmp_path):
    """dt_fastq_ingest writes byte-identical renamed fastqs + .fqi +
    names to the Python indexer, and its matrices decode to the same
    reads."""
    from defuse_tpu.cluster import native
    if not native.available():
        pytest.skip("native library not built")
    ds = make_dataset(seed=5, n_fusion_frags=40, n_background_frags=40)
    paths = write_dataset(ds, tmp_path)
    r1_py, r2_py, _ = index_paired_fastq(
        str(paths["fastq1"]), str(paths["fastq2"]),
        str(tmp_path / "py"))
    ingested = native.ingest_fastq(str(paths["fastq1"]),
                                   str(paths["fastq2"]),
                                   str(tmp_path / "nat"), rename=True)
    assert ingested is not None
    for name in ("reads.1.fastq", "reads.2.fastq", "reads.fqi",
                 "reads.names"):
        a = (tmp_path / "py" / name).read_bytes()
        b = (tmp_path / "nat" / name).read_bytes()
        assert a == b, name
    # index-only mode on the same canonical input: hardlinked fastqs +
    # identical .fqi, no .names map (nothing in the pipeline reads it)
    ingested2 = native.ingest_fastq(str(paths["fastq1"]),
                                    str(paths["fastq2"]),
                                    str(tmp_path / "nat2"))
    assert ingested2 is not None
    assert (tmp_path / "nat2" / "reads.fqi").read_bytes() == \
        (tmp_path / "py" / "reads.fqi").read_bytes()
    assert (tmp_path / "nat2" / "reads.1.fastq").read_bytes() == \
        (tmp_path / "py" / "reads.1.fastq").read_bytes()
    assert not (tmp_path / "nat2" / "reads.names").exists()
    (arr1, lens1), (arr2, lens2) = ingested
    assert len(lens1) == len(r1_py)
    for i in (0, 1, len(r1_py) - 1):
        assert arr1[i, :lens1[i]].tobytes().decode() == r1_py[i]
        assert arr2[i, :lens2[i]].tobytes().decode() == r2_py[i]


@pytest.mark.parametrize("rename", [True, False])
@pytest.mark.parametrize("style", ["rename", "mixed", "no_trailing_nl"])
def test_native_fastq_ingest_lazy_rewrite(tmp_path, style, rename):
    """The read-store writer in both modes.  rename=True (eager): every
    style produces renamed fastqs byte-identical to the Python indexer.
    rename=False (index-only default): non-canonical inputs are NOT
    rewritten — a v2 .fqi + store sidecar points into the originals —
    yet every record retrieved through ReadIndex must be byte-identical
    to what the rewrite would have stored."""
    from defuse_tpu.cluster import native
    from defuse_tpu.io.readindex import ReadIndex
    if not native.available():
        pytest.skip("native library not built")

    seqs = ["ACGTACGTAA", "TTGGCCAATT", "GGGGCCCCAA", "ATATATATGC"]

    def rec(i, end, seq, name=None, qual=None, plus="+"):
        name = name if name is not None else f"{i}/{end}"
        qual = qual if qual is not None else "I" * len(seq)
        return f"@{name}\n{seq}\n{plus}\n{qual}\n"

    for end, path in ((1, tmp_path / "in.1.fastq"),
                      (2, tmp_path / "in.2.fastq")):
        if style == "rename":
            body = "".join(rec(i, end, s, name=f"SRR1.{i} len={len(s)}",
                                qual="F" * len(s))
                           for i, s in enumerate(seqs))
        elif style == "mixed":
            body = "".join(
                rec(i, end, s) if i < 2 else
                rec(i, end, s, name=f"weird{i}", plus="+junk")
                for i, s in enumerate(seqs))
        else:  # canonical but no trailing newline on the last record
            body = "".join(rec(i, end, s)
                           for i, s in enumerate(seqs)).rstrip("\n")
        (path).write_text(body)

    r1_py, r2_py, _ = index_paired_fastq(
        str(tmp_path / "in.1.fastq"), str(tmp_path / "in.2.fastq"),
        str(tmp_path / "py"))
    ingested = native.ingest_fastq(
        str(tmp_path / "in.1.fastq"), str(tmp_path / "in.2.fastq"),
        str(tmp_path / "nat"), rename=rename)
    assert ingested is not None
    backed = not rename and style in ("rename", "mixed",
                                      "no_trailing_nl")
    if backed:
        # index-only: no renamed copy on disk, sidecar + v2 index
        # instead ("no_trailing_nl" is canonical content but an inexact
        # file tail, so it is served original-backed too)
        assert not (tmp_path / "nat" / "reads.1.fastq").exists()
        assert (tmp_path / "nat" / "reads.store.json").exists()
        assert (tmp_path / "nat" / "reads.fqi").read_bytes()[:5] == \
            b"DFQI2"
        # index-only stores skip the .names map (nothing reads it; the
        # originals hold the names)
        assert not (tmp_path / "nat" / "reads.names").exists()
    else:
        for name in ("reads.1.fastq", "reads.2.fastq", "reads.fqi",
                     "reads.names"):
            assert (tmp_path / "nat" / name).read_bytes() == \
                (tmp_path / "py" / name).read_bytes(), name
    with ReadIndex(str(tmp_path / "nat" / "reads")) as ri, \
            ReadIndex(str(tmp_path / "py" / "reads")) as ri_py:
        for i, s in enumerate(seqs):
            assert ri.get(i, 0) == s
            assert ri.get(i, 1) == s
            for end in (0, 1):
                assert ri.get_record(i, end) == ri_py.get_record(i, end)
