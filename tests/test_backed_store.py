"""Original-backed read stores end-to-end.

The index-only ingest (the default) never rewrites a non-canonical
library: the .fqi v2 index points into the ORIGINAL fastqs and every
consumer — the realign driver's selective pread, the lazy pair-SAM
regeneration, the denovo read loader, get-reads retrieval — synthesizes
canonical records on demand.  The pipeline's outputs must be
byte-identical to an eager-rename (DEFUSE_EAGER_RENAME=1) run, which is
itself pinned byte-identical to the Python indexer by
test_frontend_native.
"""

import subprocess
import sys

from synthdata import make_dataset, write_dataset, write_genome_fasta, \
    write_gtf, write_repeats

ENV = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
       "JAX_PLATFORMS": "cpu", "HOME": "/root"}


def _decanon(src, dst, end):
    """Rewrite canonical @i/end headers as SRA-style names + real quals
    so the ingest cannot take the hardlink path."""
    out = []
    with open(src) as fh:
        i = 0
        while True:
            header = fh.readline()
            if not header:
                break
            seq = fh.readline().rstrip("\n")
            fh.readline()
            fh.readline()
            out.append(f"@SRR9.{i} {i} length={len(seq)}\n{seq}\n"
                       f"+\n{'F' * len(seq)}\n")
            i += 1
    dst.write_text("".join(out))


def test_backed_store_pipeline_parity(tmp_path):
    ds = make_dataset(seed=13)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp_path / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    write_repeats(ds, tmp_path / "repeats.regions")

    fq1, fq2 = tmp_path / "lib.1.fastq", tmp_path / "lib.2.fastq"
    _decanon(paths["fastq1"], fq1, 1)
    _decanon(paths["fastq2"], fq2, 2)

    dataset = tmp_path / "dataset"
    config = tmp_path / "config.txt"
    config.write_text("\n".join([
        f"genome_fasta = {genome_fa}",
        f"gene_models = {gtf}",
        "gene_biotypes = synth",
        "chromosomes = 1,2",
        "span_count_threshold = 3",
        f"repeats_regions = {tmp_path}/repeats.regions",
        "dataset_prefix = $(dataset_directory)/defuse",
        "cdna_regions = $(dataset_prefix).cdna.regions",
        "cdna_fasta = $(dataset_prefix).cdna.fa",
        "exons_fasta = $(dataset_prefix).exons.fa",
        "cds_fasta = $(dataset_prefix).cds.fa",
        "reference_fasta = $(dataset_prefix).reference.fa",
        "rrna_fasta = $(dataset_prefix).rrna.fa",
        "ig_gene_list = $(dataset_prefix).ig.gene.list",
    ]) + "\n")

    proc = subprocess.run(
        [sys.executable, "-m", "defuse_tpu", "create-ref",
         "-c", str(config), "-d", str(dataset)],
        capture_output=True, text=True, env=ENV, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]

    results = {}
    for mode, extra_env in (("backed", {}),
                            ("eager", {"DEFUSE_EAGER_RENAME": "1"})):
        out = tmp_path / f"out_{mode}"
        proc = subprocess.run(
            [sys.executable, "-m", "defuse_tpu", "run",
             "-c", str(config), "-d", str(dataset), "-o", str(out),
             "-1", str(fq1), "-2", str(fq2),
             "-n", "backed-parity", "--no-device"],
            capture_output=True, text=True, env=ENV | extra_env,
            cwd="/root/repo")
        assert proc.returncode == 0, proc.stderr[-3000:]
        results[mode] = out

    backed, eager = results["backed"], results["eager"]
    # the whole point: no renamed copy in the backed run
    assert not (backed / "reads" / "reads.1.fastq").exists()
    assert (backed / "reads" / "reads.store.json").exists()
    assert (eager / "reads" / "reads.1.fastq").exists()
    assert not (eager / "reads" / "reads.store.json").exists()

    for name in ("results.tsv", "results.classify.tsv",
                 "results.filtered.tsv", "clusters.sc",
                 "splitreads.seq", "splitreads.break"):
        assert (backed / name).read_bytes() == \
            (eager / name).read_bytes(), name

    # evidence retrieval through the backed store: fastq export must
    # synthesize records byte-identical to the eager run's
    rows = (backed / "results.tsv").read_text().splitlines()
    cid = rows[1].split("\t")[0]
    exports = {}
    for mode, out in results.items():
        e1 = tmp_path / f"sup_{mode}.1.fastq"
        e2 = tmp_path / f"sup_{mode}.2.fastq"
        proc = subprocess.run(
            [sys.executable, "-m", "defuse_tpu", "get-reads",
             "-c", str(config), "-d", str(dataset), "-o", str(out),
             "-i", cid, "--fastq1", str(e1), "--fastq2", str(e2)],
            capture_output=True, text=True, env=ENV, cwd="/root/repo")
        assert proc.returncode == 0, proc.stderr[-2000:]
        exports[mode] = e1.read_bytes() + e2.read_bytes()
    assert exports["backed"] == exports["eager"]
    assert exports["backed"]


def test_backed_store_stale_original_fails_loudly(tmp_path):
    """A modified original must fail store resolution, never serve
    wrong reads."""
    import pytest

    from defuse_tpu.cluster import native
    from defuse_tpu.io.readindex import ReadIndex
    if not native.available():
        pytest.skip("native library not built")
    fq1, fq2 = tmp_path / "a.1.fq", tmp_path / "a.2.fq"
    recs = "".join(f"@r{i} x\nACGTACGT\n+\nFFFFFFFF\n" for i in range(4))
    fq1.write_text(recs)
    fq2.write_text(recs)
    assert native.ingest_fastq(str(fq1), str(fq2),
                               str(tmp_path / "st")) is not None
    with ReadIndex(str(tmp_path / "st" / "reads")) as ri:
        assert ri.get(2, 0) == "ACGTACGT"
    fq1.write_text(recs + "@extra y\nTTTT\n+\nFFFF\n")
    with pytest.raises((ValueError, FileNotFoundError)):
        ReadIndex(str(tmp_path / "st" / "reads"))


def test_backed_store_truncated_fqi_fails_loudly(tmp_path):
    """A truncated .fqi behind a valid-looking sidecar must fail store
    resolution (ADVICE r4: a crash between the sidecar commit and the
    index write used to let high fragment ids resolve to None)."""
    import pytest

    from defuse_tpu.cluster import native
    from defuse_tpu.io.readindex import ReadIndex, read_store
    if not native.available():
        pytest.skip("native library not built")
    fq1, fq2 = tmp_path / "a.1.fq", tmp_path / "a.2.fq"
    recs = "".join(f"@r{i} x\nACGTACGT\n+\nFFFFFFFF\n" for i in range(8))
    fq1.write_text(recs)
    fq2.write_text(recs)
    assert native.ingest_fastq(str(fq1), str(fq2),
                               str(tmp_path / "st")) is not None
    prefix = str(tmp_path / "st" / "reads")
    # sanity: the sidecar carries the fragment count and the store opens
    import json
    store = json.loads((tmp_path / "st" / "reads.store.json").read_text())
    assert store["n_fragments"] == 8
    read_store(prefix)
    # simulate the interrupted-ingest crash window: index truncated
    fqi = tmp_path / "st" / "reads.fqi"
    fqi.write_bytes(fqi.read_bytes()[:-16])
    with pytest.raises(ValueError, match="truncated"):
        read_store(prefix)
    with pytest.raises(ValueError, match="truncated"):
        ReadIndex(prefix)
