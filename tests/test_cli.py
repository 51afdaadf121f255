"""CLI surface test: create-ref + run + get-reads exactly as the README
documents, via python -m defuse_tpu."""

import subprocess
import sys

from synthdata import make_dataset, write_dataset, write_genome_fasta, \
    write_gtf, write_repeats


def test_cli_end_to_end(tmp_path):
    ds = make_dataset(seed=7)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp_path / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    write_repeats(ds, tmp_path / "repeats.regions")

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

    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root"}

    proc = subprocess.run(
        [sys.executable, "-m", "defuse_tpu", "create-ref",
         "-c", str(config), "-d", str(dataset)],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr
    assert (dataset / "defuse.cdna.fa").exists()

    out = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, "-m", "defuse_tpu", "run",
         "-c", str(config), "-d", str(dataset), "-o", str(out),
         "-1", str(paths["fastq1"]), "-2", str(paths["fastq2"]),
         "-n", "cli-test", "--no-device"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]
    results = (out / "results.tsv").read_text().splitlines()
    assert len(results) >= 2
    header = results[0].split("\t")
    g1 = header.index("gene1")
    g2 = header.index("gene2")
    assert any({r.split("\t")[g1], r.split("\t")[g2]} == {"GA", "GB"}
               for r in results[1:])

    # get-reads for the first cluster id present
    cid = results[1].split("\t")[0]
    proc = subprocess.run(
        [sys.executable, "-m", "defuse_tpu", "get-reads",
         "-c", str(config), "-d", str(dataset), "-o", str(out),
         "-i", cid],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Split Reads:" in proc.stdout
    assert "Spanning Reads:" in proc.stdout

    # batch fastq export (get_fusion_fastq.pl --list contract)
    idlist = tmp_path / "ids.txt"
    idlist.write_text(cid + "\n")
    fq1, fq2 = tmp_path / "sup.1.fastq", tmp_path / "sup.2.fastq"
    proc = subprocess.run(
        [sys.executable, "-m", "defuse_tpu", "get-reads",
         "-c", str(config), "-d", str(dataset), "-o", str(out),
         "-l", str(idlist), "--fastq1", str(fq1), "--fastq2", str(fq2)],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    recs1 = fq1.read_text().splitlines()
    recs2 = fq2.read_text().splitlines()
    assert recs1 and len(recs1) % 4 == 0 and len(recs1) == len(recs2)
    assert recs1[0].startswith(f"@{cid}_") and recs1[0].endswith("/1")
    assert recs2[0].endswith("/2")
    # paired: same renamed fragment order in both ends
    assert [l[:-2] for l in recs1[::4]] == [l[:-2] for l in recs2[::4]]
    # exported sequences really are the library's reads
    lib1 = {line for line in paths["fastq1"].read_text().splitlines()
            if set(line) <= set("ACGTN")}
    assert set(recs1[1::4]) <= lib1

    # approximate cluster sequences (get_fusion_sequences.pl)
    proc = subprocess.run(
        [sys.executable, "-m", "defuse_tpu", "cluster-sequences",
         "-r", str(dataset / "defuse.reference.fa"),
         "--clusters", str(out / "clusters.sc")],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    fasta = proc.stdout.splitlines()
    assert fasta and fasta[0].startswith(">")
    seqs = {fasta[i][1:]: fasta[i + 1] for i in range(0, len(fasta), 2)}
    assert cid in seqs
    flank1, _n, flank2 = seqs[cid].partition("N")
    assert _n == "N" and len(flank1) > 20 and len(flank2) > 20
    # each flank is a real reference substring (orientation per strand)
    ref_txt = (dataset / "defuse.reference.fa").read_text()
    refseq = "".join(line for line in ref_txt.splitlines()
                     if not line.startswith(">"))
    from defuse_tpu.core.types import revcomp as _rc
    assert flank1 in refseq or _rc(flank1) in refseq
    assert flank2 in refseq or _rc(flank2) in refseq

def test_cli_run_device_requested_host_fallback(tmp_path):
    """`run` WITHOUT --no-device on a host with no usable TPU: the
    bounded probe must fall back to the native path and still produce
    results (no hang, no crash)."""
    ds = make_dataset(seed=9)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp_path / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    write_repeats(ds, tmp_path / "repeats.regions")

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

    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root",
           # the probe must see a non-TPU verdict without spawning jax
           "DEFUSE_ASSUME_BACKEND": "cpu"}

    proc = subprocess.run(
        [sys.executable, "-m", "defuse_tpu", "create-ref",
         "-c", str(config), "-d", str(dataset)],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr

    out = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, "-m", "defuse_tpu", "run",
         "-c", str(config), "-d", str(dataset), "-o", str(out),
         "-1", str(paths["fastq1"]), "-2", str(paths["fastq2"]),
         "-n", "cli-dev"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (out / "results.tsv").exists()


def test_cli_run_accepts_bam_input(tmp_path):
    """`run --bam` converts through the built-in bamfastq (defuse.pl
    --bam contract) and produces the same fastq pair the bamfastq
    subcommand would; the conversion happens before the frontend, so we
    only assert the converted inputs here (the full pipeline over
    converted reads is covered by the fastq-driven e2e test)."""
    import pathlib

    from defuse_tpu.cli.main import main as cli_main
    from defuse_tpu.io.bam import bam_to_fastq

    bam = "/root/reference/tools/discordant.aligned.bam"
    if not pathlib.Path(bam).exists():
        import pytest
        pytest.skip("reference BAM fixture unavailable")

    # what run --bam should produce as its converted inputs
    want1 = tmp_path / "want.1.fastq"
    want2 = tmp_path / "want.2.fastq"
    bam_to_fastq(bam, str(want1), str(want2))

    # a run with --bam fails later (the fixture's reads don't match any
    # dataset), but the conversion must land first; give it a config
    # that fails fast at the dataset stage and assert the converted
    # fastqs appeared with the right bytes
    cfg = tmp_path / "config.txt"
    cfg.write_text("reference_fasta = /nonexistent.fa\n"
                   "cdna_regions = /nonexistent.regions\n")
    out = tmp_path / "out"
    try:
        cli_main(["run", "-c", str(cfg), "-d", str(tmp_path),
                  "-o", str(out), "--bam", bam, "--no-device"])
    except Exception:
        pass
    got1 = out / "bamfastq" / "reads.1.fastq"
    got2 = out / "bamfastq" / "reads.2.fastq"
    assert got1.exists() and got2.exists()
    assert got1.read_bytes() == want1.read_bytes()
    assert got2.read_bytes() == want2.read_bytes()

    # --bam and -1/-2 are mutually exclusive
    import pytest
    with pytest.raises(SystemExit):
        cli_main(["run", "-c", str(cfg), "-d", str(tmp_path),
                  "-o", str(out), "--bam", bam, "-1", "x", "-2", "y"])
