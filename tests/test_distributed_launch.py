"""Real multi-process jax.distributed launch on this machine.

The reference scales by forking alignjobs through cmdrunner submitters
(``cmdrunner.pm:161-292``) and merging shard artifacts with Perl
mergers (``merge_read_stats.pl``).  Our distribution layer
(``parallel/launch.py``) replaces that with env-wired
``jax.distributed`` SPMD; round 1 could only contract-test it.  This
test runs it for real: two OS processes, one coordination service,
4 virtual CPU devices each (8 global), gloo cross-process collectives —
asserting the global mesh forms, a jitted psum reduces across
processes, and the cross-process read-stats merge equals the
sequential ``merge_read_stats`` oracle.
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = pathlib.Path(__file__).resolve().parent / "dist_worker.py"

N_PAIRS = 500
SEED = 42


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_launch(tmp_path):
    port = _free_port()
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"report.{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(out), str(N_PAIRS),
             str(SEED)],
            env=env, cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, stderr[-3000:]

    reports = [json.loads(out.read_text()) for out in outs]
    for pid, rep in enumerate(reports):
        assert rep["pid"] == pid
        assert rep["n_proc"] == 2
        assert rep["n_devices"] == 8

    # every process saw the same merged stats, equal to the sequential
    # oracle merge of the two shards in process order
    from defuse_tpu.stats.readstats import (merge_read_stats,
                                            read_stats_from_sam)
    sys.path.insert(0, str(WORKER.parent))
    from dist_worker import synth_sam
    oracle = merge_read_stats([
        read_stats_from_sam(synth_sam(N_PAIRS, SEED, 50)),
        read_stats_from_sam(synth_sam(N_PAIRS + 1000, SEED + 1, 75)),
    ])
    assert reports[0]["merged"] == reports[1]["merged"] == oracle.format()

    # the jitted psum reduced per-device counts across both processes:
    # proc 0 contributes 100..103, proc 1 contributes 200..203
    want = sum(range(100, 104)) + sum(range(200, 204))
    assert reports[0]["psum_total"] == reports[1]["psum_total"] == want


def test_two_process_pipeline_parity(tmp_path):
    """BASELINE "2-host data-parallel parity" config: two real
    jax.distributed processes each align their fastq shard with
    globally-offset fragment ids, merge read stats through the live
    runtime, barrier, and process 0 merges the artifacts and runs the
    full pipeline — results byte-identical to a single-process whole
    run."""
    from defuse_tpu.align.frontend import align_job, index_paired_fastq
    from defuse_tpu.align.seedindex import SeedIndex
    from defuse_tpu.annotate.gene_models import GeneModels
    from defuse_tpu.config import Config
    from defuse_tpu.io.fasta import write_fasta
    from defuse_tpu.parallel.shard import split_fastq
    from defuse_tpu.pipeline.run import run_pipeline
    from synthdata import (make_dataset, write_dataset,
                           write_genome_fasta, write_gtf, write_repeats)

    ds = make_dataset(seed=31, n_fusion_frags=140, n_background_frags=100)
    paths = write_dataset(ds, tmp_path)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp_path / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    repeats = tmp_path / "repeats.regions"
    write_repeats(ds, repeats)
    cdna_fa = tmp_path / "cdna.fa"
    cdna_seqs = {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
                 for g in ds.genes}
    write_fasta(str(cdna_fa), cdna_seqs)

    reads1, reads2, _ = index_paired_fastq(
        str(paths["fastq1"]), str(paths["fastq2"]),
        str(tmp_path / "reads"))
    per_shard = (len(reads1) + 1) // 2
    prefixes = split_fastq(str(tmp_path / "reads" / "reads.1.fastq"),
                           str(tmp_path / "reads" / "reads.2.fastq"),
                           str(tmp_path / "shards"), reads_per_job=per_shard)
    assert len(prefixes) == 2

    expression = {g.name: "50" for g in ds.genes}
    meta = {
        "n_shards": 2, "per_shard": per_shard,
        "shard_prefixes": [str(p) for p in prefixes],
        "cdna_fasta": str(cdna_fa), "genome_fasta": str(genome_fa),
        "gtf": str(gtf), "reference": str(paths["reference"]),
        "exons": str(paths["exons"]), "repeats": str(repeats),
        "fastq1": str(tmp_path / "reads" / "reads.1.fastq"),
        "fastq2": str(tmp_path / "reads" / "reads.2.fastq"),
        "expression": expression,
    }
    (tmp_path / "meta.json").write_text(json.dumps(meta))

    port = _free_port()
    worker = WORKER.parent / "dist_pipeline_worker.py"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # production workers do NOT enable x64 — the gathers must be
        # bit-exact without it (conftest exports it for the suite,
        # which is exactly how the f64->f32 truncation bug escaped)
        env.pop("JAX_ENABLE_X64", None)
        env.update({
            "JAX_COORDINATOR": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(tmp_path)], env=env,
            cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed pipeline worker timed out")
        assert p.returncode == 0, stderr[-3000:]

    # single-process whole run (oracle)
    gm = GeneModels(str(gtf))
    cdna_index = SeedIndex(cdna_seqs)
    genome_index = SeedIndex(ds.genome)
    whole = align_job(cdna_index=cdna_index, genome_index=genome_index,
                      rrna_index=None, gene_models=gm, reads1=reads1,
                      reads2=reads2, outdir=str(tmp_path / "whole"))
    config = Config.defaults(
        reference_fasta=str(paths["reference"]),
        cdna_regions=str(paths["exons"]),
        span_count_threshold=3)
    outs_whole = run_pipeline(
        config=config, output_dir=str(tmp_path / "out_whole"),
        library_name="dist-parity",
        spanning=whole["spanning"], improper=whole["improper"],
        fastq1=str(tmp_path / "reads" / "reads.1.fastq"),
        fastq2=str(tmp_path / "reads" / "reads.2.fastq"),
        concordant_sam=None, pair_table=whole["pair_table"],
        gene_models_gtf=str(gtf), genome_fasta=str(genome_fa),
        repeats_regions=str(repeats), expression=expression,
        use_device=False)

    outs_dist = json.loads((tmp_path / "outs.json").read_text())
    for artifact in ("results", "classified", "filtered"):
        a = pathlib.Path(outs_whole[artifact]).read_bytes()
        b = pathlib.Path(outs_dist[artifact]).read_bytes()
        assert a == b, f"{artifact} differs (2-process vs whole)"
    assert len(pathlib.Path(
        outs_whole["results"]).read_text().splitlines()) > 1

    # the distributed read-stats merge equals the whole run's stats
    whole_stats = whole["stats"]
    for pid in range(2):
        got = (tmp_path / f"shard{pid}" / "stats.merged").read_text()
        assert f"{whole_stats.frag_count}\t" in got


def test_rank0_failure_aborts_workers(tmp_path):
    """Distributed-abort protocol (ADVICE r4 medium): a rank-0 failure
    BEFORE the clustering rendezvous must not strand ranks>0 in the
    gloo barrier.  Rank 0 fails on a missing spanning file; the
    run_pipeline wrapper publishes an abort partmeta and drains both
    barriers; rank 1 wakes, sees the abort, and exits loudly.  Both
    processes must terminate well inside the timeout."""
    from defuse_tpu.cluster import native
    if not native.available():
        pytest.skip("native library required for the partition worker")
    # empty fastqs so only the spanning file is missing
    (tmp_path / "reads.1.fastq").write_text("")
    (tmp_path / "reads.2.fastq").write_text("")

    port = _free_port()
    worker = WORKER.parent / "dist_abort_worker.py"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(tmp_path)], env=env,
            cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            outs.append(p.communicate(timeout=180))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("abort protocol hung — worker stranded in barrier")
    # rank 0 re-raised the original pipeline error after the rendezvous
    assert procs[0].returncode == 3, outs[0]
    assert "RANK0_FAILED" in outs[0][0]
    # rank 1 saw mode=abort and exited loudly instead of hanging
    assert procs[1].returncode == 5, outs[1]
    assert "WORKER_ABORTED" in outs[1][0]
    assert "abort" in outs[1][0]
