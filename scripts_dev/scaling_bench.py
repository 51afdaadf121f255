#!/usr/bin/env python
"""Multi-process scaling-efficiency measurement (VERDICT r2 item 4;
BASELINE target: >=80% efficiency at 2+ hosts).

No multi-host hardware exists in this environment, so a CPU core set
stands in for a host: each jax.distributed process is pinned (taskset)
to a disjoint core set, the processes coordinate through the real gloo
runtime (the production multi-host contract — global fragment ids,
allgather read-stats merge, barrier, artifact merge), and efficiency is
measured against a single process pinned to the SAME per-process core
budget running the whole dataset:

    eff(n) = T(1 proc @ K cores, all pairs) / (n * T(n procs @ K cores))

This isolates the coordination + merge overhead (what multi-host
scaling efficiency measures) from plain core contention on the shared
4-core box.  An unpinned 1-process headline run and byte-identity of
results.tsv across all configurations are recorded too.

Usage: python scripts_dev/scaling_bench.py [n_background_pairs]
Writes SCALING_r3.md at >=5M pairs.
"""

import json
import os
import pathlib
import random
import socket
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "scripts_dev"))

WORKER = REPO / "scripts_dev" / "scaling_worker.py"


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def warm_inputs(meta):
    """Read every input file once so each configuration starts with the
    same (warm) page-cache state — the multi-host analog is data staged
    on each host's local disk.  Without this the first run to touch a
    cold file pays shared-disk bandwidth the others don't, which is
    core-count-independent noise (measured 5x on this box)."""
    files = [meta["fastq1"], meta["fastq2"]]
    for prefix in meta["shard_prefixes"]:
        files += [f"{prefix}.1.fastq", f"{prefix}.2.fastq"]
    for f in files:
        p = pathlib.Path(f)
        if p.exists():
            with open(p, "rb") as fh:
                while fh.read(1 << 24):
                    pass


def run_config(work, meta, n_proc, cores_per_proc, label):
    """Launch n_proc pinned workers; returns timing dict."""
    work.mkdir(parents=True, exist_ok=True)
    (work / "meta.json").write_text(json.dumps(meta))
    warm_inputs(meta)
    port = free_port()
    procs = []
    t0 = time.time()
    for pid in range(n_proc):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR": f"localhost:{port}",
            "JAX_NUM_PROCESSES": str(n_proc),
            "JAX_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "DEFUSE_ALIGNJOB_TIMING": "1",
        })
        cores = ",".join(str(c) for c in range(
            pid * cores_per_proc, (pid + 1) * cores_per_proc))
        cmd = [sys.executable, str(WORKER), str(work)]
        if cores_per_proc:
            cmd = ["taskset", "-c", cores] + cmd
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    for pid, p in enumerate(procs):
        stdout, stderr = p.communicate(timeout=7200)
        (work / f"worker.{pid}.log").write_text(stdout + "\n" + stderr)
        if p.returncode != 0:
            print(stderr[-4000:], file=sys.stderr)
            raise RuntimeError(f"{label}: worker failed")
    wall = time.time() - t0
    timings = [json.loads((work / f"timing.{pid}.json").read_text())
               for pid in range(n_proc)]
    frontend = max(t["frontend_s"] for t in timings)
    rep = {"label": label, "n_proc": n_proc,
           "cores_per_proc": cores_per_proc,
           "frontend_s": frontend, "wall_s": round(wall, 1),
           "per_proc": timings,
           "results": str(work / "out" / "results.tsv")}
    print(json.dumps(rep), flush=True)
    return rep


def main(n_background=10_000_000, workdir=None):
    from sim_validation import generate
    from defuse_tpu.align.seedindex import SeedIndex
    from defuse_tpu.io.fasta import write_fasta
    from defuse_tpu.parallel.shard import split_fastq
    from scale10m import write_fastqs
    from synthdata import SynthDataset, write_genome_fasta, write_gtf, \
        write_repeats

    if workdir:  # persistent workdir: reuse the generated dataset
        tmp = pathlib.Path(workdir)
        tmp.mkdir(parents=True, exist_ok=True)
    else:
        tmp = pathlib.Path(tempfile.mkdtemp(
            prefix="defuse_scaling_%d_" % os.getpid()))
    rng = random.Random(777)
    print(f"workdir {tmp}", flush=True)
    t0 = time.time()

    DATASET_VERSION = 2  # v2: shuffled read order (sim_validation)
    reuse = (tmp / "dataset_meta.json").exists()
    if reuse:
        dm = json.loads((tmp / "dataset_meta.json").read_text())
        if dm["n_background"] != n_background \
                or dm.get("version") != DATASET_VERSION \
                or "n_pairs" not in dm or "gene_names" not in dm:
            reuse = False
    gtf = tmp / "genes.gtf"
    genome_fa = tmp / "genome.fa"
    repeats = tmp / "repeats.regions"
    cdna_fa = tmp / "cdna.fa"
    ref_fa = tmp / "reference.fa"
    regions = tmp / "cdna.regions"
    fq1, fq2 = tmp / "reads.1.fastq", tmp / "reads.2.fastq"
    if reuse:
        # dataset files are already on disk; everything the runs need
        # from the generator is recorded in the meta sidecar (the 50M
        # generate() alone costs ~10 CPU-minutes)
        n_pairs = dm["n_pairs"]
        gene_names = dm["gene_names"]
    else:
        genome, genes, reads1, reads2, truth, _nf = generate(
            rng, n_background)
        n_pairs = len(reads1)
        gene_names = [g.name for g in genes]
        print(f"generated {n_pairs} pairs in {time.time() - t0:.0f}s",
              flush=True)

        ds = SynthDataset(genome, genes, ("", 0, "", 0), "", [], [], [])
        # shard dirs are derived from the fastqs — never serve stale ones
        import shutil as _sh0
        for d in tmp.glob("shards*"):
            _sh0.rmtree(d, ignore_errors=True)
        write_gtf(ds, gtf)
        write_genome_fasta(ds, genome_fa)
        write_repeats(ds, repeats)
        cdna_seqs = {f"{g.name}|{g.transcript}": g.cdna(genome) + "A" * 50
                     for g in genes}
        write_fasta(str(cdna_fa), cdna_seqs)
        allseq = dict(genome)
        allseq.update(cdna_seqs)
        write_fasta(str(ref_fa), allseq)
        with open(regions, "w") as out:
            for g in genes:
                fields = [g.name, g.transcript, g.chromosome,
                          "+" if g.strand == 0 else "-"]
                for s, e in g.exons:
                    fields += [str(s), str(e)]
                out.write("\t".join(fields) + "\t\n")
        write_fastqs(reads1, reads2, fq1, fq2)
        (tmp / "dataset_meta.json").write_text(json.dumps(
            {"n_background": n_background,
             "version": DATASET_VERSION,
             "n_pairs": n_pairs, "gene_names": gene_names}))
        del reads1, reads2
    for fa in (cdna_fa, genome_fa):
        SeedIndex.load_or_build(str(fa))  # one-time create-ref build
    print(f"dataset files in {time.time() - t0:.0f}s "
          f"(reused={reuse})", flush=True)

    config_kw = dict(
        reference_fasta=str(ref_fa), cdna_regions=str(regions),
        cdna_fasta=str(cdna_fa), genome_fasta=str(genome_fa),
        gene_models=str(gtf), span_count_threshold=5,
        reads_per_job=1_000_000)

    def meta_for(n_proc):
        per_shard = (n_pairs + n_proc - 1) // n_proc
        if n_proc == 1:
            prefixes = [str(tmp / "reads")]
        elif (tmp / f"shards{n_proc}" / "done").exists():
            prefixes = sorted(
                str(p)[:-len(".1.fastq")] for p in
                (tmp / f"shards{n_proc}").glob("*.1.fastq"))
        else:
            prefixes = [str(p) for p in split_fastq(
                str(fq1), str(fq2), str(tmp / f"shards{n_proc}"),
                reads_per_job=per_shard)]
            (tmp / f"shards{n_proc}" / "done").touch()
        assert len(prefixes) == n_proc
        return {
            "config": config_kw, "per_shard": per_shard,
            "shard_prefixes": prefixes,
            "fastq1": str(fq1), "fastq2": str(fq2), "gtf": str(gtf),
            "genome_fa": str(genome_fa), "repeats": str(repeats),
            "expression": {n: "10" for n in gene_names},
        }

    ncpu = os.cpu_count() or 4
    meta1 = meta_for(1)
    import shutil as _sh
    configs = {
        "1p_all": ("r1all", meta1, 1, ncpu),
        "1p_2c": ("r1h", meta1, 1, ncpu // 2),
        "2p_2c": ("r2", meta_for(2), 2, ncpu // 2),
        "1p_1c": ("r1q", meta1, 1, 1),
        "4p_1c": ("r4", meta_for(4), 4, 1),
    }
    only = os.environ.get("DEFUSE_SCALING_ONLY", "").split(",")
    only = [o for o in only if o]
    runs = {}
    for label, (sub, meta_c, n, cores) in configs.items():
        if only and label not in only:
            continue
        _sh.rmtree(tmp / sub, ignore_errors=True)  # fresh run dir
        runs[label] = run_config(tmp / sub, meta_c, n, cores, label)
    if only:
        return runs

    eff2 = runs["1p_2c"]["frontend_s"] / (2 * runs["2p_2c"]["frontend_s"])
    eff4 = runs["1p_1c"]["frontend_s"] / (4 * runs["4p_1c"]["frontend_s"])
    weff2 = runs["1p_2c"]["wall_s"] / (2 * runs["2p_2c"]["wall_s"])
    weff4 = runs["1p_1c"]["wall_s"] / (4 * runs["4p_1c"]["wall_s"])

    ident = {}
    base = pathlib.Path(runs["1p_all"]["results"]).read_bytes()
    for k in ("1p_2c", "2p_2c", "1p_1c", "4p_1c"):
        ident[k] = pathlib.Path(runs[k]["results"]).read_bytes() == base

    report = {
        "n_read_pairs": n_pairs,
        "pairs_s_1proc": round(n_pairs / runs["1p_all"]["frontend_s"]),
        "pairs_s_2proc": round(n_pairs / runs["2p_2c"]["frontend_s"]),
        "pairs_s_4proc": round(n_pairs / runs["4p_1c"]["frontend_s"]),
        "efficiency_2proc": round(eff2, 3),
        "efficiency_4proc": round(eff4, 3),
        "wall_efficiency_2proc": round(weff2, 3),
        "wall_efficiency_4proc": round(weff4, 3),
        "frontend_s": {k: r["frontend_s"] for k, r in runs.items()},
        "wall_s": {k: r["wall_s"] for k, r in runs.items()},
        "results_identical": ident,
    }
    print(json.dumps(report), flush=True)

    if n_pairs >= 5_000_000:
        md = REPO / "SCALING_r5.md"
        md.write_text(
            "# Multi-process scaling efficiency (round 5)\n\n"
            f"{n_pairs} read pairs through the production jax.distributed"
            " data-parallel contract (gloo coordination, global fragment"
            " ids, exact-sums read-stats allgather, distributed"
            " clustering AND covariance sampling, grouped shard read"
            " stores), each process pinned (taskset) to a disjoint core"
            " set of the 4-core host — a core set stands in for a host,"
            " so\n\n"
            "    eff(n) = T(1 proc @ K cores, all pairs)"
            " / (n * T(n procs @ K cores each, 1/n pairs))\n\n"
            "isolates coordination + merge overhead from plain core"
            " contention.  `pairs_s_*`/`efficiency_*` are frontend-stage"
            " rates; `wall_efficiency_*` covers the WHOLE run including"
            " every rank-0 serial stage (VERDICT r4 item 5: the ≥80%"
            " BASELINE target is judged on wall, at this 50M depth).\n\n"
            "Round-5 changes vs SCALING_r4 — the distributed-tail"
            " redesign (see the 0e5356e commit): the multi-GB"
            " concatenated pair table is never built (run_pipeline"
            " takes the per-rank parts directly); read stats pass"
            " through from the frontend's exact-sums allgather"
            " (bit-identical: integer sums in doubles); covariance"
            " sampling runs per rank over its own part with a"
            " rank-order binary merge on rank 0 (bit-identical drand48"
            " stream); and the realign driver preads candidates through"
            " a grouped read store over the shard stores each rank"
            " already indexed, replacing a ~12s whole-library .fqi"
            " scan.  Rank-0 serial tail at 50M: 38s -> ~12s.\n\n"
            "| metric | value |\n|---|---|\n" +
            "".join(f"| {k} | {json.dumps(v)} |\n"
                    for k, v in report.items()) +
            f"\nBASELINE target: >=80% at 2+ hosts -> measured "
            f"{eff2:.1%} at 2 processes, {eff4:.1%} at 4"
            f" (wall: {weff2:.1%} / {weff4:.1%}).\n"
            "Page-cache warmth gives ±5-10% run-to-run variance on the"
            " shared box; an efficiency above 1.0 reads as 'within"
            " noise of 1.0'.\n"
            "results.tsv byte-identical across all configurations: "
            f"{all(ident.values())}.\n\n"
            "Generated by scripts_dev/scaling_bench.py (seed 777).\n")
        print(f"wrote {md}")
    return report


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    wd = sys.argv[2] if len(sys.argv) > 2 else None
    try:
        main(n, workdir=wd)
    finally:
        if wd is None:  # persistent workdirs are the caller's to clean
            import glob
            import shutil
            for d in glob.glob(tempfile.gettempdir()
                               + "/defuse_scaling_%d_*" % os.getpid()):
                shutil.rmtree(d, ignore_errors=True)
