"""Worker for scripts_dev/scaling_bench.py: one process of an N-process
data-parallel run over a pre-split fastq shard, coordinated by
jax.distributed (gloo) — the production multi-host contract: align own
shard with global fragment ids -> allgather read stats -> barrier ->
process 0 merges artifacts and runs the pipeline tail.  Usage:
scaling_worker.py <workdir> (env: JAX_COORDINATOR / JAX_NUM_PROCESSES /
JAX_PROCESS_ID).
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    work = pathlib.Path(sys.argv[1])
    meta = json.loads((work / "meta.json").read_text())

    from jax.experimental import multihost_utils

    from defuse_tpu.align.frontend import align_reads
    from defuse_tpu.cluster import native
    from defuse_tpu.config import Config
    from defuse_tpu.parallel.launch import (allgather_read_stats_sums,
                                            init_distributed)

    t_start = time.time()
    pid, n_proc = init_distributed()
    t0 = time.time()
    t_init = t0 - t_start

    config = Config.defaults(**meta["config"])
    shard = meta["shard_prefixes"][pid]
    outdir = work / f"proc{pid}"
    inputs = align_reads(config, str(outdir), f"{shard}.1.fastq",
                         f"{shard}.2.fastq",
                         frag_base=pid * int(meta["per_shard"]),
                         use_device=False)
    t_align = time.time() - t0

    sums = native.read_stats_tbl_sums(inputs["pair_table"])
    merged_stats = allgather_read_stats_sums(*sums)
    (outdir / "stats.merged").write_text(merged_stats.format())
    t_stats = time.time() - t0 - t_align
    multihost_utils.sync_global_devices("frontend_done")
    t_frontend = time.time() - t0

    outs = {}
    from defuse_tpu.parallel.launch import (DistContext,
                                            tail_partition_worker)
    ctx = DistContext(pid, n_proc) \
        if n_proc > 1 and native.available() else None
    if pid == 0:
        from defuse_tpu.pipeline.run import run_pipeline
        if n_proc > 1:
            # spanning/improper concatenate (small); the multi-GB pair
            # table is NEVER merged — run_pipeline takes the per-rank
            # parts and the stages that used to scan the concatenation
            # (read stats, covariance sampling) run part-wise with
            # bit-identical merged results
            from defuse_tpu.parallel.launch import merge_artifacts
            dirs = [work / f"proc{p}" / "aligned" for p in range(n_proc)]
            merged_dir = work / "merged"
            arts = merge_artifacts(dirs, merged_dir)
            per_shard = int(meta["per_shard"])
            pipe_inputs = dict(
                spanning=arts["spanning.compact"],
                improper=arts["improper.sam"],
                fastq1=meta["fastq1"], fastq2=meta["fastq2"],
                concordant_sam=None,
                pair_table=[str(d / "cdna.pair.tbl") for d in dirs],
                reads_sources=[
                    (str(work / f"proc{p}" / "reads" / "reads.1.fastq"),
                     str(work / f"proc{p}" / "reads" / "reads.2.fastq"),
                     p * per_shard) for p in range(n_proc)])
        else:
            pipe_inputs = dict(
                spanning=inputs["spanning"], improper=inputs["improper"],
                fastq1=meta["fastq1"], fastq2=meta["fastq2"],
                concordant_sam=None, pair_table=inputs["pair_table"],
                reads_sources=[
                    (str(work / "proc0" / "reads" / "reads.1.fastq"),
                     str(work / "proc0" / "reads" / "reads.2.fastq"),
                     0)])
        t_merge = time.time() - t0
        outs = run_pipeline(
            config=config, output_dir=str(work / "out"),
            library_name="scaling",
            gene_models_gtf=meta["gtf"], genome_fasta=meta["genome_fa"],
            repeats_regions=meta["repeats"],
            expression=meta["expression"], use_device=False,
            read_stats=merged_stats,
            dist=ctx, **pipe_inputs)
        (work / "outs.json").write_text(json.dumps(
            {k: str(v) for k, v in outs.items() if v}))
        (work / "timing.merge.json").write_text(json.dumps(
            {"merge_done_s": round(t_merge, 2)}))
    elif ctx is not None:
        # distributed pipeline tail: this rank samples covariance over
        # its own pair-table part and clusters its bin-pair partition
        # while rank 0 runs the sequential glue
        tail_partition_worker(ctx, work / "out",
                              pair_table=inputs["pair_table"])
    multihost_utils.sync_global_devices("pipeline_done")

    (work / f"timing.{pid}.json").write_text(json.dumps({
        "pid": pid, "init_s": round(t_init, 2),
        "align_s": round(t_align, 2), "stats_s": round(t_stats, 2),
        "frontend_s": round(t_frontend, 2),
        "total_s": round(time.time() - t0, 2)}))
    print(f"worker {pid}: align {t_align:.1f}s", flush=True)


if __name__ == "__main__":
    main()
