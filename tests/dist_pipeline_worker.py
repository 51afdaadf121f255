"""Worker for tests/test_distributed_launch.py's 2-process pipeline
parity run (BASELINE "2-host data-parallel parity" config).

Each process aligns its fastq shard with globally-offset fragment ids
(the production ``frag_base`` contract), merges read stats across
processes through the live distributed runtime, barriers, and process 0
merges the shard artifacts and runs the full pipeline tail.  The test
asserts process 0's results are byte-identical to a single-process
whole run.  Usage: dist_pipeline_worker.py <workdir>.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")


def reads_of(path):
    out = []
    with open(path) as fh:
        while True:
            h = fh.readline()
            if not h:
                break
            out.append(fh.readline().rstrip("\n"))
            fh.readline()
            fh.readline()
    return out


def main():
    work = pathlib.Path(sys.argv[1])
    meta = json.loads((work / "meta.json").read_text())

    from jax.experimental import multihost_utils

    from defuse_tpu.align.frontend import align_job
    from defuse_tpu.align.seedindex import SeedIndex
    from defuse_tpu.annotate.gene_models import GeneModels
    from defuse_tpu.config import Config
    from defuse_tpu.io.fasta import FastaStore
    from defuse_tpu.parallel.launch import (allgather_read_stats,
                                            init_distributed)

    pid, n_proc = init_distributed()
    assert n_proc == int(meta["n_shards"])

    # deterministic index build from the shared dataset files
    cdna = FastaStore.from_file(meta["cdna_fasta"])
    cdna_index = SeedIndex({name: cdna.sequence(name)
                            for name in cdna._seqs})
    genome = FastaStore.from_file(meta["genome_fasta"])
    genome_index = SeedIndex({name: genome.sequence(name)
                              for name in genome._seqs})
    gm = GeneModels(meta["gtf"])

    prefix = meta["shard_prefixes"][pid]
    shard_dir = work / f"shard{pid}"
    res = align_job(cdna_index=cdna_index, genome_index=genome_index,
                    rrna_index=None, gene_models=gm,
                    reads1=reads_of(f"{prefix}.1.fastq"),
                    reads2=reads_of(f"{prefix}.2.fastq"),
                    outdir=str(shard_dir),
                    frag_base=pid * int(meta["per_shard"]))

    # cross-process read-stats merge over the live runtime: exact raw
    # sums when native can scan the part table (bit-identical to a
    # whole-table scan), reconstruction merge otherwise
    from defuse_tpu.cluster import native as _nat
    sums = _nat.read_stats_tbl_sums(shard_dir / "cdna.pair.tbl") \
        if _nat.available() else None
    if sums is not None:
        from defuse_tpu.parallel.launch import allgather_read_stats_sums
        merged_stats = allgather_read_stats_sums(*sums)
    else:
        merged_stats = allgather_read_stats(res["stats"])
    (shard_dir / "stats.merged").write_text(merged_stats.format())

    # every shard's artifacts must be on disk before process 0 merges
    multihost_utils.sync_global_devices("frontend_done")

    # distributed pipeline tail: rank 0 runs the pipeline with a
    # DistContext, every other rank clusters its bin-pair partition —
    # the byte-identity assertion then pins the whole distributed
    # protocol (partition, barriers, sidecar merge) under real gloo
    from defuse_tpu.cluster import native as _native
    from defuse_tpu.parallel.launch import (DistContext,
                                            tail_partition_worker)
    ctx = DistContext(pid, n_proc) \
        if n_proc > 1 and _native.available() else None
    if pid != 0 and ctx is not None:
        tail_partition_worker(ctx, work / "out_dist",
                              pair_table=shard_dir / "cdna.pair.tbl")

    if pid == 0:
        from defuse_tpu.parallel.launch import merge_artifacts
        from defuse_tpu.pipeline.run import run_pipeline

        shard_dirs = [work / f"shard{p}" for p in range(n_proc)]
        merged_dir = work / "merged"
        merged = merge_artifacts(shard_dirs, merged_dir)
        # frag_base already globalized the ids at emission time, so
        # the per-rank tables ARE the concatenated table's parts: pass
        # them as-is (the multi-GB concatenation is never built) and
        # let the read-stats/calccov stages merge part-wise —
        # bit-identity vs the single-process whole run is this test's
        # core assertion
        config = Config.defaults(
            reference_fasta=meta["reference"],
            cdna_regions=meta["exons"],
            span_count_threshold=3)
        outs = run_pipeline(
            config=config, output_dir=str(work / "out_dist"),
            library_name="dist-parity",
            spanning=merged["spanning.compact"],
            improper=merged["improper.sam"],
            fastq1=meta["fastq1"], fastq2=meta["fastq2"],
            concordant_sam=None,
            read_stats=merged_stats,
            pair_table=[str(d / "cdna.pair.tbl")
                        for d in shard_dirs],
            gene_models_gtf=meta["gtf"],
            genome_fasta=meta["genome_fasta"],
            repeats_regions=meta["repeats"],
            expression=meta["expression"], use_device=False,
            dist=ctx)
        (work / "outs.json").write_text(json.dumps(
            {k: str(v) for k, v in outs.items() if v}))
    # keep every process alive until the files are written
    multihost_utils.sync_global_devices("pipeline_done")
    print(f"worker {pid}: ok", flush=True)


if __name__ == "__main__":
    main()
