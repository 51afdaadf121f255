"""Data-parallel sharding — ``split_fastq.pl`` / ``divide_sam_chr_pairs.pl``
equivalents plus the associative merge contracts.

The distribution model mirrors the reference (SURVEY.md §2.5) with TPU
collectives in place of the filesystem barrier:

* reads shard into ``reads_per_job`` chunks; each shard runs the aligner
  frontend independently (fragment ids are global, so shard outputs
  concatenate)
* improper/spanning alignments partition by chromosome pair; each
  partition clusters independently; ``merge_clusters`` renumbers
* additive statistics (fragment-length sums/sumsq, expression counts,
  covariance samples) merge associatively — on device via ``psum``
  (see ``__graft_entry__.dryrun_multichip``), on host via
  ``stats.readstats.merge_read_stats`` / ``merge_expression``
"""

from __future__ import annotations

import pathlib


def split_fastq(fastq1: str, fastq2: str, outdir: str,
                reads_per_job: int):
    """Shard renamed fastqs; returns the shard catalog
    (``split_fastq.pl``: catalog lists shard prefixes)."""
    out = pathlib.Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    prefixes = []

    def shard_one(path, end):
        shard = -1
        count = reads_per_job
        fh_out = None
        with open(path) as fh:
            while True:
                rec = [fh.readline() for _ in range(4)]
                if not rec[0]:
                    break
                if count >= reads_per_job:
                    if fh_out:
                        fh_out.close()
                    shard += 1
                    count = 0
                    prefix = out / f"reads.{shard}"
                    if end == 1:
                        prefixes.append(str(prefix))
                    fh_out = open(f"{prefix}.{end}.fastq", "w")
                fh_out.writelines(rec)
                count += 1
        if fh_out:
            fh_out.close()

    shard_one(fastq1, 1)
    shard_one(fastq2, 2)
    catalog = out / "reads.split.catalog"
    with open(catalog, "w") as fh:
        for p in prefixes:
            fh.write(p + "\n")
    return prefixes


def divide_spanning_by_chr_pair(rows, chrom_of):
    """Partition spanning compact rows by (sorted) chromosome pair
    (``divide_sam_chr_pairs.pl``): per fragment, the cartesian product of
    end-1 and end-2 chromosomes; rows fan out to each matching pair."""
    partitions: dict[tuple[str, str], list[str]] = {}
    current: list = []
    current_frag = None

    def flush(rows_of_frag):
        by_end: dict[int, dict[str, list[str]]] = {0: {}, 1: {}}
        for line in rows_of_frag:
            f = line.rstrip("\n").split("\t")
            chrom = chrom_of(f[2])
            by_end[int(f[1])].setdefault(chrom, []).append(line)
        if not by_end[0] or not by_end[1]:
            return
        for c1 in by_end[0]:
            for c2 in by_end[1]:
                key = tuple(sorted((c1, c2)))
                partitions.setdefault(key, []).extend(by_end[0][c1])
                partitions.setdefault(key, []).extend(by_end[1][c2])

    for line in rows:
        frag = line.split("\t", 1)[0]
        if current_frag is not None and frag != current_frag:
            flush(current)
            current = []
        current_frag = frag
        current.append(line)
    if current:
        flush(current)
    return partitions


def merge_frontend_shards(shard_results, shard_offsets, outdir):
    """Merge per-shard frontend artifacts into global-id files
    (``defuse_run.pl:387-400`` merge semantics; byte-identical to the
    unsharded run — pinned by ``tests/test_pipeline_sharded.py`` /
    ``test_frontend_sharding``).

    shard_results: list of align_job result dicts; shard_offsets: global
    fragment-id base per shard.  Returns a merged result dict.
    """
    from ..stats.readstats import merge_read_stats

    out = pathlib.Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    merged = {"spanning": out / "spanning.compact",
              "improper": out / "improper.sam",
              "concordant_sam": out / "cdna.pair.sam.gz"}
    for path in merged.values():
        if path.exists():
            path.unlink()

    def globalize(src, dst, offset, qname_style):
        # each shard appends one gzip member to a .gz destination —
        # concatenated members are a valid stream, so shard merge stays
        # append-only (reads are magic-sniffed, never extension-trusted)
        import gzip

        from ..io.sam import open_text
        if str(dst).endswith(".gz"):
            fout_ctx = gzip.open(dst, "at", compresslevel=1)
        else:
            fout_ctx = open(dst, "a")
        with open_text(src) as fin, fout_ctx as fout:
            for line in fin:
                f = line.split("\t")
                if qname_style == "frag/end":
                    frag, end = f[0].split("/")
                    f[0] = f"{int(frag) + offset}/{end}"
                else:
                    f[0] = str(int(f[0]) + offset)
                fout.write("\t".join(f))

    concordant: set[int] = set()
    blacklist: set[int] = set()
    for res, offset in zip(shard_results, shard_offsets):
        globalize(res["spanning"], merged["spanning"], offset, "frag")
        globalize(res["improper"], merged["improper"], offset,
                  "frag/end")
        globalize(res["concordant_sam"], merged["concordant_sam"],
                  offset, "sam")
        concordant |= {f + offset for f in res["concordant_fragments"]}
        blacklist |= {f + offset for f in res["blacklist"]}

    stats = merge_read_stats([r["stats"] for r in shard_results])
    return {
        "spanning": str(merged["spanning"]),
        "improper": str(merged["improper"]),
        "concordant_sam": str(merged["concordant_sam"]),
        "stats": stats,
        "concordant_fragments": concordant,
        "blacklist": blacklist,
    }
