import os, pathlib, sys, tempfile, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax; jax.config.update("jax_platforms", "cpu")
sys.argv = ["bench.py"]
import bench
tmp = pathlib.Path(tempfile.mkdtemp())
t0=time.time(); ds, paths, n = bench.build_dataset(tmp); print(f"dataset build {time.time()-t0:.2f}s ({n} pairs)")

# instrument discover stages
import defuse_tpu.pipeline.discover as D
from defuse_tpu.cluster.matepair_em import EMParams
from defuse_tpu.cluster import native
out = tmp/"ours"; out.mkdir()
params = EMParams(bench.MEAN, bench.STD, bench.PREC, bench.MINCL)

for rep in range(2):
    marks=[("start",time.time())]
    clusters_path = out/"clusters"
    native.clustermatepairs(paths["spanning"], clusters_path, params)
    marks.append(("cluster(native)",time.time()))
    from defuse_tpu.cluster.setcover import run_setcover_file
    sc = out/"clusters.sc"; run_setcover_file(str(clusters_path), str(sc), bench.MINCL)
    marks.append(("setcover",time.time()))
    from defuse_tpu.pipeline.regions import align_regions_lines
    regions = out/"regions"; regions.write_text("\n".join(align_regions_lines(sc.read_text().splitlines()))+"\n")
    marks.append(("regions",time.time()))
    from defuse_tpu.io.fasta import FastaStore
    from defuse_tpu.core.exons import ExonRegions
    from defuse_tpu.align.tasks import SplitReadRealigner, create_tasks, evaluate_file, read_align_region_pairs
    from defuse_tpu.align.batch_realign import collect_candidates, realign_candidates
    from defuse_tpu.io.sam import iter_sam
    ref_store = FastaStore.from_file(str(paths["reference"]))
    exon_regions = ExonRegions.from_file(str(paths["exons"]))
    fusion_regions = read_align_region_pairs(str(regions))
    tasks = create_tasks(ref_store, exon_regions, bench.MEAN, bench.STD, bench.MINREAD, bench.MAXREAD, fusion_regions)
    realigner = SplitReadRealigner()
    for task in tasks.values(): realigner.add_task(task)
    marks.append(("tasks",time.time()))
    realigner.add_reads_fastq(str(paths["fastq1"])); realigner.add_reads_fastq(str(paths["fastq2"]))
    marks.append(("load reads",time.time()))
    candidates = collect_candidates(realigner, iter_sam(str(paths["improper"])))
    marks.append(("collect candidates",time.time()))
    from defuse_tpu.ops.split_dp_batch import dp_row_maxima as rowmax_fn
    split_rows = realign_candidates(realigner, candidates, rowmax_fn)
    marks.append(("realign",time.time()))
    split = out/"split"
    with open(split,"w") as fh:
        for row in split_rows: fh.write(row.format()+"\n")
    lines = open(split).readlines(); lines.sort(key=lambda l:(int(l.split("\t",1)[0]), l.encode()))
    sorted_p = out/"split.sorted"; open(sorted_p,"w").writelines(lines)
    marks.append(("sort",time.time()))
    outs = {nm: out/f"sr.{nm}" for nm in ("seq","break","predalign")}
    with open(outs["seq"],"w") as a, open(outs["break"],"w") as b, open(outs["predalign"],"w") as c:
        evaluate_file(tasks, str(sorted_p), a, b, c)
    marks.append(("evaluate",time.time()))
    print(f"--- rep {rep} total {marks[-1][1]-marks[0][1]:.2f}s")
    for (n1,t1),(n2,t2) in zip(marks, marks[1:]):
        print(f"  {n2:>20s} {t2-t1:6.2f}s")
