import sys, time, pathlib, tempfile
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax; jax.config.update("jax_platforms", "cpu")
sys.argv=["bench.py"]
import bench, numpy as np
tmp = pathlib.Path(tempfile.mkdtemp())
ds, paths, n = bench.build_dataset(tmp)
from defuse_tpu.cluster.matepair_em import EMParams
from defuse_tpu.cluster import native
from defuse_tpu.cluster.setcover import run_setcover_file
from defuse_tpu.pipeline.regions import align_regions_lines
out = tmp/"o"; out.mkdir()
params = EMParams(bench.MEAN, bench.STD, bench.PREC, bench.MINCL)
native.clustermatepairs(paths["spanning"], out/"clusters", params)
run_setcover_file(str(out/"clusters"), str(out/"sc"), bench.MINCL)
(out/"regions").write_text("\n".join(align_regions_lines((out/"sc").read_text().splitlines()))+"\n")
from defuse_tpu.io.fasta import FastaStore
from defuse_tpu.core.exons import ExonRegions
from defuse_tpu.align.tasks import SplitReadRealigner, create_tasks, read_align_region_pairs
from defuse_tpu.align.batch_realign import collect_candidates, _pad_len
from defuse_tpu.ops.split_dp_batch import pad_batch
from defuse_tpu.io.sam import iter_sam
ref_store = FastaStore.from_file(str(paths["reference"]))
exons = ExonRegions.from_file(str(paths["exons"]))
tasks = create_tasks(ref_store, exons, bench.MEAN, bench.STD, bench.MINREAD, bench.MAXREAD, read_align_region_pairs(str(out/"regions")))
realigner = SplitReadRealigner()
for t_ in tasks.values(): realigner.add_task(t_)
realigner.add_reads_fastq(str(paths["fastq1"])); realigner.add_reads_fastq(str(paths["fastq2"]))
candidates = collect_candidates(realigner, iter_sam(str(paths["improper"])))
print("candidates:", len(candidates))
from defuse_tpu.ops.split_dp_batch import dp_row_maxima
# time the pieces of realign_candidates
for rep in range(2):
    t0=time.time()
    ref1s=[tasks[c.cluster_id].split_align_seq[0] for c in candidates]
    ref2s=[tasks[c.cluster_id].split_align_seq[1] for c in candidates]
    reads=[c.read_seq for c in candidates]
    R=_pad_len(max(max(len(a),len(b)) for a,b in zip(ref1s,ref2s)))
    L=_pad_len(max(len(r) for r in reads),64)
    r1p,r1l=pad_batch(ref1s,R); r2p,r2l=pad_batch([s[::-1] for s in ref2s],R)
    rp,rl=pad_batch(reads,L); rrp,_=pad_batch([s[::-1] for s in reads],L)
    t1=time.time(); print(f"  prep {t1-t0:.2f}s  B={len(candidates)} R={R} L={L}")
    rm=np.asarray(dp_row_maxima(np.concatenate([r1p,r2p]),np.concatenate([r1l,r2l]),np.concatenate([rp,rrp]),np.concatenate([rl,rl])))
    t2=time.time(); print(f"  rowmax device/XLA {t2-t1:.2f}s")
from defuse_tpu.align.batch_realign import realign_candidates
t0=time.time(); rows = realign_candidates(realigner, candidates, dp_row_maxima)
print(f"full realign_candidates {time.time()-t0:.2f}s rows={len(rows)}")

from defuse_tpu.align.batch_realign import realign_candidates_native
t0=time.time(); nrows = realign_candidates_native(realigner, candidates)
print(f"native realign {time.time()-t0:.2f}s rows={len(nrows)}")
t0=time.time(); nrows2 = realign_candidates_native(realigner, candidates)
print(f"native realign (2nd) {time.time()-t0:.2f}s")
assert [r.format() for r in rows] == [r.format() for r in nrows], "MISMATCH"
print("PARITY OK native vs XLA path")
t0=time.time()
hrows = realign_candidates(realigner, candidates, dp_row_maxima, native_enum=True)
print(f"hybrid screen+native enum {time.time()-t0:.2f}s rows={len(hrows)}")
assert [r.format() for r in rows] == [r.format() for r in hrows], "HYBRID MISMATCH"
print("PARITY OK hybrid")

from defuse_tpu.align.batch_realign import realign_candidates_screened
t0=time.time(); srows = realign_candidates_screened(realigner, candidates)
print(f"screened realign {time.time()-t0:.2f}s rows={len(srows)}")
t0=time.time(); srows2 = realign_candidates_screened(realigner, candidates)
print(f"screened realign (2nd) {time.time()-t0:.2f}s")
assert [r.format() for r in rows] == [r.format() for r in srows], "SCREEN MISMATCH"
print("PARITY OK screened")

from defuse_tpu.align.batch_realign import collect_candidates_native
t0=time.time(); ncands = collect_candidates_native(realigner, str(paths["improper"]))
print(f"native collect {time.time()-t0:.2f}s n={len(ncands)}")
assert [(c.order,c.cluster_id,c.fragment,c.read_end,c.rev_comp,c.read_seq) for c in candidates] == \
       [(c.order,c.cluster_id,c.fragment,c.read_end,c.rev_comp,c.read_seq) for c in ncands], "COLLECT MISMATCH"
print("PARITY OK native collect")
