import sys, time, pathlib, tempfile
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax; jax.config.update("jax_platforms", "cpu")
sys.argv=["bench.py"]
import bench, os
tmp = pathlib.Path(tempfile.mkdtemp())
ds, paths, n = bench.build_dataset(tmp)
from defuse_tpu.cluster.matepair_em import EMParams
from defuse_tpu.cluster import native
params = EMParams(bench.MEAN, bench.STD, bench.PREC, bench.MINCL)
print("cpus:", os.cpu_count())
for nt in (1, 2, 3, 4, 6, 8):
    t0=time.time()
    native.clustermatepairs(paths["spanning"], tmp/f"c{nt}", params, n_threads=nt)
    print(f"threads={nt}: {time.time()-t0:.2f}s")
import hashlib
h = {nt: hashlib.md5((tmp/f"c{nt}").read_bytes()).hexdigest() for nt in (1,3,8)}
print("identical:", len(set(h.values()))==1)
