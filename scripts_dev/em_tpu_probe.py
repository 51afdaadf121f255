"""On-chip bisect of the device-EM axon-worker crash.

Phase 1 (``--capture``): build the bench dataset's real EMBatch on the
host and save it to an .npz so every probe attempt skips the ~40s of
dataset/ingest work.

Phase 2 (default): in THIS process (caller isolates us in a subprocess;
a worker crash kills the backend for the whole process) run run_batch on
a row range / chunk size given by argv and print a verdict line.

Usage:
  python scripts_dev/em_tpu_probe.py --capture /tmp/embatch.npz
  python scripts_dev/em_tpu_probe.py /tmp/embatch.npz <lo> <hi> <chunk>
"""
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def capture(out_path):
    import tempfile
    sys.path.insert(0, str(REPO))
    import bench
    from defuse_tpu.cluster.discordant import collect_bin_pair_tasks
    from defuse_tpu.cluster.matepair_em import EMParams
    from defuse_tpu.cluster.matepair_em_batch import prepare_batch
    from defuse_tpu.io.sam import iter_compact, load_alignments

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="em_probe_"))
    ds, paths, n_pairs = bench.build_dataset(tmp)
    params = EMParams(bench.MEAN, bench.STD, bench.PREC, bench.MINCL)
    table = load_alignments(iter_compact(paths["spanning"]))
    tasks = collect_bin_pair_tasks(table, params)
    batch = prepare_batch([(t.x, t.y, t.u) for t in tasks], params)
    np.savez_compressed(
        out_path, x=batch.x, y=batch.y, u=batch.u, n=batch.n, k=batch.k,
        r0=batch.r0, xo_idx=batch.xo_idx, yo_idx=batch.yo_idx,
        x_runend=batch.x_runend, y_runend=batch.y_runend,
        instance=batch.instance)
    print(f"captured B={len(batch.n)} N={batch.x.shape[1]} -> {out_path}")


def probe(npz_path, lo, hi, chunk):
    from defuse_tpu.cluster.matepair_em import EMParams
    from defuse_tpu.cluster.matepair_em_batch import EMBatch, run_batch
    import bench
    z = np.load(npz_path)
    sl = slice(lo, hi)
    batch = EMBatch(z["x"][sl], z["y"][sl], z["u"][sl], z["n"][sl],
                    z["k"][sl], z["r0"][sl], z["xo_idx"][sl],
                    z["yo_idx"][sl], z["x_runend"][sl], z["y_runend"][sl],
                    z["instance"][sl])
    params = EMParams(bench.MEAN, bench.STD, bench.PREC, bench.MINCL)
    import jax
    print(f"backend={jax.default_backend()} rows={hi - lo} chunk={chunk}",
          flush=True)
    t0 = time.time()
    result = run_batch(batch, params, chunk_rows=chunk)
    dt = time.time() - t0
    ncl = sum(len(v) for v in result.values())
    print(f"OK rows={hi - lo} chunk={chunk} t={dt:.2f}s "
          f"insts={len(result)} clusters={ncl}", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "--capture":
        capture(sys.argv[2])
    else:
        probe(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
              int(sys.argv[4]))
