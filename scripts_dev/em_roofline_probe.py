#!/usr/bin/env python
"""Device-EM attribution probe (VERDICT r3 item 2): where does the
warm device EM time go at bench shapes, and does the device win the
large-instance regime?

Part A — bench shapes: rebuilds the exact bench-dataset EM workload
(381 instances via collect_bin_pair_tasks), runs the production
bucketed/segmented driver with per-slab timing split into
  t_call    — em() dispatch return (uploads + enqueue)
  t_device  — block_until_ready minus t_call (device compute)
  t_pull    — np.asarray of every returned buffer (downlink)
and reports per-(bucket, segment) and total attribution.

Part B — large-instance regime: synthetic G-component instances at
N in {512, 2048, 8192}; native C++ em_cluster_batch wall vs device
run_batch wall (warm pass), decisions compared.

Usage: python scripts_dev/em_roofline_probe.py [A|B|AB]
Prints EM_PROBE_A / EM_PROBE_B JSON lines.
"""

import json
import pathlib
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np


def bench_instances():
    """The exact EM instances the bench's em_ablation times."""
    import bench
    from defuse_tpu.cluster.discordant import collect_bin_pair_tasks
    from defuse_tpu.cluster.matepair_em import EMParams
    from defuse_tpu.io.sam import iter_compact, load_alignments

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="em_probe_"))
    ds, paths, n_pairs = bench.build_dataset(tmp)
    params = EMParams(bench.MEAN, bench.STD, bench.PREC, bench.MINCL)
    table = load_alignments(iter_compact(paths["spanning"]))
    tasks = collect_bin_pair_tasks(table, params)
    return [(t.x.astype(float), t.y.astype(float), t.u.astype(float))
            for t in tasks], params


def part_a():
    import jax
    import jax.numpy as jnp

    from defuse_tpu.cluster import matepair_em_batch as mb

    instances, params = bench_instances()
    batch = mb.prepare_batch(instances, params)
    rows = len(batch.n)
    em = mb.make_em_step(params.fragment_stddev)
    dtype = jnp.float32
    np_dtype = np.dtype("float32")
    chunk = mb.TPU_CHUNK_ROWS

    n_buckets = mb._shape_buckets(batch.x.shape[1])
    kmax = batch.r0.shape[1]
    k_buckets = [min(b, kmax) for b in mb.K_BUCKETS if b < kmax] + [kmax]
    groups = {}
    for i in range(rows):
        key = (mb._bucket_of(int(batch.k[i]), k_buckets),
               mb._bucket_of(int(batch.n[i]), n_buckets))
        groups.setdefault(key, []).append(i)

    stats = []
    total = {"t_call": 0.0, "t_device": 0.0, "t_pull": 0.0,
             "up_MB": 0.0, "down_MB": 0.0, "slabs": 0}
    n_segments = -(-mb.MAX_ITERS // mb.SEGMENT_ITERS)
    t_all0 = time.time()
    for (kb, nb), idx_list in sorted(groups.items()):
        idx = np.asarray(idx_list, np.intp)
        r_state = np.ascontiguousarray(batch.r0[idx][:, :kb, :nb], np_dtype)
        ll_state = np.full(len(idx), -mb.BIG, np_dtype)
        for seg in range(n_segments):
            last = seg == n_segments - 1
            keep_idx, keep_r, keep_ll = [], [], []
            live0 = len(idx)
            for lo in range(0, len(idx), chunk):
                hi = min(lo + chunk, len(idx))
                sel = np.arange(lo, hi)
                if hi - lo < chunk:
                    sel = np.concatenate(
                        [sel, np.full(chunk - (hi - lo), lo, np.intp)])
                rid = idx[sel]
                args = (jnp.asarray(batch.x[rid][:, :nb], dtype),
                        jnp.asarray(batch.y[rid][:, :nb], dtype),
                        jnp.asarray(batch.u[rid][:, :nb], dtype),
                        jnp.asarray(batch.n[rid]),
                        jnp.asarray(batch.k[rid]),
                        jnp.asarray(r_state[sel]),
                        jnp.asarray(ll_state[sel]))
                up = sum(a.nbytes for a in args) / 1e6
                t0 = time.time()
                out = em(*args, max_iters=mb.SEGMENT_ITERS)
                t_call = time.time() - t0
                jax.block_until_ready(out)
                t_dev = time.time() - t0 - t_call
                t1 = time.time()
                host = [np.asarray(o) for o in out]
                t_pull = time.time() - t1
                down = sum(h.nbytes for h in host) / 1e6
                take = hi - lo
                a_c, b_c, _w, ll_c, ok_c = (h[:take] for h in host[:5])
                iters_run = int(host[5])
                r_c, done, failed = (h[:take] for h in host[6:9])
                it_done = host[9][:take]
                total["t_call"] += t_call
                total["t_device"] += t_dev
                total["t_pull"] += t_pull
                total["up_MB"] += up
                total["down_MB"] += down
                total["slabs"] += 1
                stats.append({
                    "bucket": [kb, nb], "seg": seg, "rows": int(take),
                    "t_call": round(t_call, 3),
                    "t_device": round(t_dev, 3),
                    "t_pull": round(t_pull, 3),
                    "iters_run": iters_run,
                    "mean_iters_to_converge": round(float(np.mean(
                        np.minimum(it_done, iters_run))), 1),
                    "up_MB": round(up, 2), "down_MB": round(down, 2)})
                fin = (done.astype(bool) | failed.astype(bool)) | last
                gi = idx[lo:hi]
                if not last and not fin.all():
                    keep_idx.append(gi[~fin])
                    keep_r.append(r_c[~fin])
                    keep_ll.append(ll_c[~fin])
            if not keep_idx:
                break
            idx = np.concatenate(keep_idx)
            r_state = np.concatenate(keep_r)
            ll_state = np.concatenate(keep_ll)
            del live0
    wall = time.time() - t_all0
    dev_s = total["t_device"]
    report = {
        "rows": rows, "wall_s": round(wall, 2),
        "totals": {k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in total.items()},
        "device_fraction": round(dev_s / wall, 3) if wall else None,
        "link_fraction": round(
            (total["t_call"] + total["t_pull"]) / wall, 3),
        "per_slab": stats,
    }
    print("EM_PROBE_A " + json.dumps(report), flush=True)


def synth_large(n_points, n_instances, seed=0):
    """G=3 well-separated components per instance, fragment-length-like
    coordinates (the 32GB-setcover-scale bin-pairs the reference feared,
    defuse_run.pl:475 — many fragments in one bin pair)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_instances):
        centers = rng.uniform(2000, 30000, (3, 2))
        g = rng.integers(0, 3, n_points)
        x = centers[g, 0] + rng.integers(-150, 150, n_points)
        y = centers[g, 1] + rng.integers(-150, 150, n_points)
        u = np.full(n_points, 100.0)
        out.append((np.sort(x)[::-1].astype(float), y.astype(float), u))
    return out


def part_b():
    from defuse_tpu.cluster import matepair_em_batch as mb
    from defuse_tpu.cluster import native
    from defuse_tpu.cluster.matepair_em import EMParams

    params = EMParams(200.0, 20.0, 0.95, 3)
    report = {}
    for n_points in (512, 2048, 8192):
        n_inst = max(2, 8192 // n_points * 2)
        instances = synth_large(n_points, n_inst)
        batch = mb.prepare_batch(instances, params)
        t0 = time.time()
        nat = native.em_cluster_batch(instances, params)
        t_native = time.time() - t0
        # warm device pass: run twice, report the second
        mb.run_batch(batch, params)
        t0 = time.time()
        dev = mb.run_batch(batch, params)
        t_device = time.time() - t0
        same = all(
            sorted(map(sorted, dev.get(i, []))) ==
            sorted(map(sorted, nat[i] if i < len(nat) else []))
            for i in range(len(instances)))
        report[f"N{n_points}"] = {
            "n_instances": n_inst, "rows": len(batch.n),
            "native_s": round(t_native, 3),
            "device_warm_s": round(t_device, 3),
            "speedup_device": round(t_native / t_device, 2),
            "decisions_match": same}
        print(f"  N={n_points}: native {t_native:.2f}s device "
              f"{t_device:.2f}s match={same}", file=sys.stderr, flush=True)
    print("EM_PROBE_B " + json.dumps(report), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "AB"
    if "A" in which:
        part_a()
    if "B" in which:
        part_b()
