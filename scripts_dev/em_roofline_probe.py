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
import os
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
    """Attribute the PRODUCTION device-resident driver
    (``matepair_em_batch._run_bucketed``) on the exact bench workload:
    run_batch is executed twice (cold incl. compile, then warm) and the
    driver's own EM_RUN_STATS phase attribution is reported — upload,
    dispatch-enqueue, device wait, packed-result pull.  Round 4's probe
    re-implemented the old host-compacted loop and left ~39% of the
    wall unattributed (the per-slab jnp.asarray uploads it never
    timed); instrumenting the real driver closes that hole by
    construction: the phases sum to the wall minus host-side numpy
    bookkeeping, which is reported as host_fraction."""
    from defuse_tpu.cluster import matepair_em_batch as mb

    instances, params = bench_instances()
    batch = mb.prepare_batch(instances, params)
    rows = len(batch.n)
    report = {"rows": rows}
    for label in ("cold", "warm"):
        t0 = time.time()
        mb.run_batch(batch, params)
        wall = time.time() - t0
        s = dict(mb.EM_RUN_STATS)
        attributed = (s.get("t_upload", 0) + s.get("t_dispatch", 0)
                      + s.get("t_device_wait", 0) + s.get("t_pull", 0))
        drv_wall = s.get("wall_s", wall) or wall
        report[label] = {
            "run_batch_wall_s": round(wall, 2),
            "driver_wall_s": drv_wall,
            **s,
            "device_fraction": round(
                s.get("t_device_wait", 0) / drv_wall, 3),
            "link_fraction": round(
                (s.get("t_upload", 0) + s.get("t_dispatch", 0)
                 + s.get("t_pull", 0)) / drv_wall, 3),
            "host_fraction": round(
                max(0.0, drv_wall - attributed) / drv_wall, 3),
        }
        print(f"  {label}: wall {wall:.2f}s stats {s}",
              file=sys.stderr, flush=True)
    # surface the warm headline at the top level for the bench collector
    warm = report["warm"]
    report.update(
        wall_s=warm["driver_wall_s"],
        device_fraction=warm["device_fraction"],
        link_fraction=warm["link_fraction"],
        host_fraction=warm["host_fraction"],
        totals={"up_MB": warm.get("up_MB"), "down_MB": warm.get("down_MB"),
                "slabs": warm.get("slabs")})
    print("EM_PROBE_A " + json.dumps(report), flush=True)


def synth_large(n_points, n_instances, seed=0):
    """G=3 OVERLAPPING components per instance, fragment-length-like
    coordinates (the 32GB-setcover-scale bin-pairs the reference feared,
    defuse_run.pl:475 — many fragments in one bin pair).  Component
    centers sit within ~2 fragment lengths of each other so the mixture
    is genuinely ambiguous and EM needs many iterations — the
    adversarial case for the HOST (a well-separated mixture converges
    in a handful of iterations and native wins trivially)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_instances):
        base = rng.uniform(2000, 30000, 2)
        centers = base[None, :] + rng.uniform(0, 400, (3, 2))
        g = rng.integers(0, 3, n_points)
        x = centers[g, 0] + rng.integers(-150, 150, n_points)
        y = centers[g, 1] + rng.integers(-150, 150, n_points)
        u = np.full(n_points, 100.0)
        out.append((np.sort(x)[::-1].astype(float), y.astype(float), u))
    return out


def part_b(sizes=(512, 2048, 8192)):
    from defuse_tpu.cluster import matepair_em_batch as mb
    from defuse_tpu.cluster import native
    from defuse_tpu.cluster.matepair_em import EMParams

    params = EMParams(200.0, 20.0, 0.95, 3)
    report = {}
    # Wall budget (VERDICT r4 items 2/10 recurred in round 5: at a
    # 2x-slower tunnel the full sweep blew the bench's 900s subprocess
    # timeout and the record was lost ENTIRELY).  A partial record with
    # explicit skip markers always beats a killed subprocess: before
    # each cell, project its cost from the last cell's measured wall
    # and skip-with-record when it cannot fit.
    budget = float(os.environ.get("DEFUSE_PARTB_BUDGET_S", "700"))
    t_sweep = time.time()
    last_cell_s = 0.0
    for n_points in sizes:
        elapsed = time.time() - t_sweep
        # each cell runs cold+warm device passes; walls GROW with N
        # (memo r5: 74s -> 99s -> 152s warm on a 133ms tunnel), so the
        # previous cell's wall is a conservative floor for the next
        if report and elapsed + 2.0 * last_cell_s > budget:
            report[f"N{n_points}"] = {
                "skipped": "budget",
                "budget_s": budget,
                "elapsed_s": round(elapsed, 1)}
            print(f"  N={n_points}: skipped (budget {budget:.0f}s, "
                  f"elapsed {elapsed:.0f}s)", file=sys.stderr, flush=True)
            continue
        t_cell = time.time()
        n_inst = max(2, min(32, 8192 // n_points * 2))
        instances = synth_large(n_points, n_inst)
        batch = mb.prepare_batch(instances, params)
        t0 = time.time()
        nat = native.em_cluster_batch(instances, params)
        t_native = time.time() - t0
        # warm device pass: run twice, report the second
        mb.run_batch(batch, params)
        mb.EM_RUN_STATS.clear()  # stats only describe THIS timed run
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
            "decisions_match": same,
            # how much of the matching answer the HOST produced: at
            # large N the f32 log-likelihood's rounding noise (|ll| ~
            # N) can exceed the 1e-3 convergence tolerance, so rows
            # never flag done and the hybrid re-solves them exactly on
            # the host — attribution that matters for an honest
            # device-EM story
            "host_resolved_instances":
                mb.LAST_SELECT_STATS.get("n_host_resolved"),
            "driver_stats": dict(mb.EM_RUN_STATS)}
        last_cell_s = time.time() - t_cell
        print(f"  N={n_points}: native {t_native:.2f}s device "
              f"{t_device:.2f}s match={same}", file=sys.stderr, flush=True)
    print("EM_PROBE_B " + json.dumps(report), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "AB"
    if "A" in which:
        part_a()
    if "B" in which:
        part_b()
