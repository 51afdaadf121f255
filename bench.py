#!/usr/bin/env python
"""Benchmark: read-pairs/s/chip through cluster + split-align.

Generates a multi-fusion synthetic dataset, runs the discovery pipeline
(discordant clustering -> set cover -> split-read DP -> breakpoint vote)
through:
  * the reference deFuse C++ binaries (single CPU core) as the baseline
  * our TPU path (batched device EM + Pallas split DP, host glue)
verifies the fusion calls match, and prints ONE JSON line:
  {"metric": ..., "value": pairs/s, "unit": "read-pairs/s/chip",
   "vs_baseline": ours/reference}
"""

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

MEAN, STD, PREC, MINCL = 200.0, 20.0, 0.95, 3
MINREAD = MAXREAD = 50

N_FUSIONS = 96
FRAGS_PER_FUSION = 150
N_BACKGROUND = 40000
DECOYS_PER_FUSION = 400

# measured single-core reference throughput on this dataset (mean of
# four runs on this image, 2026-08-17); used only when the reference
# toolchain cannot be rebuilt on the bench machine, in which case
# exact_match_vs_reference is reported as null
FALLBACK_BASELINE_PAIRS_S = 4700.0


def build_dataset(tmp):
    """Multi-fusion dataset: N_FUSIONS gene pairs on a synthetic genome."""
    import numpy as np
    from synthdata import Gene, SynthDataset, write_dataset, random_seq
    import random as _random
    from defuse_tpu.core.types import revcomp

    rng = _random.Random(1234)
    chrom_len = 2_000_000
    genome = {"1": random_seq(rng, chrom_len), "2": random_seq(rng, chrom_len)}

    genes = []
    pos = {"1": 30000, "2": 30000}
    for gi in range(2 * N_FUSIONS):
        chrom = "1" if gi % 2 == 0 else "2"
        strand = rng.randint(0, 1)
        exons = []
        p = pos[chrom]
        for _ in range(4):
            length = rng.randint(500, 900)
            exons.append((p, p + length - 1))
            p += length + rng.randint(800, 1500)
        pos[chrom] = p + 10000
        genes.append(Gene(f"G{gi}", f"T{gi}", chrom, strand, exons))

    reads1, reads2, sam_rows = [], [], []
    frag_id = 0
    fusions = []

    def emit(frag, read_end, tpos, gene, seq, from_plus):
        ref_cdna = f"{gene.name}|{gene.transcript}"
        strand = 0 if from_plus else 1
        sam_rows.append((frag, read_end, ref_cdna, strand, tpos, seq))
        g_start = gene.transcript_to_genome(tpos)
        g_end = gene.transcript_to_genome(tpos + 49)
        if abs(g_end - g_start) == 49:
            gs = min(g_start, g_end)
            g_strand = (1 - strand) if gene.strand == 1 else strand
            sam_rows.append((frag, read_end, gene.chromosome, g_strand, gs,
                             seq))

    for fi in range(N_FUSIONS):
        ga, gb = genes[2 * fi], genes[2 * fi + 1]
        ca, cb = ga.cdna(genome), gb.cdna(genome)
        break_a = rng.randint(800, len(ca) - 400)
        break_b = rng.randint(400, len(cb) - 800)
        fusion_seq = ca[:break_a] + cb[break_b - 1:]
        fusions.append((ga, gb, break_a, break_b, fusion_seq))
        for _ in range(FRAGS_PER_FUSION):
            flen = max(100, int(rng.gauss(MEAN, STD)))
            lo = max(1, break_a - flen + 10)
            hi = min(break_a + 40, len(fusion_seq) - flen)
            if hi <= lo:
                continue
            start = rng.randint(lo, hi)
            frag = fusion_seq[start - 1:start - 1 + flen]
            r1, r2 = frag[:50], revcomp(frag[-50:])
            reads1.append(r1)
            reads2.append(r2)
            r1_end = start + 49
            r2_start = start + flen - 50
            if r1_end <= break_a:
                emit(frag_id, 0, start, ga, r1, True)
            elif start > break_a:
                emit(frag_id, 0, start - break_a + break_b - 1, gb, r1, True)
            if r2_start > break_a:
                emit(frag_id, 1, r2_start - break_a + break_b - 1, gb, r2,
                     False)
            elif r2_start + 49 <= break_a:
                emit(frag_id, 1, r2_start, ga, r2, False)
            frag_id += 1

    # decoy improper reads: mismapped/chimeric-artifact noise at the
    # fusion loci — nominated as split candidates by both toolchains,
    # rejected by the DP accept threshold (realistic candidate accept
    # rates are low; this is where the device screen pays off).  One
    # read end only, so they never enter the spanning/clustering input.
    for di in range(N_FUSIONS * DECOYS_PER_FUSION):
        ga, gb, break_a, break_b, _fseq = fusions[di % N_FUSIONS]
        gene, brk = (ga, break_a) if di % 2 == 0 else (gb, break_b)
        cdna_len = len(gene.cdna(genome))
        pos = min(max(1, brk + rng.randint(-int(MEAN), int(MEAN))),
                  max(1, cdna_len - 49))
        junk = random_seq(rng, 50)
        reads1.append(junk)
        reads2.append(random_seq(rng, 50))
        sam_rows.append((frag_id, 0, f"{gene.name}|{gene.transcript}",
                         di % 2, pos, junk))
        frag_id += 1

    for _ in range(N_BACKGROUND):
        gene = rng.choice(genes)
        cdna = gene.cdna(genome)
        flen = max(100, int(rng.gauss(MEAN, STD)))
        if flen >= len(cdna):
            flen = len(cdna) - 1
        start = rng.randint(1, len(cdna) - flen)
        frag = cdna[start - 1:start - 1 + flen]
        reads1.append(frag[:50])
        reads2.append(revcomp(frag[-50:]))
        emit(frag_id, 0, start, gene, frag[:50], True)
        emit(frag_id, 1, start + flen - 50, gene, revcomp(frag[-50:]),
             False)
        frag_id += 1

    ds = SynthDataset(genome, genes, ("", 0, "", 0), "", reads1, reads2,
                      sam_rows)
    paths = write_dataset(ds, tmp)
    # production ingest (index_paired_fastq contract): renamed fastqs +
    # reads.fqi, exactly as the pipeline stages preceding discover
    # produce them in both toolchains (index_paired_fastq.pl runs before
    # dosplitalign in the reference).  Both measured runs then read the
    # same renamed files; ours may additionally use the byte-offset
    # index for selective record preads — the reference's ReadIndex has
    # the same .fqi available.
    try:
        from defuse_tpu.cluster import native as _native
        if _native.available():
            ing = tmp / "ing"
            if _native.ingest_fastq(str(paths["fastq1"]),
                                    str(paths["fastq2"]),
                                    str(ing)) is not None:
                paths["fastq1"] = ing / "reads.1.fastq"
                paths["fastq2"] = ing / "reads.2.fastq"
    except Exception:
        pass
    return ds, paths, frag_id


def run_reference(paths, ref_bin, tmp, n_trials=2):
    """Best-of-n_trials wall time (the shared host's jitter cuts both
    ways; the ours side already takes best-of-three measured discover
    windows, so the ratio should not be inflated by one slow reference
    run).  Outputs come from the final trial (identical every trial)."""
    best = None
    for _ in range(max(0, n_trials - 1)):
        t_trial, *_ = _run_reference_once(paths, ref_bin, tmp)
        best = t_trial if best is None else min(best, t_trial)
    elapsed, regions, sorted_split, outs = _run_reference_once(
        paths, ref_bin, tmp)
    if best is not None:
        elapsed = min(elapsed, best)
    return elapsed, regions, sorted_split, outs


def _run_reference_once(paths, ref_bin, tmp):
    from synthdata import align_regions_lines
    t0 = time.time()
    clusters = tmp / "ref.clusters"
    subprocess.run([str(ref_bin / "clustermatepairs"),
                    "-a", str(paths["spanning"]), "-c", str(clusters),
                    "-u", str(MEAN), "-s", str(STD), "-p", str(PREC),
                    "-m", str(MINCL)], check=True, capture_output=True)
    sc = tmp / "ref.clusters.sc"
    subprocess.run([str(ref_bin / "setcover"), "-c", str(clusters),
                    "-o", str(sc), "-m", str(MINCL)],
                   check=True, capture_output=True)
    regions = tmp / "ref.regions"
    regions.write_text("\n".join(
        align_regions_lines(sc.read_text().splitlines())) + "\n")
    split = tmp / "ref.split"
    subprocess.run([str(ref_bin / "dosplitalign"),
                    "-f", str(paths["reference"]), "-e", str(paths["exons"]),
                    "-u", str(MEAN), "-s", str(STD), "-n", str(MINREAD),
                    "-x", str(MAXREAD), "-r", str(regions),
                    "-i", str(paths["improper"]),
                    "-1", str(paths["fastq1"]), "-2", str(paths["fastq2"]),
                    "-a", str(split)], check=True, capture_output=True)
    sorted_split = tmp / "ref.split.sorted"
    with open(sorted_split, "w") as out:
        subprocess.run(["sort", "-n", str(split)], check=True, stdout=out,
                       env=dict(os.environ, LC_ALL="C"))
    outs = {n: tmp / f"ref.{n}" for n in ("seq", "break", "predalign")}
    subprocess.run([str(ref_bin / "evalsplitalign"),
                    "-f", str(paths["reference"]), "-e", str(paths["exons"]),
                    "-u", str(MEAN), "-s", str(STD), "-n", str(MINREAD),
                    "-x", str(MAXREAD), "-r", str(regions),
                    "-a", str(sorted_split), "-q", str(outs["seq"]),
                    "-b", str(outs["break"]), "-p", str(outs["predalign"])],
                   check=True, capture_output=True)
    elapsed = time.time() - t0
    return elapsed, regions, sorted_split, outs


def run_ours(paths, regions_file, tmp, use_tpu=True):
    """Our pipeline: host glue + device EM + Pallas split DP."""
    if not use_tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from defuse_tpu.pipeline.discover import discover_fusions
    t0 = time.time()
    outs = discover_fusions(
        spanning=str(paths["spanning"]),
        improper=str(paths["improper"]),
        fastq1=str(paths["fastq1"]),
        fastq2=str(paths["fastq2"]),
        reference=str(paths["reference"]),
        exons=str(paths["exons"]),
        fragment_mean=MEAN, fragment_stddev=STD, precision=PREC,
        min_cluster_size=MINCL, min_read_length=MINREAD,
        max_read_length=MAXREAD, outdir=str(tmp / "ours"),
        use_device=use_tpu)
    elapsed = time.time() - t0
    return elapsed, outs


def tpu_alive(timeout_s: int = 300) -> bool:
    """Probe the device in a subprocess so a hung TPU tunnel can't hang
    the benchmark itself.  The dev chip sits behind a flaky relay that
    flaps for minutes at a time, so the probe retries with a pause
    (bounded: DEFUSE_BENCH_TPU_RETRIES attempts, default 4)."""
    probe = ("import numpy, jax, jax.numpy as jnp;"
             "assert jax.default_backend() == 'tpu', jax.default_backend();"
             "print(float(numpy.asarray(jnp.ones(4).sum())))")
    attempts = int(os.environ.get("DEFUSE_BENCH_TPU_RETRIES", "4"))
    pause = float(os.environ.get("DEFUSE_BENCH_TPU_RETRY_SLEEP", "45"))
    # total wall budget for the whole probe dance: a live tunnel answers
    # in well under two minutes (first-compile included); a dead one must
    # not eat the bench window (4 x 300s timeouts + sleeps > 20 min)
    budget = float(os.environ.get("DEFUSE_BENCH_TPU_BUDGET", "360"))
    per_attempt = float(os.environ.get("DEFUSE_BENCH_TPU_PROBE_TIMEOUT",
                                       str(min(timeout_s, 150))))
    t_start = time.time()
    for attempt in range(max(1, attempts)):
        if attempt:
            if time.time() - t_start + pause + per_attempt > budget:
                print("bench: TPU probe budget exhausted; host path",
                      file=sys.stderr)
                break
            print(f"bench: TPU probe retry {attempt} in {pause:.0f}s",
                  file=sys.stderr)
            time.sleep(pause)
        try:
            proc = subprocess.run([sys.executable, "-c", probe],
                                  capture_output=True, timeout=per_attempt)
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def run_ours_subprocess(tmpdir, device, timeout_s=480, env=None):
    """Run the 'ours' measurement isolated in a subprocess so a flapping
    device link cannot hang the benchmark; returns (elapsed_s, extras)
    or (None, {})."""
    proc_env = dict(os.environ)
    proc_env["DEFUSE_STAGE_TIMING"] = "1"
    if env:
        proc_env.update(env)
    if device == "cpu":
        proc_env["DEFUSE_BENCH_FORCE_CPU"] = "1"
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--ours-only", str(tmpdir)],
            capture_output=True, text=True, timeout=timeout_s,
            env=proc_env)
    except subprocess.TimeoutExpired:
        return None, {}
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        return None, {}
    elapsed = None
    extras = {}
    stage_times = {}
    for line in proc.stdout.splitlines():
        if line.startswith("OURS_DEVICE"):
            extras["measured_device"] = line.split()[1]
        elif line.startswith("PALLAS_KERNEL"):
            extras["pallas_kernel"] = dict(
                p.split("=") for p in line.split()[1:])
        elif line.startswith("VERIFY_KERNEL"):
            extras["verify_kernel"] = dict(
                p.split("=") for p in line.split()[1:])
        elif line.startswith("FRONTEND_PAIRS_S"):
            extras["frontend_pairs_s"] = float(line.split()[1])
        elif line.startswith("FRONTEND_HASH"):
            extras["frontend_hash"] = line.split()[1]
        elif line.startswith("VPU_PEAK "):
            try:
                extras["vpu_peak"] = json.loads(line[len("VPU_PEAK "):])
            except ValueError:
                pass
        elif line.startswith("OURS_ELAPSED"):
            elapsed = float(line.split()[1])
            # stage lines from the timed (second) run overwrite the
            # warm-up run's values key by key — keep what's accumulated
        elif line.startswith("[discover] screen: "):
            # cost-model routing decision (host vs device screen) from
            # the timed run — kept in the artifact so a slow recorded
            # number can be attributed to a routing misprediction
            extras["screen_routing"] = line[len("[discover] "):]
        elif line.startswith("[stage] ") and line.rstrip().endswith("s"):
            try:
                stage, val = line[len("[stage] "):].rsplit(": ", 1)
                stage_times[stage] = float(val.rstrip("s"))
            except ValueError:
                pass
    if stage_times:
        extras["stage_times_s"] = stage_times
    return elapsed, extras


def ours_only(tmpdir):
    tmpdir = pathlib.Path(tmpdir)
    if os.environ.get("DEFUSE_BENCH_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    ds, paths, n_pairs = build_dataset(tmpdir)
    use_tpu = not os.environ.get("DEFUSE_BENCH_FORCE_CPU")
    if use_tpu:
        # resolve the device probe verdict up front: backend init over
        # the tunnel takes ~30s, far longer than discover's bounded
        # wait — without this the "tpu" measurement silently runs the
        # host path (plus the probe wait) in both runs
        from defuse_tpu.core.devices import tpu_backend_available
        use_tpu = tpu_backend_available(timeout_s=180.0)
        if not use_tpu:
            print("ours-only: device probe negative; host path",
                  file=sys.stderr)
    run_ours(paths, None, tmpdir, use_tpu=use_tpu)  # warm-up compile
    # best of three measured runs: the 4-CPU box is shared, and a
    # single ~0.7s window is ±20% noisy under contention — the min is
    # the steady-state capability (the reference baseline runs ~20x
    # longer, so its relative noise is small and it stays single-run)
    elapsed = min(run_ours(paths, None, tmpdir, use_tpu=use_tpu)[0]
                  for _ in range(3))
    print(f"OURS_ELAPSED {elapsed}")
    print(f"OURS_DEVICE {'tpu' if use_tpu else 'cpu'}")
    frontend_bench(ds, tmpdir)
    if use_tpu:
        pallas_kernel_bench()
        verify_kernel_bench()
        try:
            from defuse_tpu.ops.split_dp_census import vpu_peak_probe
            print("VPU_PEAK " + json.dumps(vpu_peak_probe()))
        except Exception as e:
            print(f"vpu peak probe failed: {e}", file=sys.stderr)


def frontend_bench(ds, tmpdir):
    """Measure the aligner frontend (fastq -> spanning/improper) on the
    bench dataset reads — the end-to-end-facing number the cluster+
    split-align headline metric doesn't cover."""
    try:
        from defuse_tpu.align.frontend import align_job
        from defuse_tpu.align.seedindex import SeedIndex
        from defuse_tpu.annotate.gene_models import GeneModels
        from synthdata import write_gtf
        gtf = pathlib.Path(tmpdir) / "bench_genes.gtf"
        write_gtf(ds, gtf)
        gm = GeneModels(str(gtf))
        cdna_index = SeedIndex(
            {f"{g.name}|{g.transcript}": g.cdna(ds.genome) + "A" * 50
             for g in ds.genes})
        genome_index = SeedIndex(ds.genome)
        t0 = time.time()
        align_job(cdna_index=cdna_index, genome_index=genome_index,
                  rrna_index=None, gene_models=gm, reads1=ds.reads1,
                  reads2=ds.reads2,
                  outdir=str(pathlib.Path(tmpdir) / "bench_frontend"))
        dt = time.time() - t0
        print(f"FRONTEND_PAIRS_S {len(ds.reads1) / dt:.1f}")
        # output digest so routing-forced legs (e.g. device verify) can
        # assert hit-set identity with the default-routing run
        import hashlib
        h = hashlib.md5()
        fdir = pathlib.Path(tmpdir) / "bench_frontend"
        for name in ("spanning.compact", "improper.sam"):
            p = fdir / name
            if p.exists():
                h.update(p.read_bytes())
        print(f"FRONTEND_HASH {h.hexdigest()}")
    except Exception as e:
        print(f"frontend bench failed: {e}", file=sys.stderr)


def pallas_kernel_bench(R=256, L=64):
    """On-chip split-DP kernel microbenchmark.  Times two batch sizes
    with a scalar fetch and reports the *marginal* per-read rate —
    fixed costs (dispatch + one link round trip, which dominates over
    a tunneled dev link) cancel in the difference, so the number
    reflects the chip, not the link.  Total ms for the large batch is
    recorded too so the link-inclusive cost stays visible.

    Both batch sizes are LARGE: the fixed link cost is ~25ms with
    ±3ms jitter, so a small-batch subtrahend (the round-3/4 2048-read
    choice) made the marginal a difference of two noisy numbers and
    scattered it ±50% run to run — round 4's recorded 0.327µs/read was
    such an artifact (a 5-point batch sweep this round fit
    t(B) = 24.2ms + B*0.66µs with <±3% residuals;
    PALLAS_SPLIT_DP_r5.md)."""
    try:
        import jax
        import jax.numpy as jnp
        import numpy as _np

        from defuse_tpu.ops.split_dp_batch import pad_batch
        rng = _np.random.default_rng(0)
        B_small, B_big = 16384, 65536
        refs = ["".join(rng.choice(list("ACGT"), R))
                for _ in range(B_big)]
        reads = ["".join(rng.choice(list("ACGT"), 50))
                 for _ in range(B_big)]
        rp, rl = pad_batch(refs, R)
        qp, ql = pad_batch(reads, L)
        # route through the production dispatch so the probed element
        # type (int16/int32) is the one measured; record which one ran
        from defuse_tpu.ops import split_dp_pallas as _sp
        _sp.dp_row_maxima_pallas(rp.astype(_np.int32)[:8], rl[:8],
                                 qp.astype(_np.int32)[:8], ql[:8])
        backend = jax.default_backend()
        i16 = _sp._I16_OK.get(backend, False)
        kfn = _sp._dp_row_maxima_pallas
        variant = f"v1-{'i16' if i16 else 'i32'}"
        g = jax.jit(lambda a, b, c, d: jnp.sum(
            kfn(a, b, c, d, 256, False, i16)))

        def best_time(B, iters=8):
            dev = [jax.device_put(x[:B]) for x in
                   (rp.astype(_np.int32), rl, qp.astype(_np.int32), ql)]
            float(g(*dev))  # compile + warm
            best = 1e9
            for _ in range(iters):
                t0 = time.time()
                float(g(*dev))
                best = min(best, time.time() - t0)
            return best

        t_small = best_time(B_small)
        t_big = best_time(B_big)
        marginal = (t_big - t_small) / (B_big - B_small)
        print(f"PALLAS_KERNEL ms={t_big * 1000:.2f} B={B_big} "
              f"reads_s={B_big / t_big:.0f} "
              f"marginal_us={marginal * 1e6:.3f} "
              f"marginal_reads_s={1 / marginal:.0f} "
              f"variant={variant}")
    except Exception as e:  # never fail the bench over a microbench
        print(f"pallas kernel bench failed: {e}", file=sys.stderr)


def verify_kernel_bench(L=50):
    """On-chip candidate-verification microbench (VERDICT r2 item 6):
    marginal candidates/s of the packed mismatch-count kernel, with the
    host NumPy oracle rate alongside so the cost-model constants stay
    calibrated."""
    try:
        import jax
        import jax.numpy as jnp
        import numpy as _np

        from defuse_tpu.ops.verify_batch import (pack_codes3, pack_rows3,
                                                 _verify_packed3)
        rng = _np.random.default_rng(0)
        N = 4_000_000
        codes = rng.integers(0, 4, N).astype(_np.int8)
        ref3d = jax.device_put(pack_codes3(codes))
        B_reads = 20000
        reads = rng.integers(0, 4, (B_reads, L)).astype(_np.int8)
        lens = _np.full(B_reads, L, _np.int32)
        reads_d = jax.device_put(pack_rows3(reads))
        lens_d = jax.device_put(lens)
        # both sizes large so the fixed-cost subtraction stays inside
        # a few percent (see pallas_kernel_bench)
        C_small, C_big = 65536, 524288
        starts = rng.integers(0, N - L, C_big).astype(_np.int64)
        w16 = (starts // 10).astype(_np.int32)
        l16 = (starts % 10).astype(_np.int32)
        ridx = rng.integers(0, B_reads, C_big).astype(_np.int32)
        g = jax.jit(lambda a, b, c: jnp.sum(_verify_packed3(
            ref3d, a, b, reads_d, c, lens_d, L)))

        def best_time(C, iters=8):
            dev = [jax.device_put(x[:C]) for x in (w16, l16, ridx)]
            float(g(*dev))
            best = 1e9
            for _ in range(iters):
                t0 = time.time()
                float(g(*dev))
                best = min(best, time.time() - t0)
            return best

        t_small = best_time(C_small)
        t_big = best_time(C_big)
        marginal = (t_big - t_small) / (C_big - C_small)
        # host oracle rate on the same shapes (single thread)
        h_idx = _np.clip(starts[:C_small, None] + _np.arange(L)[None, :],
                         0, N - 1)
        t0 = time.time()
        windows = codes[h_idx]
        diff = (windows != reads[ridx[:C_small]])
        diff.sum(axis=1)
        t_host = time.time() - t0
        print(f"VERIFY_KERNEL ms={t_big * 1000:.2f} C={C_big} "
              f"marginal_us={marginal * 1e6:.3f} "
              f"marginal_cands_s={1 / marginal:.0f} "
              f"lanes_s={L / marginal:.0f} "
              f"host_cands_s={C_small / t_host:.0f}")
    except Exception as e:  # never fail the bench over a microbench
        print(f"verify kernel bench failed: {e}", file=sys.stderr)


def kernel_rooflines(run_extras, timeout_s=300):
    """Per-device-kernel measured-vs-ceiling table (VERDICT r3 item 10).

    split-DP: measured marginal vs the static int32 VPU vreg census of
    PALLAS_SPLIT_DP_r3.md (0.56µs/read; 0.28 when the int16 variant
    compiles).  verify: the kernel is decomposed live into its gather
    and compute legs (scripts_dev/verify_roofline_probe.py) — the
    larger leg is the binding-resource ceiling, their sum the serial
    floor.  EM: attribution of the warm device wall into device-compute
    vs link/dispatch fractions (scripts_dev/em_roofline_probe.py part
    A), naming what a faster kernel could and couldn't buy."""
    roof = {}
    pk = run_extras.get("pallas_kernel") or {}
    try:
        if pk.get("marginal_us") is not None:
            from defuse_tpu.ops.split_dp_census import census_vreg_ops
            # the microbench's post-tighten shapes: R=256, 50 real rows
            census = census_vreg_ops(256, 50)
            peak = run_extras.get("vpu_peak") or {}
            if peak.get("alu_us_per_vreg_op"):
                # census priced by the MEASURED sustained issue costs
                # (saturation probes, flat across stream counts and op
                # mixes) — the defensible denominator; the 1.5GHz
                # architectural single-pipe bound is recorded alongside
                # (derivation + error bars: PALLAS_SPLIT_DP_r5.md)
                ceiling = (census["alu_vreg_ops_per_read"]
                           * peak["alu_us_per_vreg_op"]
                           + census["roll_vreg_ops_per_read"]
                           * peak["roll_us_per_vreg_op"])
                basis = ("segmented-cascade vreg census priced at the "
                         "measured sustained VPU issue rate "
                         "(PALLAS_SPLIT_DP_r5.md)")
            else:
                ceiling = census["vreg_ops_per_read"] / 950.0
                basis = ("segmented-cascade vreg census at the "
                         "measured-typical 0.95 vreg-ops/ns issue "
                         "rate (peak probe absent this run — "
                         "PALLAS_SPLIT_DP_r5.md)")
            m = float(pk["marginal_us"])
            roof["split_dp"] = {
                "measured_us_per_read": m,
                "ceiling_us_per_read": round(ceiling, 4),
                "census_vreg_ops_per_read": round(
                    census["vreg_ops_per_read"], 1),
                "architectural_1p5ghz_us": round(
                    census["vreg_ops_per_read"] / 1500.0, 4),
                "pct_of_ceiling": round(100 * ceiling / m, 1),
                "basis": basis}
    except Exception as e:
        print(f"split_dp roofline failed: {e}", file=sys.stderr)
    try:
        proc = subprocess.run(
            [sys.executable,
             str(REPO / "scripts_dev" / "verify_roofline_probe.py")],
            capture_output=True, text=True, timeout=timeout_s)
        for line in proc.stdout.splitlines():
            if line.startswith("VERIFY_ROOFLINE "):
                vr = json.loads(line[len("VERIFY_ROOFLINE "):])
                g = vr["gather"]["marginal_us"]
                c = vr["compute"]["marginal_us"]
                full = vr["full"]["marginal_us"]
                roof["verify"] = {
                    "measured_us_per_cand": full,
                    "gather_leg_us": g, "compute_leg_us": c,
                    "ceiling_us_per_cand": round(max(g, c), 4),
                    "serial_floor_us": round(g + c, 4),
                    "pct_of_ceiling": round(100 * max(g, c) / full, 1),
                    "basis": "measured gather/compute leg decomposition"}
    except Exception as e:
        print(f"verify roofline failed: {e}", file=sys.stderr)
    try:
        proc = subprocess.run(
            [sys.executable,
             str(REPO / "scripts_dev" / "em_roofline_probe.py"), "A"],
            capture_output=True, text=True, timeout=timeout_s)
        for line in proc.stdout.splitlines():
            if line.startswith("EM_PROBE_A "):
                pa = json.loads(line[len("EM_PROBE_A "):])
                roof["em"] = {
                    "wall_s": pa["wall_s"],
                    "device_fraction": pa["device_fraction"],
                    "link_fraction": pa["link_fraction"],
                    "host_fraction": pa.get("host_fraction"),
                    "up_MB": pa["totals"]["up_MB"],
                    "down_MB": pa["totals"]["down_MB"],
                    "slabs": pa["totals"]["slabs"],
                    "basis": "per-slab dispatch/device/pull attribution "
                             "(em_roofline_probe part A)"}
    except Exception as e:
        print(f"em roofline failed: {e}", file=sys.stderr)
    try:
        # part B — the large-instance regime (VERDICT r4 item 2: the
        # 32GB setcover bin-pairs, defuse_run.pl:475): native vs warm
        # device walls at N in {512, 2048, 8192}, decisions compared.
        # Gets its own generous budget: its compiles are cached
        # persistently, so only the first-ever run pays them.
        proc = subprocess.run(
            [sys.executable,
             str(REPO / "scripts_dev" / "em_roofline_probe.py"), "B"],
            capture_output=True, text=True,
            timeout=float(os.environ.get("DEFUSE_BENCH_PARTB_TIMEOUT",
                                         "900")))
        for line in proc.stdout.splitlines():
            if line.startswith("EM_PROBE_B "):
                roof["em_partB"] = json.loads(line[len("EM_PROBE_B "):])
        if "em_partB" not in roof:
            print("em part B probe produced no record: "
                  + proc.stderr[-500:], file=sys.stderr)
    except Exception as e:
        print(f"em part B roofline failed: {e}", file=sys.stderr)
    return roof


def em_ablation_only(tmpdir):
    """Time the EM stage native-C++ vs batched-device on the bench
    dataset (clustering only), recording why the production path routes
    EM to the host (VERDICT r1 item 1): thousands of small EM instances
    lose to dispatch+transfer overheads on device.  Runs in its own
    subprocess so a device hang cannot lose the main measurement."""
    from defuse_tpu.cluster import native
    from defuse_tpu.cluster.discordant import cluster_alignments
    from defuse_tpu.cluster.matepair_em import EMParams
    from defuse_tpu.io.sam import iter_compact, load_alignments
    if not native.available():
        return
    tmpdir = pathlib.Path(tmpdir)
    ds, paths, n_pairs = build_dataset(tmpdir)
    params = EMParams(MEAN, STD, PREC, MINCL)
    table = load_alignments(iter_compact(paths["spanning"]))
    timings = {}
    for mode in ("native", "device"):
        try:
            t0 = time.time()
            ref = cluster_alignments(table, params, em_mode=mode)
            timings[mode] = round(time.time() - t0, 3)
            if mode == "device":
                # the tunneled axon worker defers compilation to the
                # FIRST execution (~2-9min for this program, uncachable
                # client-side) — time a second pass so the extras carry
                # the production-relevant warm number alongside the
                # cold one, plus decision parity vs the native rows
                t0 = time.time()
                dev = cluster_alignments(table, params, em_mode=mode)
                timings["device_warm"] = round(time.time() - t0, 3)
                from defuse_tpu.cluster.matepair_em_batch import \
                    LAST_SELECT_STATS
                timings["device_host_resolved"] = \
                    LAST_SELECT_STATS.get("n_host_resolved")
                timings["device_instances"] = \
                    LAST_SELECT_STATS.get("n_instances")
                nat = timings.get("_native_rows")
                if nat is not None:
                    timings["device_matches_native"] = \
                        [r.format() for r in dev] == nat
                    del timings["_native_rows"]
            elif mode == "native":
                timings["_native_rows"] = [r.format() for r in ref]
        except Exception as e:  # device mode needs jax; never fatal
            # surface the reason in the recorded extras, not just stderr
            msg = (str(e) or repr(e)).splitlines() or [type(e).__name__]
            timings[f"{mode}_error"] = msg[0][:200]
            print(f"em ablation {mode} failed: {e}", file=sys.stderr)
    timings.pop("_native_rows", None)
    if timings:
        # one JSON blob: arbitrary error text can never break the parse
        print("EM_ABLATION " + json.dumps(timings))


def run_em_ablation_subprocess(tmpdir, timeout_s=560):
    """Returns {"native": s, "device": s, [mode + "_error"]: str} or {}
    — never raises."""
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--em-ablation", str(tmpdir)],
            capture_output=True, text=True, timeout=timeout_s)
        for line in proc.stdout.splitlines():
            if line.startswith("EM_ABLATION "):
                return json.loads(line[len("EM_ABLATION "):])
    except Exception as e:
        print(f"em ablation subprocess failed: {e}", file=sys.stderr)
    return {}


def compact_headline(result, extras_file=None):
    """Compress the full bench result into a headline JSON guaranteed to
    fit the driver's capture window (VERDICT r4 item 1: the round-4
    monolithic line outgrew the 2000-char tail and the headline was lost
    — `parsed: null`).  Keeps the metric/value/vs_baseline contract plus
    one-number summaries of every extras block, with a hard byte budget
    enforced by dropping the least-important keys from the end."""
    ex = result.get("extra", {})

    def num(x, nd=3):
        try:
            return round(float(x), nd)
        except (TypeError, ValueError):
            return None

    roof = ex.get("kernel_rooflines") or {}
    ab = ex.get("em_ablation_s") or {}
    fscr = ex.get("forced_device_screen") or {}
    fver = ex.get("forced_device_verify") or {}
    partb = roof.get("em_partB") or {}
    # ordered most- to least-important; the tail is dropped first
    compact_extra = [
        ("device", ex.get("device")),
        ("exact_match_vs_reference", ex.get("exact_match_vs_reference")),
        ("n_read_pairs", ex.get("n_read_pairs")),
        ("baseline_pairs_s", num(ex.get("baseline_pairs_s"), 1)),
        ("frontend_pairs_s", num(ex.get("frontend_pairs_s"), 1)),
        ("em_native_s", num(ab.get("native"))),
        ("em_device_warm_s", num(ab.get("device_warm"))),
        ("em_device_matches_native", ab.get("device_matches_native")),
        ("split_dp_pct_ceiling",
         num((roof.get("split_dp") or {}).get("pct_of_ceiling"), 1)),
        ("verify_pct_ceiling",
         num((roof.get("verify") or {}).get("pct_of_ceiling"), 1)),
        ("em_partB", {k: num(v.get("speedup_device"), 2)
                      for k, v in sorted(partb.items())
                      if isinstance(v, dict)} or None),
        ("forced_device_screen_pairs_s", num(fscr.get("pairs_s"), 1)),
        ("forced_device_verify_pairs_s", num(fver.get("pairs_s"), 1)),
        ("full_extras_file", extras_file),
    ]
    out = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
        "extra": {k: v for k, v in compact_extra if v is not None},
    }
    budget = 1500
    keys = [k for k, v in compact_extra if v is not None]
    while len(json.dumps(out)) > budget and keys:
        out["extra"].pop(keys.pop(), None)
    return out


def main():
    tmpdir = pathlib.Path(tempfile.mkdtemp(prefix="defuse_bench_"))
    ds, paths, n_pairs = build_dataset(tmpdir)
    use_tpu = tpu_alive()
    if not use_tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        print("WARNING: TPU unreachable, benchmarking host/CPU path",
              file=sys.stderr)

    ref_bin = REPO / "ref_build" / "bin"
    baseline_pairs_s = FALLBACK_BASELINE_PAIRS_S
    ref_outs = None
    if not (ref_bin / "clustermatepairs").exists():
        try:
            subprocess.run(["bash", str(REPO / "ref_build" / "build.sh")],
                           check=True, capture_output=True)
        except Exception:
            pass
    if (ref_bin / "clustermatepairs").exists():
        ref_elapsed, regions, sorted_split, ref_outs = run_reference(
            paths, ref_bin, tmpdir)
        baseline_pairs_s = n_pairs / ref_elapsed

    ours_elapsed, run_extras = None, {}
    if use_tpu:
        ours_elapsed, run_extras = run_ours_subprocess(tmpdir, "tpu")
        if ours_elapsed is None:
            print("WARNING: TPU bench run failed/hung; CPU fallback",
                  file=sys.stderr)
            use_tpu = False
    if ours_elapsed is None:
        ours_elapsed, run_extras = run_ours_subprocess(
            tmpdir, "cpu", timeout_s=900)
    if ours_elapsed is None:
        raise RuntimeError("benchmark runs failed")
    if use_tpu:
        # host-vs-device EM ablation (VERDICT r1 item 1) — only
        # meaningful against the real chip; isolated subprocess
        ab = run_em_ablation_subprocess(tmpdir)
        if ab:
            run_extras["em_ablation_s"] = ab
        # forced-device screen leg (VERDICT r2 item 3): what the Pallas
        # split-realign screen contributes when routing is overridden —
        # quantifies the kernel's net effect including this link's cost
        # (on a local chip the link terms vanish and auto-routing would
        # pick the device itself)
        forced_elapsed, forced_extras = run_ours_subprocess(
            tmpdir, "tpu", env={"DEFUSE_DEVICE_SCREEN": "force"})
        if forced_elapsed is not None:
            run_extras["forced_device_screen"] = {
                "elapsed_s": round(forced_elapsed, 3),
                "pairs_s": round(n_pairs / forced_elapsed, 1),
                "screen_routing": forced_extras.get("screen_routing"),
                "stage_times_s": forced_extras.get("stage_times_s"),
            }
        # forced-device-verify leg (VERDICT r4 item 8): the frontend's
        # candidate-verify stage on the 3-bit packed device kernel at
        # bench scale, with hit-set identity asserted against the
        # default-routing run's frontend output digest
        forced_v_elapsed, forced_v_extras = run_ours_subprocess(
            tmpdir, "tpu", env={"DEFUSE_DEVICE_VERIFY": "force"})
        if forced_v_elapsed is not None:
            base_hash = run_extras.get("frontend_hash")
            got_hash = forced_v_extras.get("frontend_hash")
            run_extras["forced_device_verify"] = {
                "elapsed_s": round(forced_v_elapsed, 3),
                "pairs_s": round(n_pairs / forced_v_elapsed, 1),
                "frontend_pairs_s": forced_v_extras.get(
                    "frontend_pairs_s"),
                "frontend_hash_matches": (
                    None if not (base_hash and got_hash)
                    else got_hash == base_hash),
                "stage_times_s": forced_v_extras.get("stage_times_s"),
            }
        # measured-vs-ceiling statement for every device kernel
        # (VERDICT r3 item 10)
        rl = kernel_rooflines(run_extras)
        if rl:
            run_extras["kernel_rooflines"] = rl
    # routing crossover table (VERDICT r3 item 3): what the cost models
    # decide for every offloadable stage at the measured tunnel vs a
    # PCIe-class co-located link — evidence of where the device paths
    # engage on a production deployment
    try:
        import re

        from defuse_tpu.pipeline.routing import routing_table
        m = re.search(r"B=(\d+)", run_extras.get("screen_routing") or "")
        run_extras["routing_table"] = routing_table(
            screen_candidates=int(m.group(1)) if m else 46953)
    except Exception as e:
        print(f"routing table failed: {e}", file=sys.stderr)

    # verification pass in-process on CPU (deterministic, no hang risk)
    _e, our_outs = run_ours(paths, None, tmpdir, use_tpu=False)
    ours_pairs_s = n_pairs / ours_elapsed

    exact_match = None
    if ref_outs is not None:
        # all three evaluate artifacts must match byte-for-byte
        exact_match = all(
            pathlib.Path(our_outs[n]).read_text()
            == ref_outs[n].read_text()
            for n in ("seq", "break", "predalign"))

    # the ours subprocess re-probes the device right before measuring (a
    # flapping link can die between our probe and its run): its own
    # report of what actually executed wins over our earlier probe
    measured_device = run_extras.get("measured_device")
    if measured_device == "cpu":
        use_tpu = False
    result = {
        "metric": "read-pairs/s/chip (cluster+split-align); "
                  "fusion calls exact-match vs reference",
        "value": round(ours_pairs_s, 1),
        "unit": "read-pairs/s/chip",
        "vs_baseline": (round(ours_pairs_s / baseline_pairs_s, 3)
                        if baseline_pairs_s else None),
        "extra": {
            "device": "tpu" if use_tpu else "cpu-fallback",
            "n_read_pairs": n_pairs,
            "baseline_pairs_s": (round(baseline_pairs_s, 1)
                                 if baseline_pairs_s else None),
            "exact_match_vs_reference": exact_match,
            **run_extras,
        },
    }
    # full record: earlier stdout line + a file in the repo root (the
    # driver's capture keeps only the last 2000 chars; VERDICT r4 item 1)
    full = json.dumps(result)
    print("BENCH_FULL " + full, flush=True)
    extras_file = None
    try:
        (REPO / "BENCH_EXTRAS.json").write_text(full + "\n")
        extras_file = "BENCH_EXTRAS.json"
    except OSError:
        pass
    sys.stderr.flush()
    # the compact headline is the FINAL line — guaranteed <1.5KB so the
    # driver's tail capture always parses it
    print(json.dumps(compact_headline(result, extras_file)), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ours-only":
        ours_only(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] == "--em-ablation":
        em_ablation_only(sys.argv[2])
    else:
        main()
