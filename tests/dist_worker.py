"""Worker for tests/test_distributed_launch.py: one process of a real
2-process jax.distributed run on the CPU backend (gloo collectives).

Exercises the production launch layer end to end: env-wired
``init_distributed``, the global mesh over all processes' devices, a
jitted cross-process device collective (psum over the data axis), and
the cross-process read-stats merge.  Writes a JSON report the test
asserts on.  Usage: dist_worker.py <out_json> <n_pairs> <seed>.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def synth_sam(n_pairs, seed, readlen):
    """Deterministic proper-pair SAM shard (read_stats.pl input shape)."""
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n_pairs):
        isize = int(rng.integers(150, 350))
        seq = "A" * readlen
        qual = "I" * readlen
        lines.append(f"{seed}_{i}/1\t99\tchr1\t100\t255\t{readlen}M\t=\t"
                     f"{100 + isize - readlen}\t{isize}\t{seq}\t{qual}")
        lines.append(f"{seed}_{i}/2\t147\tchr1\t{100 + isize - readlen}\t"
                     f"255\t{readlen}M\t=\t100\t{-isize}\t{seq}\t{qual}")
    return lines


def main():
    out_path, n_pairs, seed = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from defuse_tpu.parallel.launch import (allgather_read_stats,
                                            global_mesh, init_distributed)
    from defuse_tpu.stats.readstats import read_stats_from_sam

    pid, n_proc = init_distributed()
    assert pid == jax.process_index()
    assert n_proc == jax.process_count()

    # per-process shard: different sizes and read lengths per process
    local = read_stats_from_sam(
        synth_sam(n_pairs + pid * 1000, seed + pid, 50 + 25 * pid))

    merged = allgather_read_stats(local)

    # device collective across processes: per-device accepted-candidate
    # counts psum'd over the global data axis (jitted, runs on the
    # 2-process CPU mesh through gloo)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = global_mesh(inst_size=1)
    n_dev = len(jax.devices())
    local_counts = np.arange(len(jax.local_devices()), dtype=np.int32) \
        + 100 * (pid + 1)
    global_counts = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", )), local_counts,
        global_shape=(n_dev,))

    @jax.jit
    def total(x):
        return jnp.sum(x)

    psum_total = int(jax.device_get(total(global_counts)))

    report = {
        "pid": pid,
        "n_proc": n_proc,
        "n_devices": n_dev,
        "merged": merged.format(),
        "psum_total": psum_total,
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh)
    print(f"worker {pid}: ok", flush=True)


if __name__ == "__main__":
    main()
