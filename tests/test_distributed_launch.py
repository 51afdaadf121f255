"""Real multi-process jax.distributed launch on this machine.

The reference scales by forking alignjobs through cmdrunner submitters
(``cmdrunner.pm:161-292``) and merging shard artifacts with Perl
mergers (``merge_read_stats.pl``).  Our distribution layer
(``parallel/launch.py``) replaces that with env-wired
``jax.distributed`` SPMD; round 1 could only contract-test it.  This
test runs it for real: two OS processes, one coordination service,
4 virtual CPU devices each (8 global), gloo cross-process collectives —
asserting the global mesh forms, a jitted psum reduces across
processes, and the cross-process read-stats merge equals the
sequential ``merge_read_stats`` oracle.
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = pathlib.Path(__file__).resolve().parent / "dist_worker.py"

N_PAIRS = 500
SEED = 42


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_launch(tmp_path):
    port = _free_port()
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"report.{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(out), str(N_PAIRS),
             str(SEED)],
            env=env, cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, stderr[-3000:]

    reports = [json.loads(out.read_text()) for out in outs]
    for pid, rep in enumerate(reports):
        assert rep["pid"] == pid
        assert rep["n_proc"] == 2
        assert rep["n_devices"] == 8

    # every process saw the same merged stats, equal to the sequential
    # oracle merge of the two shards in process order
    from defuse_tpu.stats.readstats import (merge_read_stats,
                                            read_stats_from_sam)
    sys.path.insert(0, str(WORKER.parent))
    from dist_worker import synth_sam
    oracle = merge_read_stats([
        read_stats_from_sam(synth_sam(N_PAIRS, SEED, 50)),
        read_stats_from_sam(synth_sam(N_PAIRS + 1000, SEED + 1, 75)),
    ])
    assert reports[0]["merged"] == reports[1]["merged"] == oracle.format()

    # the jitted psum reduced per-device counts across both processes:
    # proc 0 contributes 100..103, proc 1 contributes 200..203
    want = sum(range(100, 104)) + sum(range(200, 204))
    assert reports[0]["psum_total"] == reports[1]["psum_total"] == want
