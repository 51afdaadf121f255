"""Host-vs-device routing decisions at parameterized link operating
points.

The pipeline has three offloadable device stages, each guarded by a
cost model that weighs link round trips + transfer against measured
host and device rates:

* the split-DP candidate **screen** (``pipeline/discover.py``) — model
  mirrored here verbatim;
* candidate **verify** in the aligner frontend
  (``ops/verify_batch.verify_cost_model``);
* the bin-pair **EM** (``cluster/matepair_em_batch``) — native C++ vs
  the bucketed/segmented device driver.

On the tunneled dev chip (~24 MB/s, ~130 ms RTT) the models route small
batches to the host — correct there, but it leaves no recorded evidence
of where the crossover sits.  ``routing_table`` evaluates all three
decisions at arbitrary link points; the bench emits it for the measured
tunnel and a PCIe-class co-located link (the production deployment
shape), so the artifact shows the device paths engaging where a real
deployment would run.  ``DEFUSE_LINK_BW`` / ``DEFUSE_LINK_RTT``
(``core/devices.link_profile``) apply the same override to the live
routing code.
"""

from __future__ import annotations

# canonical link operating points (MB/s, ms)
LINK_POINTS = {
    # measured axon dev tunnel (BENCH_r03/r04 probe)
    "tunnel": {"bw_MBps": 23.5, "rtt_ms": 133.0},
    # co-located host + PCIe/direct-attached chip
    "pcie": {"bw_MBps": 1000.0, "rtt_ms": 1.0},
}

# measured rate constants (v5e chip / 4-core bench host, round 4):
# split-DP screen kernel marginal reads/s and native realign rate per
# core (pipeline/discover.py uses the same numbers)
SCREEN_DEVICE_READS_S = 700e3
SCREEN_HOST_READS_S_PER_CORE = 90e3
# EM — recalibrated to the round-5 device-resident driver's measured
# attribution (BENCH_r05 kernel_rooflines.em / em_roofline_probe part
# A on the bench workload: warm wall 2.62s for 3806 rows, device
# compute 1.17s, uplink 15.5MB, 25 slab dispatches, ~0.38MB down):
EM_NATIVE_ROWS_S = 5500.0        # native C++: 3806 rows / 0.57-0.80s
EM_DEVICE_COMPUTE_ROWS_S = 3250.0  # pure device compute (t_device_wait)
EM_UPLOAD_BYTES_PER_ROW = 4100     # bucketed x/y/u/nk/r0, measured
EM_SLAB_ROWS = 256                 # TPU_CHUNK_ROWS at bench shapes


def screen_decision(n_candidates: int, read_pad_len: int, link: dict,
                    ncpu: int = 4) -> dict:
    """The discover split-realign screen's model
    (``pipeline/discover.py``): 3 round trips + reads-matrix upload +
    kernel vs native realign on ncpu cores."""
    bw = link["bw_MBps"] * 1e6
    rtt = link["rtt_ms"] / 1e3
    t_dev = (3 * rtt + 2 * n_candidates * read_pad_len / bw
             + n_candidates / SCREEN_DEVICE_READS_S)
    t_host = n_candidates / (SCREEN_HOST_READS_S_PER_CORE * ncpu)
    return {"t_dev_s": round(t_dev, 4), "t_host_s": round(t_host, 4),
            "choice": "device" if t_dev < t_host else "host"}


def verify_decision(n_candidates: int, n_reads: int, read_len: int,
                    link: dict) -> dict:
    """The frontend verify stage's model
    (``ops/verify_batch.verify_cost_model``)."""
    from ..ops.verify_batch import verify_cost_model
    t_dev, t_host = verify_cost_model(n_candidates, n_reads, read_len,
                                      link)
    return {"t_dev_s": round(t_dev, 4), "t_host_s": round(t_host, 4),
            "choice": "device" if t_dev < t_host else "host"}


def em_decision(n_rows: int, link: dict) -> dict:
    """Bin-pair EM: native C++ vs the device-resident bucketed driver
    (``cluster/matepair_em_batch._run_bucketed``).  The device side
    pays the one-time group uploads (bytes + a couple of round trips),
    a fractional round trip per slab dispatch (dispatches pipeline
    behind each other; the packed ~30KB result pulls ride the same
    window), and pure device compute.  Calibrated against the measured
    round-5 attribution: at the bench workload (3806 rows, tunnel
    link) this predicts 3.1s vs the 2.6s measured warm wall."""
    bw = link["bw_MBps"] * 1e6
    rtt = link["rtt_ms"] / 1e3
    n_slabs = max(1, -(-n_rows // EM_SLAB_ROWS))
    t_dev = (2 * rtt + 0.3 * rtt * n_slabs
             + n_rows * EM_UPLOAD_BYTES_PER_ROW / bw
             + n_rows / EM_DEVICE_COMPUTE_ROWS_S)
    t_host = n_rows / EM_NATIVE_ROWS_S
    return {"t_dev_s": round(t_dev, 4), "t_host_s": round(t_host, 4),
            "choice": "device" if t_dev < t_host else "host"}


def routing_table(screen_candidates: int = 46953, read_pad_len: int = 64,
                  verify_candidates: int = 262144,
                  verify_reads: int = 20000, verify_read_len: int = 50,
                  em_rows: int = 3806, links: dict | None = None,
                  ncpu: int = 4) -> dict:
    """Decision table for every offloadable stage at every link point.
    Defaults are the bench dataset's measured workload shapes."""
    table = {}
    for name, link in (links or LINK_POINTS).items():
        table[name] = {
            "link": link,
            "screen": screen_decision(screen_candidates, read_pad_len,
                                      link, ncpu),
            "verify": verify_decision(verify_candidates, verify_reads,
                                      verify_read_len, link),
            "em": em_decision(em_rows, link),
        }
    return table
