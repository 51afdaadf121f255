"""Batched candidate verification — device mismatch counting for the
seed-and-extend aligner.

The aligner's verify step compares every candidate placement window
against its read end-to-end (no gaps, bowtie -v model; the ``-k 100 -m
100`` runs at ``alignjob.pl:246-256`` are what this replaces).  On device
this is a pure VPU workload: gather the reference windows, compare,
count.  Design for the TPU memory system:

* the reference ships once per index as a 2-bit-packed code plane plus a
  1-bit N plane (3 bits/base vs 8 — a human genome resident set of
  ~1.2GB instead of 3.1GB), unpacked per window on the fly;
* reads ship once per verify call as the unique read matrix; the
  per-candidate read rows are gathered on device by ``read_idx``, so the
  uplink carries B*L read bytes + 8 bytes/candidate instead of C*L
  (candidates outnumber reads ~10x);
* only the (C,) int8 mismatch counts return.

Bit-exact contract: identical mismatch counts to the NumPy oracle in
``SeedIndex.verify`` for any codes (including N=4 on either side: N==N
compares equal there, which the N plane reproduces exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# verify-kernel throughput (candidate-lanes/s): the bench's on-chip
# VERIFY_KERNEL microbench measures the real number; this default is the
# recorded v5e figure (gather-bound workload).  Host rate: NumPy oracle,
# single thread, measured on the 4-core bench host.
DEVICE_LANES_S = 40e6
HOST_CANDIDATES_S = 3e6


def pack_codes(codes: np.ndarray):
    """Pack int8 codes (0..4) into (low2 plane, N plane) uint32 arrays:
    16 bases per word in the low2 plane, 32 per word in the N plane.
    code == low2 + 4 * n_bit for every input code."""
    n = len(codes)
    c = codes.astype(np.uint32)
    low2 = c & 3
    nbit = (c >> 2) & 1
    n16 = (n + 15) // 16 * 16
    p2 = np.zeros(n16, np.uint32)
    p2[:n] = low2
    p2 = p2.reshape(-1, 16)
    packed2 = np.zeros(len(p2), np.uint32)
    for j in range(16):
        packed2 |= p2[:, j] << np.uint32(2 * j)
    n32 = (n + 31) // 32 * 32
    p1 = np.zeros(n32, np.uint32)
    p1[:n] = nbit
    p1 = p1.reshape(-1, 32)
    packed1 = np.zeros(len(p1), np.uint32)
    for j in range(32):
        packed1 |= p1[:, j] << np.uint32(j)
    return packed2, packed1


@functools.partial(jax.jit, static_argnames=("L",))
def _verify_packed(ref2, ref1, word16, lane16, reads_codes, read_idx,
                   read_lens, L):
    """Mismatch counts for candidate placements against the packed
    reference planes.

    Candidate start positions arrive split as (word16, lane16) =
    (start >> 4, start & 15) so every on-device index stays within
    int32 even for multi-Gbp references (TPU int64 indexing is
    unsupported; a packed word index covers 2^35 bases).

    ref2: (ceil(N/16),) uint32 2-bit plane; ref1: (ceil(N/32),) uint32
    N plane; word16/lane16: (C,) int32; reads_codes: (B, L) int8;
    read_idx: (C,) int32; read_lens: (B,) int32.
    """
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    pos16 = lane16[:, None] + j            # 0 .. 15 + L
    idx2 = jnp.minimum(word16[:, None] + (pos16 >> 4), ref2.shape[0] - 1)
    w2 = ref2[idx2]
    low2 = (w2 >> ((pos16 & 15).astype(jnp.uint32) * 2)) & 3
    word32 = word16 >> 1
    lane32 = lane16 + 16 * (word16 & 1)
    pos32 = lane32[:, None] + j
    idx1 = jnp.minimum(word32[:, None] + (pos32 >> 5), ref1.shape[0] - 1)
    w1 = ref1[idx1]
    nbit = (w1 >> (pos32 & 31).astype(jnp.uint32)) & 1
    window = (low2 + 4 * nbit).astype(jnp.int8)
    reads = reads_codes[read_idx]
    lens = read_lens[read_idx]
    in_len = j < lens[:, None]
    diff = (window != reads) & in_len
    return jnp.sum(diff, axis=1).astype(jnp.int32)


def verify_cost_model(n_candidates: int, n_reads: int, L: int,
                      link: dict | None) -> tuple[float, float]:
    """(t_device, t_host) estimates for one verify call — the screen's
    cost model shape (``pipeline/discover.py``): round trips + uplink
    bytes + kernel time vs the measured host verify rate.  On a local
    chip the link terms vanish and the device wins for any large batch;
    over a tunneled dev link the host path keeps small batches."""
    import os
    link = link or {}
    bw = link.get("bw_MBps", 30.0) * 1e6
    rtt = link.get("rtt_ms", 50.0) / 1e3
    up_bytes = n_reads * L + 8 * n_candidates
    t_dev = 2 * rtt + up_bytes / bw + n_candidates * L / DEVICE_LANES_S
    t_host = n_candidates / HOST_CANDIDATES_S
    return t_dev, t_host


class DeviceVerifier:
    """verify_fn adapter for ``SeedIndex.verify``: keeps the packed
    reference planes resident on device and batches candidate
    verification; falls back to the host oracle per-call when the cost
    model says the link dominates (``DEFUSE_DEVICE_VERIFY=force/off``
    overrides)."""

    def __init__(self, batch: int = 1 << 17):
        self.batch = batch
        # id(codes) alone is unsafe as a cache key (a GC'd array's address
        # can be reused): hold a strong reference to the host array next to
        # its device buffers and verify identity on hit.  One entry per
        # distinct reference so alternating cdna/genome batches don't
        # re-upload the genome every call.
        self._resident: dict[int, tuple] = {}

    def _device_planes(self, codes):
        key = id(codes)
        entry = self._resident.get(key)
        if entry is None or entry[0] is not codes:
            p2, p1 = pack_codes(np.asarray(codes))
            entry = (codes, jax.device_put(p2), jax.device_put(p1))
            self._resident[key] = entry
        return entry[1], entry[2]

    def __call__(self, codes, cand_pos, reads_codes, read_idx, read_lens):
        import os
        mode = os.environ.get("DEFUSE_DEVICE_VERIFY", "auto")
        n = len(cand_pos)
        if mode != "force":
            from ..core.devices import link_profile
            t_dev, t_host = verify_cost_model(
                n, reads_codes.shape[0], reads_codes.shape[1],
                link_profile() or {})
            if mode == "off" or t_dev >= t_host:
                L = reads_codes.shape[1]
                gather_idx = np.clip(
                    cand_pos[:, None] + np.arange(L)[None, :], 0,
                    len(codes) - 1)
                windows = codes[gather_idx]
                lens = read_lens[read_idx]
                diff = (windows != reads_codes[read_idx]) \
                    & (np.arange(L)[None, :] < lens[:, None])
                return diff.sum(axis=1)
        ref2, ref1 = self._device_planes(codes)
        L = reads_codes.shape[1]
        # out-of-bounds candidates are filtered by the caller afterwards;
        # clip here so the packed gathers stay in range.  Positions split
        # into (word, lane) on the host: device indexing stays int32 for
        # references up to 2^35 bases
        starts = np.clip(np.asarray(cand_pos, np.int64), 0,
                         max(0, len(codes) - 1))
        word16 = (starts >> 4).astype(np.int32)
        lane16 = (starts & 15).astype(np.int32)
        reads_dev = jnp.asarray(reads_codes, jnp.int8)
        lens_dev = jnp.asarray(read_lens, jnp.int32)
        ridx = np.asarray(read_idx, np.int32)
        out = np.empty(n, dtype=np.int64)
        for lo in range(0, n, self.batch):
            hi = min(lo + self.batch, n)
            out[lo:hi] = np.asarray(_verify_packed(
                ref2, ref1, jnp.asarray(word16[lo:hi]),
                jnp.asarray(lane16[lo:hi]), reads_dev,
                jnp.asarray(ridx[lo:hi]), lens_dev, L))
        return out
