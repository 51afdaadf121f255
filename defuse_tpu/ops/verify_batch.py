"""Batched candidate verification — device mismatch counting for the
seed-and-extend aligner.

The aligner's verify step compares every candidate placement window
against its read end-to-end (no gaps, bowtie -v model; the ``-k 100 -m
100`` runs at ``alignjob.pl:246-256`` are what this replaces).  On device
this is a pure VPU workload: gather the reference windows, compare,
count.  Design for the TPU memory system:

* the reference ships once per index as a **3-bit-per-base plane** — 10
  bases per uint32 word (codes 0..4 incl. N fit in 3 bits, so N==N
  compares equal with no separate N plane), 0.4 bytes/base — a human
  genome+cdna resident set of ~1.6GB;
* per candidate the window's packed words are funnel-shifted out of two
  adjacent reference words (the packing uses bits 0..29, so the shift
  by ``30 - 3*lane`` is branch-free for every lane 0..9), XORed against
  the packed read word, and mismatching bases counted by OR-folding each
  3-bit group to its low bit and ``population_count`` — **10 bases per
  lane per ~10 VPU ops** instead of the one-base-per-int32-lane
  formulation this replaces (16x less gather traffic, ~14x less VPU
  work; see the r3->r4 verify_kernel bench history);
* reads ship once per verify call packed the same way; the
  per-candidate read rows are gathered on device by ``read_idx``, so the
  uplink carries ~0.4*B*L read bytes + 8 bytes/candidate instead of C*L
  (candidates outnumber reads ~10x);
* only the (C,) int32 mismatch counts return.

Bit-exact contract: identical mismatch counts to the NumPy oracle in
``SeedIndex.verify`` for any codes (including N=4 on either side: N==N
compares equal there, which the 3-bit XOR reproduces exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# verify-kernel throughput (candidate-lanes/s, i.e. bases compared per
# second): the bench's on-chip VERIFY_KERNEL microbench measures the
# real number; this default is the recorded v5e figure for the 3-bit
# packed kernel.  Host rate: NumPy oracle, single thread, measured on
# the 4-core bench host.
DEVICE_LANES_S = 800e6  # measured 880M bases/s on v5e (BENCH_r04)
HOST_CANDIDATES_S = 3e6

# 3-bit packing: 10 bases per uint32 word, base i of a word at bits
# [3i, 3i+3).  Bits 30,31 unused so funnel shifts never need a
# shift-by-32 special case.
BASES_PER_WORD = 10
_GROUP_LOW_BITS = 0x09249249  # bits 0,3,6,...,27 — one per base slot
_WORD_MASK = 0x3FFFFFFF       # low 30 bits


def pack_codes3(codes: np.ndarray) -> np.ndarray:
    """Pack int8 codes (0..4, N=4) into a 3-bit-per-base uint32 plane:
    10 bases per word in bits 0..29 (zero-padded tail)."""
    n = len(codes)
    n10 = (n + BASES_PER_WORD - 1) // BASES_PER_WORD * BASES_PER_WORD
    p = np.zeros(n10, np.uint32)
    p[:n] = codes.astype(np.uint32)
    p = p.reshape(-1, BASES_PER_WORD)
    packed = np.zeros(len(p), np.uint32)
    for j in range(BASES_PER_WORD):
        packed |= p[:, j] << np.uint32(3 * j)
    return packed


def pack_rows3(codes: np.ndarray) -> np.ndarray:
    """Row-wise 3-bit packing of an (B, L) int8 code matrix into
    (B, ceil(L/10)) uint32 (positions >= L packed as 0)."""
    b, length = codes.shape
    w = (length + BASES_PER_WORD - 1) // BASES_PER_WORD
    p = np.zeros((b, w * BASES_PER_WORD), np.uint32)
    p[:, :length] = codes.astype(np.uint32)
    p = p.reshape(b, w, BASES_PER_WORD)
    packed = np.zeros((b, w), np.uint32)
    for j in range(BASES_PER_WORD):
        packed |= p[:, :, j] << np.uint32(3 * j)
    return packed


@functools.partial(jax.jit, static_argnames=("L",))
def _verify_packed3(ref3, word10, lane10, reads3, read_idx, read_lens, L):
    """Mismatch counts for candidate placements against the 3-bit packed
    reference plane.

    Candidate start positions arrive split as (word10, lane10) =
    (start // 10, start % 10) so every on-device index stays int32
    (word indices cover references up to ~21 Gbp; ``pack_codes3``'s
    caller guards beyond that).

    ref3: (ceil(N/10),) uint32 plane; word10/lane10: (C,) int32;
    reads3: (B, W) uint32 packed reads; read_idx: (C,) int32;
    read_lens: (B,) int32; L: read-matrix base length (static).

    Per word the candidate window is funnel-shifted out of two adjacent
    reference words (the shift by ``30 - 3*lane`` is in [3, 30] —
    branch-free since only bits 0..29 are populated), XORed with the
    packed read word, each 3-bit group OR-folded to its low bit, length-
    masked, and popcounted.
    """
    w = (L + BASES_PER_WORD - 1) // BASES_PER_WORD
    k = jnp.arange(w + 1, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(word10[:, None] + k, ref3.shape[0] - 1)
    g = ref3[idx]                                  # (C, W+1) uint32
    sh = (3 * lane10).astype(jnp.uint32)[:, None]  # 0..27
    lo = g[:, :-1] >> sh
    hi = (g[:, 1:] << (jnp.uint32(30) - sh)) & _WORD_MASK
    win = (lo | hi) & _WORD_MASK                   # (C, W)
    rw = reads3[read_idx]                          # (C, W)
    x = win ^ rw
    t = (x | (x >> 1) | (x >> 2)) & _GROUP_LOW_BITS
    # length mask: word k holds bases [10k, 10k+10); valid count v in
    # [0, 10] -> mask of the low 3v bits (1 << 30 stays in uint32)
    lens = read_lens[read_idx][:, None]
    v = jnp.clip(lens - BASES_PER_WORD
                 * jnp.arange(w, dtype=jnp.int32)[None, :],
                 0, BASES_PER_WORD).astype(jnp.uint32)
    lm = (jnp.uint32(1) << (3 * v)) - jnp.uint32(1)
    counts = jax.lax.population_count(t & lm)
    return jnp.sum(counts, axis=1).astype(jnp.int32)


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
    # reads ship 3-bit packed (0.4 B/base); candidates as 8B (word, lane)
    up_bytes = 0.4 * n_reads * L + 8 * n_candidates
    t_dev = 2 * rtt + up_bytes / bw + n_candidates * L / DEVICE_LANES_S
    t_host = n_candidates / HOST_CANDIDATES_S
    return t_dev, t_host


class DeviceVerifier:
    """verify_fn adapter for ``SeedIndex.verify``: keeps the packed
    reference plane resident on device and batches candidate
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

    def _device_plane(self, codes):
        key = id(codes)
        entry = self._resident.get(key)
        if entry is None or entry[0] is not codes:
            if len(codes) >= (1 << 31) * BASES_PER_WORD:
                raise NotImplementedError(
                    "3-bit packed verify addresses references < ~21 Gbp; "
                    "shard the reference across indices beyond that")
            entry = (codes, jax.device_put(pack_codes3(np.asarray(codes))))
            self._resident[key] = entry
        return entry[1]

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
        ref3 = self._device_plane(codes)
        L = reads_codes.shape[1]
        # out-of-bounds candidates are filtered by the caller afterwards;
        # clip here so the packed gathers stay in range.  Positions split
        # into (word, lane) on the host: device indexing stays int32
        starts = np.clip(np.asarray(cand_pos, np.int64), 0,
                         max(0, len(codes) - 1))
        word10 = (starts // BASES_PER_WORD).astype(np.int32)
        lane10 = (starts % BASES_PER_WORD).astype(np.int32)
        reads_dev = jnp.asarray(pack_rows3(np.asarray(reads_codes)))
        lens_dev = jnp.asarray(read_lens, jnp.int32)
        ridx = np.asarray(read_idx, np.int32)
        out = np.empty(n, dtype=np.int64)
        for lo in range(0, n, self.batch):
            hi = min(lo + self.batch, n)
            out[lo:hi] = np.asarray(_verify_packed3(
                ref3, jnp.asarray(word10[lo:hi]),
                jnp.asarray(lane10[lo:hi]), reads_dev,
                jnp.asarray(ridx[lo:hi]), lens_dev, L))
        return out
