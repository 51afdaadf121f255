"""Batched candidate verification — device mismatch counting for the
seed-and-extend aligner.

The aligner's verify step compares every candidate placement window
against its read end-to-end (no gaps, bowtie-v model).  On device this is
a pure VPU workload: gather the reference windows, compare, count.  The
reference codes array ships to the device once per index; candidate
batches stream through.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("window",))
def _verify(ref_codes, starts, reads_codes, read_lens, window):
    """Mismatch counts for candidate placements.

    ref_codes: (N,) int8 global reference codes
    starts: (C,) int64 candidate global start positions (clipped valid)
    reads_codes: (C, L) int8 per-candidate read codes
    read_lens: (C,) int32
    """
    L = reads_codes.shape[1]
    idx = starts[:, None] + jnp.arange(window, dtype=starts.dtype)[None, :]
    idx = jnp.clip(idx, 0, ref_codes.shape[0] - 1)
    windows = ref_codes[idx]
    in_len = jnp.arange(L, dtype=jnp.int32)[None, :] < read_lens[:, None]
    diff = (windows[:, :L] != reads_codes) & in_len
    return jnp.sum(diff, axis=1).astype(jnp.int32)


class DeviceVerifier:
    """verify_fn adapter for ``SeedIndex.verify``: keeps the reference
    codes resident on device and batches candidate verification."""

    def __init__(self, batch: int = 1 << 16):
        self.batch = batch
        # id(codes) alone is unsafe as a cache key (a GC'd array's address
        # can be reused): hold a strong reference to the host array next to
        # its device buffer and verify identity on hit.  One entry per
        # distinct reference so alternating cdna/genome batches don't
        # re-upload the genome every call.
        self._resident: dict[int, tuple] = {}

    def __call__(self, codes, gather_idx, reads_codes, lens):
        key = id(codes)
        entry = self._resident.get(key)
        if entry is None or entry[0] is not codes:
            entry = (codes, jax.device_put(jnp.asarray(codes, jnp.int8)))
            self._resident[key] = entry
        ref_dev = entry[1]
        starts = np.ascontiguousarray(gather_idx[:, 0])
        L = reads_codes.shape[1]
        out = np.empty(len(starts), dtype=np.int32)
        for lo in range(0, len(starts), self.batch):
            hi = min(lo + self.batch, len(starts))
            out[lo:hi] = np.asarray(_verify(
                ref_dev, jnp.asarray(starts[lo:hi]),
                jnp.asarray(reads_codes[lo:hi], jnp.int8),
                jnp.asarray(lens[lo:hi], jnp.int32), L))
        return out
