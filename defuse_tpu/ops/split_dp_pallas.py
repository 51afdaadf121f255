"""Pallas TPU kernel for the batched split-read DP.

Same recurrence as ``ops/split_dp_batch.py`` (integer scores — bit-exact
vs the host oracle), hand-scheduled for TPU v5e:

* grid over batch tiles; each program keeps its whole working set (ref
  tile, previous DP column, output row maxima) in VMEM for the entire
  read-position loop — no HBM traffic between rows;
* the horizontal gap recurrence ``col[i] = max(vert[i], col[i-1]+gap)``
  is a prefix max with linear decay, computed with a lane-wise
  log-step shift-max cascade (exact for ints);
* the cascade rolls are *mask-free* except the final step: the lane
  axis is padded so that every non-final circular roll wraps lanes
  that are provably NEG (invalid ref lanes are re-masked to NEG each
  row; ``W >= max_ref_len + 1 + s_max`` covers reach-back up to
  ``2*s_{k-1} - 1 = s_max - 1``), and the final step — whose wrapped
  tail would otherwise need another ``s_max`` of padding — masks its
  wrapped lanes to NEG with one select per row;
* the i==0 DP boundary column (``m[0][j] = j*gap``) emerges from the
  recurrence itself: lane 0 only ever receives ``prev[0] + gap``;
* DP values are bounded by ``±2*n_rows`` (MATCH=2 decays GAP=-2 per
  lane), so the working values optionally run in int16 — two values per
  native 32-bit VPU lane, doubling arithmetic density.  The int16 path
  is bit-exact (all intermediates fit comfortably; NEG16 chosen so no
  add can wrap) and is tried once at dispatch, falling back to int32 if
  Mosaic declines to lower it.

Layout: lane axis = reference positions (column 0 is the DP boundary),
sublane axis = batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..align.split_dp import GAP, MATCH, MIN_SPLIT_SCORE, MISMATCH

NEG = np.int32(-(1 << 30))
NEG16 = np.int16(-16384)  # NEG16 + min(decay) and + sub stay in int16
LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _max_shift(n_rows: int) -> int:
    """Largest cascade shift: powers of two below 2*n_rows (the provable
    propagation window — see the cascade comment in ``_dp_kernel``)."""
    s = 1
    while s * 2 < 2 * n_rows:
        s *= 2
    return s


def _dp_kernel(refs_ref, reads_ref, lens_ref, out_ref, *, n_rows: int,
               width: int, i16: bool):
    """One batch tile; refs_ref (TB, W) holds the boundary column at lane 0
    and ref char c_i at lane i (i>=1).

    Mosaic cannot index the lane axis at dynamic offsets, so the per-row
    read character is extracted with a one-hot masked reduction and the
    per-row maxima are accumulated into the output block with a one-hot
    select — both cheap VPU ops.
    """
    dtype = jnp.int16 if i16 else jnp.int32
    neg = NEG16 if i16 else NEG

    def roll_lanes(x, sh):
        # Mosaic's dynamic_rotate only lowers 32-bit data.  16-bit
        # vectors pack PAIRS OF SUBLANES into each 32-bit vreg row, so
        # a lane roll of the int32 bitcast ((TB, W) i16 -> (TB/2, W)
        # i32) rolls both packed sublanes by exactly sh int16 lanes —
        # an exact i16 lane roll for any shift.
        if x.dtype.itemsize == 2:
            return pltpu.bitcast(
                pltpu.roll(pltpu.bitcast(x, jnp.int32), sh, 1),
                jnp.int16)
        return pltpu.roll(x, sh, 1)

    refs = refs_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, refs.shape, 1)
    decay = (GAP * lane).astype(dtype)
    valid = lane <= lens_ref[:]  # (TB, W); lens: (TB, 1) ref lengths

    reads = reads_ref[:]
    read_lane = jax.lax.broadcasted_iota(jnp.int32, reads.shape, 1)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)

    # The prefix-max cascade needs to cover only 2*n_rows - 1 lanes, not
    # the whole width: propagation decays GAP=-2 per lane while row-j DP
    # values are bounded within [-2j, 2j], so a value can never improve a
    # lane more than (4*n_rows)/2 - 1 positions away.  The log-step
    # cascade with steps 1..2^k covers a window of 2^(k+1)-1 lanes, so
    # stopping once the window reaches 2*n_rows is exact (bit-identical;
    # pinned by the interpret-mode oracle tests).
    gap = dtype(GAP)
    match_ = dtype(MATCH)
    mismatch = dtype(MISMATCH)

    def body(j, carry, shifts):
        prev, out_acc = carry
        # read char j-1 via one-hot reduction along lanes
        ch = jnp.sum(jnp.where(read_lane == j - 1, reads, 0), axis=1,
                     keepdims=True)  # (TB, 1)
        sub = jnp.where(refs == ch, match_, mismatch)
        # prev shifted right one lane; the wrapped lane W-1 is always an
        # invalid (NEG) lane, so no boundary select is needed
        prev_s = roll_lanes(prev, 1)
        vert = jnp.maximum(prev_s + sub, prev + gap)
        # prefix max of (vert - decay) along lanes; invalid lanes pinned
        # to NEG so the mask-free circular rolls wrap only NEG values.
        # Only the FINAL step needs a wrap select: steps j < k pull
        # from tail lanes whose accumulated windows reach back at most
        # 2*s_{k-1} - 1 = s_max - 1 lanes, which the W >= R + 1 + s_max
        # padding covers; the final step's own wrapped lanes would need
        # another s_max of padding, so they are masked to NEG instead
        # (exactly the non-circular semantics: lanes i < s_max receive
        # nothing from a shift past lane 0).
        x = jnp.where(valid, vert - decay, neg)
        for sh in shifts[:-1]:
            x = jnp.maximum(x, roll_lanes(x, sh))
        if shifts:
            sh = shifts[-1]
            x = jnp.maximum(x, jnp.where(lane >= sh,
                                         roll_lanes(x, sh), neg))
        col = x + decay
        # invalid lanes hold neg+decay << any valid value: plain row max
        # (in int32 — Mosaic has no int16 reductions; the cascade, which
        # dominates, stays int16)
        rowmax = jnp.max(col.astype(jnp.int32), axis=1, keepdims=True)
        out_acc = jnp.where(out_lane == j, rowmax, out_acc)
        return col, out_acc

    # Segmented row loop: the cascade at row j only needs to cover a
    # window of 2j - 1 lanes (row-j values are bounded within [-2j, 2j]
    # while propagation decays GAP=-2 per lane), so rows in the segment
    # (2^(m-1), 2^m] run shifts 1..2^m — shallower cascades for early
    # rows, bit-identical to the uniform-depth loop (pinned by the
    # interpret-mode oracle tests).  Each segment keeps the final-step
    # wrap select, mirroring the uniform kernel's exactness argument.
    carry = (jnp.where(valid, dtype(0), neg),
             jnp.zeros(out_ref.shape, dtype=jnp.int32))
    lo = 1
    hi_cap = 1
    while lo <= n_rows:
        hi = min(n_rows, hi_cap)
        seg_shifts = []
        s = 1
        while s < min(width, 2 * hi):
            seg_shifts.append(s)
            s *= 2
        carry = jax.lax.fori_loop(
            lo, hi + 1, functools.partial(body, shifts=seg_shifts), carry)
        lo = hi + 1
        hi_cap *= 2
    out_ref[:] = carry[1]


_I16_OK: dict = {}


def _tighten(refs, ref_lens, reads, read_lens):
    """Host-side static shape tightening: inputs here are concrete, so
    slice away all-pad read rows and ref lanes before the jitted
    dispatch — the row loop and the cascade width then cover only real
    data (padded 64-wide 50bp reads waste 22% of the row loop).  The
    caller pads the returned rowmax back to the original width."""
    L = reads.shape[1]
    lmax = int(np.max(read_lens)) if np.size(read_lens) else 0
    lmax = max(1, min(L, lmax))
    rmax = int(np.max(ref_lens)) if np.size(ref_lens) else 0
    rmax = max(1, min(refs.shape[1], rmax))
    return (refs[:, :rmax] if rmax < refs.shape[1] else refs,
            reads[:, :lmax] if lmax < L else reads, lmax)


def _pad_rowmax(rowmax, L):
    lmax = rowmax.shape[1] - 1
    if lmax >= L:
        return rowmax
    return jnp.pad(rowmax, ((0, 0), (0, L - lmax)))


def dp_row_maxima_pallas(refs, ref_lens, reads, read_lens, batch_tile=256):
    """Dispatch wrapper: compiled Mosaic kernel on TPU, interpreter
    elsewhere (CPU test meshes).  Tries the int16 value path once and
    caches whether the backend lowers it."""
    interpret = jax.default_backend() != "tpu"
    key = jax.default_backend()
    if key not in _I16_OK:
        # int16 probing is opt-in: the current TPU Mosaic toolchain
        # declines int16 (and the probe's failing remote compile costs
        # seconds per process); interpret mode validates it for free
        import os
        if interpret or os.environ.get("DEFUSE_PALLAS_I16"):
            try:
                _dp_row_maxima_pallas(refs[:1], ref_lens[:1], reads[:1],
                                      read_lens[:1], 8, interpret,
                                      True).block_until_ready()
                _I16_OK[key] = True
            except Exception:
                _I16_OK[key] = False
        else:
            _I16_OK[key] = False
    L = reads.shape[1]
    refs_t, reads_t, _lmax = _tighten(refs, ref_lens, reads, read_lens)
    rowmax = _dp_row_maxima_pallas(refs_t, ref_lens, reads_t, read_lens,
                                   batch_tile, interpret, _I16_OK[key])
    return _pad_rowmax(rowmax, L)


@functools.partial(jax.jit,
                   static_argnames=("batch_tile", "interpret", "i16"))
def _dp_row_maxima_pallas(refs, ref_lens, reads, read_lens, batch_tile=256,
                          interpret=False, i16=False):
    """Pallas equivalent of ``split_dp_batch.dp_row_maxima``.

    refs: (B, R) int32 char codes (0 = pad), ref_lens (B,), reads (B, L)
    int32, read_lens (B,).  Returns rowmax (B, L+1) int32, anchor-clamped
    and row-masked exactly like the XLA path.
    """
    B, R = refs.shape
    L = reads.shape[1]
    # lane padding: mask-free cascade rolls (all but the final step,
    # which carries its own wrap select — see _dp_kernel) require the
    # wrapped lanes to be provably NEG: W >= R + 1 + s_max.  (Without
    # the final-step select this bound was wrong whenever lane rounding
    # added < s_max - 1 slack — e.g. R=130, L=64 wrapped real maxima
    # into the low lanes; pinned by test_lane_padding_widths.)
    W = _round_up(R + 1 + _max_shift(L), LANES)
    Lp = _round_up(L + 1, LANES)
    TB = min(batch_tile, _round_up(B, 8))
    Bp = _round_up(B, TB)

    # boundary column at lane 0: shift ref chars right by one
    refs_sh = jnp.zeros((Bp, W), dtype=jnp.int32)
    refs_sh = refs_sh.at[:B, 1:R + 1].set(refs.astype(jnp.int32))
    reads_p = jnp.zeros((Bp, _round_up(L, LANES)), dtype=jnp.int32)
    reads_p = reads_p.at[:B, :L].set(reads.astype(jnp.int32))
    lens_p = jnp.zeros((Bp, 1), dtype=jnp.int32)
    lens_p = lens_p.at[:B, 0].set(ref_lens.astype(jnp.int32))

    grid = (Bp // TB,)
    out = pl.pallas_call(
        functools.partial(_dp_kernel, n_rows=L, width=W, i16=i16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, reads_p.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, Lp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Lp), jnp.int32),
        interpret=interpret,
    )(refs_sh, reads_p, lens_p)

    rowmax = out[:B, :L + 1]
    row_valid = jnp.arange(L + 1, dtype=jnp.int32)[None, :] \
        <= read_lens[:, None]
    rowmax = jnp.where(rowmax >= MIN_SPLIT_SCORE, rowmax, 0)
    return jnp.where(row_valid, rowmax, 0)


def screen_candidates_pallas(uref1, ulen1, uref2r, ulen2, ref_idx, reads,
                             read_lens, min_scores):
    """Transfer-lean candidate screen: returns per-candidate max split
    score (0 = reject).

    The candidate set references few unique fusion flank pairs, so only
    the *unique* flanks ship to the device (uint8); per-candidate flank
    rows are gathered on device by ``ref_idx``.  ``uref2r`` is the
    reversed second flank.  Reads ship once (uint8); their reversal for
    the second-flank DP happens on device.  Only the (B,) max-score
    vector comes back — on a high-latency link this cuts the screen's
    traffic ~50x vs shipping per-candidate int32 matrices both ways.
    """
    interpret = jax.default_backend() != "tpu"
    key = jax.default_backend()
    if key not in _I16_OK:
        dp_row_maxima_pallas(uref1.astype(jnp.int32)[:1],
                             ulen1.astype(jnp.int32)[:1],
                             reads.astype(jnp.int32)[:1],
                             read_lens.astype(jnp.int32)[:1])
    # static shape tightening (see _tighten): slice to the true max
    # read / flank lengths before the jitted dispatch
    lmax = int(np.max(read_lens)) if np.size(read_lens) else 0
    lmax = max(1, min(reads.shape[1], lmax))
    rmax = 0
    for ln in (ulen1, ulen2):
        if np.size(ln):
            rmax = max(rmax, int(np.max(ln)))
    rmax = max(1, min(uref1.shape[1], rmax))
    i16 = _I16_OK[key]
    return _screen_candidates(uref1[:, :rmax], ulen1, uref2r[:, :rmax],
                              ulen2, ref_idx, reads[:, :lmax],
                              read_lens, min_scores, interpret, i16)


@functools.partial(jax.jit, static_argnames=("interpret", "i16"))
def _screen_candidates(uref1, ulen1, uref2r, ulen2, ref_idx, reads,
                       read_lens, min_scores, interpret=False, i16=False):
    L = reads.shape[1]
    reads32 = reads.astype(jnp.int32)
    read_lens = read_lens.astype(jnp.int32)
    # device-side reversal of the padded variable-length reads
    pos = read_lens[:, None] - 1 - jnp.arange(L, dtype=jnp.int32)[None, :]
    rev = jnp.take_along_axis(reads32, jnp.clip(pos, 0, L - 1), axis=1)
    rev = jnp.where(jnp.arange(L, dtype=jnp.int32)[None, :]
                    < read_lens[:, None], rev, 0)

    r1 = uref1.astype(jnp.int32)[ref_idx]
    l1 = ulen1.astype(jnp.int32)[ref_idx]
    r2 = uref2r.astype(jnp.int32)[ref_idx]
    l2 = ulen2.astype(jnp.int32)[ref_idx]

    rowmax = _dp_row_maxima_pallas(
        jnp.concatenate([r1, r2]), jnp.concatenate([l1, l2]),
        jnp.concatenate([reads32, rev]),
        jnp.concatenate([read_lens, read_lens]),
        256, interpret, i16)
    B = reads.shape[0]
    rm1 = rowmax[:B]
    rm2 = rowmax[B:]

    from .split_dp_batch import combine_split_scores
    max_score, _ = combine_split_scores(rm1, rm2, read_lens,
                                        min_scores.astype(jnp.int32))
    return max_score
