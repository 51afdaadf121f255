"""Static vreg-op census + measured VPU peak for the split-DP kernel.

The round-3 ceiling memo (PALLAS_SPLIT_DP_r3.md) hand-counted the
UNIFORM-depth cascade kernel and priced it at 1 vreg-op/cycle.  Round 4
measured 0.327µs/read against that 0.56µs "ceiling" — 171% of ceiling,
i.e. the census no longer described the shipped kernel (the segmented
cascade runs shallower prefix-max cascades for early rows) and the
1-op/cycle price underestimated the VPU's issue width.  This module
makes both ends measurable:

* ``census_vreg_ops`` recounts the CURRENT segmented kernel
  (``split_dp_pallas._dp_kernel``) symbolically from its actual loop
  structure — per-row op itemization times the per-segment cascade
  depths — so the census tracks the code;
* ``vpu_peak_probe`` measures the sustained vector-op issue rate on
  the same (TB, W) int32 tile shapes with an issue-saturation Pallas
  kernel (independent roll/add/max streams — the split-DP op mix),
  giving the hardware denominator empirically instead of assuming
  1 op/cycle.

ceiling_us_per_read = census / measured_peak.  The bench roofline
(``bench.py kernel_rooflines``) reports measured marginal against that
ceiling; PALLAS_SPLIT_DP_r5.md records the derivation.
"""

from __future__ import annotations

import functools

LANES = 128
SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _max_shift(n_rows: int) -> int:
    s = 1
    while s * 2 < 2 * n_rows:
        s *= 2
    return s


def segment_rows(n_rows: int, width: int):
    """(rows_in_segment, n_cascade_steps) per segment — mirrors the
    segmented row loop in ``split_dp_pallas._dp_kernel`` exactly."""
    out = []
    lo, hi_cap = 1, 1
    while lo <= n_rows:
        hi = min(n_rows, hi_cap)
        steps = 0
        s = 1
        while s < min(width, 2 * hi):
            steps += 1
            s *= 2
        out.append((hi - lo + 1, steps))
        lo = hi + 1
        hi_cap *= 2
    return out


def census_vreg_ops(R: int, L: int, batch_tile: int = 256) -> dict:
    """Int32 vreg-op count per read for the segmented split-DP kernel.

    Itemization per DP row over a (TB, W) tile, in (8, 128)-vreg ops
    (one elementwise op on the full tile = TB/8 * W/128 vreg-ops):

    * read-char one-hot extract: compare + select + lane-sum tree
      (~7 ops on the (TB, Lp_read) read block);
    * substitution: compare refs==ch + select (2 full-tile ops);
    * vert: roll + add + add + max (4);
    * cascade input: subtract decay + validity select (2);
    * prefix-max cascade: per step roll + max (2), plus one wrap
      select on the final step of each row;
    * col restore: add decay (1);
    * row max: lane-max tree over W (~2 full-tile ops);
    * output accumulate: compare + select on the (TB, Lp_out) block.
    """
    W = _round_up(R + 1 + _max_shift(L), LANES)
    full = (batch_tile // SUBLANES) * (W // LANES)
    readv = (batch_tile // SUBLANES) * (_round_up(L, LANES) // LANES)
    outv = (batch_tile // SUBLANES) * (_round_up(L + 1, LANES) // LANES)

    # per-row fixed work split by op class: lane-rolls go through the
    # lane-crossbar path and cost more than elementwise ALU ops (the
    # two are priced separately from the two measured probe mixes)
    alu_row_fixed = 7 * readv + (2 + 3 + 2 + 1 + 2) * full + 2 * outv
    roll_row_fixed = 1 * full  # the vert prev-shift
    alu = roll = 0
    cascade_steps_total = 0
    for rows, steps in segment_rows(L, W):
        alu += rows * (alu_row_fixed + steps * full + 1 * full)
        roll += rows * (roll_row_fixed + steps * full)
        cascade_steps_total += rows * steps
    total = alu + roll
    return {
        "R": R, "L": L, "W": W, "batch_tile": batch_tile,
        "vreg_ops_per_tile": total,
        "vreg_ops_per_read": total / batch_tile,
        "alu_vreg_ops_per_read": alu / batch_tile,
        "roll_vreg_ops_per_read": roll / batch_tile,
        "cascade_steps_total": cascade_steps_total,
        "cascade_steps_uniform": L * len(
            _powers_below(min(W, 2 * L))),
        "per_row_fixed": alu_row_fixed + roll_row_fixed,
    }


def _powers_below(limit: int):
    out = []
    s = 1
    while s < limit:
        out.append(s)
        s *= 2
    return out


def vpu_peak_probe(batch_tile: int = 256, W: int = 384,
                   streams: int = 4, iters_small: int = 1 << 17,
                   iters_big: int = 1 << 20) -> dict:
    """Measured sustained VPU vector-op issue rate (vreg-ops/s).

    Runs ``streams`` independent roll/add/max chains (the split-DP op
    mix — each iteration issues 3 full-tile ops per stream with no
    cross-stream dependency, so the VLIW scheduler can pack issue
    slots) over a (TB, W) int32 VMEM block inside one Pallas program,
    and reports the marginal per-iteration cost between two static
    iteration counts (fixed costs cancel).  This is the empirical
    denominator for the census ceiling — replacing round 3's assumed
    1 vreg-op/cycle.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() != "tpu"

    def kernel(x_ref, o_ref, *, iters, mix):
        accs = tuple(x_ref[:] + i for i in range(streams))

        def body_roll(j, accs):
            # 1 roll + 1 add + 1 max per stream (the cascade's mix)
            return tuple(
                jnp.maximum(pltpu.roll(a, 1, 1), a + 1) for a in accs)

        def body_alu(j, accs):
            # 2 adds + 2 maxes per stream pair, no lane movement —
            # cross-linked so nothing folds to a closed form
            out = list(accs)
            for i in range(0, streams, 2):
                a, b = accs[i], accs[i + 1]
                out[i] = jnp.maximum(a + 1, b)
                out[i + 1] = jnp.maximum(b + 2, a)
            return tuple(out)

        accs = jax.lax.fori_loop(
            0, iters, body_roll if mix == "roll" else body_alu, accs)
        o_ref[:] = functools.reduce(jnp.maximum, accs)

    def run(iters, mix):
        x = np.zeros((batch_tile, W), np.int32)
        f = pl.pallas_call(
            functools.partial(kernel, iters=iters, mix=mix),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch_tile, W), jnp.int32),
            interpret=interpret,
        )
        # scalar fetch forces remote completion — on the tunneled axon
        # backend block_until_ready alone can return before the remote
        # program finishes (measured: a 1.3s kernel "completes" in
        # 100µs), which silently voids the measurement; every bench
        # microbench uses the same fetch-a-scalar pattern
        g = jax.jit(lambda a: jnp.sum(f(a)))
        xd = jax.device_put(x)
        float(g(xd))  # compile + warm
        best = 1e9
        for _ in range(8):
            t0 = time.time()
            float(g(xd))
            best = min(best, time.time() - t0)
        return best

    full = (batch_tile // SUBLANES) * (W // LANES)
    out = {"batch_tile": batch_tile, "W": W, "streams": streams,
           "iters": [iters_small, iters_big]}
    per_iter = {}
    for mix in ("roll", "alu"):
        t_small = run(iters_small, mix)
        t_big = run(iters_big, mix)
        per_iter[mix] = (t_big - t_small) / (iters_big - iters_small)
        ops = streams * 3 * full if mix == "roll" else streams * 2 * full
        out[mix] = {
            "t_small_s": round(t_small, 4), "t_big_s": round(t_big, 4),
            "per_iter_us": round(per_iter[mix] * 1e6, 4),
            "vreg_ops_per_us": round(ops / per_iter[mix] / 1e6, 1)}
    # per-vreg-op costs: alu mix issues 4 ALU ops per stream-pair —
    # wait: body_alu does 2 adds + 2 maxes per PAIR, i.e. 2 ops per
    # stream; body_roll does 1 roll + 2 ALU per stream.  Solve:
    #   t_alu_iter  = streams * 2 * full * c_alu
    #   t_roll_iter = streams * full * (c_roll + 2 * c_alu)
    c_alu = per_iter["alu"] / (streams * 2 * full)
    c_roll = per_iter["roll"] / (streams * full) - 2 * c_alu
    out["alu_us_per_vreg_op"] = c_alu * 1e6
    out["roll_us_per_vreg_op"] = max(c_roll, c_alu) * 1e6
    # single blended rate kept for backwards compatibility
    out["vreg_ops_per_us"] = out["roll"]["vreg_ops_per_us"]
    return out
