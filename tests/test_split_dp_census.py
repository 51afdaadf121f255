"""The split-DP census must track the shipped kernel's loop structure
(VERDICT r4 item 4: the r3 hand table silently went stale when the
segmented cascade landed, producing a 171%-of-ceiling absurdity)."""

import sys

from defuse_tpu.ops.split_dp_census import (census_vreg_ops,
                                            segment_rows,
                                            vpu_peak_probe)


def test_segments_match_kernel_derivation():
    """segment_rows must reproduce the kernel's (lo, hi_cap) walk and
    per-segment shift lists exactly."""
    from defuse_tpu.ops.split_dp_pallas import _max_shift, _round_up

    n_rows, R = 50, 256
    W = _round_up(R + 1 + _max_shift(n_rows), 128)
    # mirror of the loop in split_dp_pallas._dp_kernel
    want = []
    lo, hi_cap = 1, 1
    while lo <= n_rows:
        hi = min(n_rows, hi_cap)
        steps = 0
        s = 1
        while s < min(W, 2 * hi):
            steps += 1
            s *= 2
        want.append((hi - lo + 1, steps))
        lo = hi + 1
        hi_cap *= 2
    assert segment_rows(n_rows, W) == want
    # the bench shape's totals, pinned (a change to either the kernel's
    # segmentation or the census shows up here)
    c = census_vreg_ops(R, n_rows)
    assert c["W"] == 384
    assert c["cascade_steps_total"] == 287
    assert c["cascade_steps_uniform"] == 350
    assert 400 < c["vreg_ops_per_read"] < 600
    assert abs(c["alu_vreg_ops_per_read"] + c["roll_vreg_ops_per_read"]
               - c["vreg_ops_per_read"]) < 1e-9


def test_census_scales_with_depth():
    """More DP rows -> more work; wider refs -> more work."""
    base = census_vreg_ops(256, 50)["vreg_ops_per_read"]
    assert census_vreg_ops(256, 64)["vreg_ops_per_read"] > base
    assert census_vreg_ops(512, 50)["vreg_ops_per_read"] > base


def test_peak_probe_runs_in_interpret_mode():
    """The probe must execute (and not get folded away) on the CPU
    interpreter so its kernel stays trustworthy; tiny iteration counts
    keep it fast."""
    p = vpu_peak_probe(batch_tile=8, W=128, streams=2,
                       iters_small=2, iters_big=6)
    assert set(p) >= {"roll", "alu", "alu_us_per_vreg_op",
                      "roll_us_per_vreg_op", "vreg_ops_per_us"}
    # at 2-vs-6 interpreter iterations the marginal is pure jitter
    # under suite load (a negative difference of two ~ms walls is
    # legitimate); the assertion is that the probe EXECUTED and
    # produced finite numbers, not that the toy marginal is physical
    import math
    assert math.isfinite(p["alu_us_per_vreg_op"])
    assert math.isfinite(p["roll_us_per_vreg_op"])
