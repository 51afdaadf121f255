#!/usr/bin/env python
"""On-chip decomposition of the 3-bit-packed verify kernel (VERDICT r3
item 10): attribute the measured marginal to its gather vs compute legs
so the bench's kernel_rooflines extras carry a defended ceiling, not
just a rate.

Legs measured (all marginal over C_small->C_big, link costs cancel):
  full     — the production `_verify_packed3`
  gather   — only the two dynamic gathers (reference window words +
             read-row pick), summed: the data-movement floor
  compute  — the full arithmetic with the gathers replaced by
             contiguous broadcast loads: the VPU floor

If full ≈ gather + compute the kernel is at the composition ceiling of
its two resource legs; the larger leg names the binding resource.

Usage: python scripts_dev/verify_roofline_probe.py [N_ref] [C_big]
Prints one JSON line (VERIFY_ROOFLINE ...).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from defuse_tpu.ops.verify_batch import (BASES_PER_WORD, _GROUP_LOW_BITS,
                                         _WORD_MASK, _verify_packed3,
                                         pack_codes3, pack_rows3)

L = 50
W = (L + BASES_PER_WORD - 1) // BASES_PER_WORD


def gather_only(ref3, word10, lane10, reads3, read_idx):
    k = jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(word10[:, None] + k, ref3.shape[0] - 1)
    g = ref3[idx]
    rw = reads3[read_idx]
    # lane10 folded in so XLA cannot dead-code either gather
    return jnp.sum(g) + jnp.sum(rw) + jnp.sum(lane10.astype(jnp.uint32))


def compute_only(ref3, word10, lane10, reads3, read_idx, read_lens):
    """Full arithmetic, gathers replaced by contiguous broadcasts (the
    same (C, W+1)/(C, W) shaped operands stream from HBM linearly)."""
    C = word10.shape[0]
    g = jnp.broadcast_to(ref3[None, : W + 1], (C, W + 1))
    rw = jnp.broadcast_to(reads3[0][None, :], (C, W))
    sh = (3 * lane10).astype(jnp.uint32)[:, None]
    lo = g[:, :-1] >> sh
    hi = (g[:, 1:] << (jnp.uint32(30) - sh)) & _WORD_MASK
    win = (lo | hi) & _WORD_MASK
    x = win ^ rw
    t = (x | (x >> 1) | (x >> 2)) & _GROUP_LOW_BITS
    lens = jnp.broadcast_to(read_lens[0], (C,))[:, None]
    v = jnp.clip(lens - BASES_PER_WORD
                 * jnp.arange(W, dtype=jnp.int32)[None, :],
                 0, BASES_PER_WORD).astype(jnp.uint32)
    lm = (jnp.uint32(1) << (3 * v)) - jnp.uint32(1)
    counts = jax.lax.population_count(t & lm)
    # word10 folded in so the operand stays live
    return jnp.sum(counts) + jnp.sum(word10)


def marginal(fn, args_small, args_big, iters=10):
    f = jax.jit(fn)
    float(np.asarray(f(*args_small)))
    float(np.asarray(f(*args_big)))
    best_s = best_b = 1e9
    for _ in range(iters):
        t0 = time.time()
        float(np.asarray(f(*args_small)))
        best_s = min(best_s, time.time() - t0)
        t0 = time.time()
        float(np.asarray(f(*args_big)))
        best_b = min(best_b, time.time() - t0)
    return best_s, best_b


def main(n_ref=4_000_000, c_big=1_048_576):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, n_ref).astype(np.int8)
    ref3 = jax.device_put(pack_codes3(codes))
    b_reads = 20000
    reads = rng.integers(0, 4, (b_reads, L)).astype(np.int8)
    reads3 = jax.device_put(pack_rows3(reads))
    lens = jax.device_put(np.full(b_reads, L, np.int32))
    # both sizes large: the ~25ms fixed dispatch cost carries ±3ms
    # jitter, so a small subtrahend makes the marginal a difference of
    # two noisy numbers (the round-4 split-DP artifact,
    # PALLAS_SPLIT_DP_r5.md §1)
    c_small = c_big // 4
    starts = rng.integers(0, n_ref - L, c_big).astype(np.int64)
    w10 = jax.device_put((starts // 10).astype(np.int32))
    l10 = jax.device_put((starts % 10).astype(np.int32))
    ridx = jax.device_put(rng.integers(0, b_reads, c_big).astype(np.int32))

    def args(C):
        return (ref3, w10[:C], l10[:C], reads3, ridx[:C])

    out = {"device": jax.devices()[0].device_kind,
           "C_small": c_small, "C_big": c_big, "W": W, "L": L}
    legs = {
        "full": lambda *a: jnp.sum(_verify_packed3(*a, lens, L)),
        "gather": gather_only,
        "compute": lambda *a: compute_only(*a, lens),
    }
    for name, fn in legs.items():
        ts, tb = marginal(fn, args(c_small), args(c_big))
        m = (tb - ts) / (c_big - c_small)
        out[name] = {"marginal_us": round(m * 1e6, 4),
                     "cands_s": round(1 / m)}
    g, c, f = (out[k]["marginal_us"] for k in ("gather", "compute", "full"))
    out["gather_fraction_of_full"] = round(g / f, 3)
    out["sum_legs_over_full"] = round((g + c) / f, 3)
    print("VERIFY_ROOFLINE " + json.dumps(out))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 1_048_576
    main(n, c)
