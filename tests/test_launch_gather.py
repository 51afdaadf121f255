"""The read-stats gathers must be bit-exact WITHOUT jax_enable_x64.

Production workers do not enable x64 (the suite's conftest does, which
is exactly why this bug escaped it): ``process_allgather`` silently
truncates float64 -> float32 and uint64 -> uint32 when x64 is off, so a
50M-pair run's exact fragment-length sums came back with float32
precision and an EMPTY readlength mask — zeroing every realign flank
and producing a header-only results.tsv.  ``_allgather_bits`` gathers
64-bit payloads as uint32 bit views; this test pins it at the
production configuration by running in a subprocess with x64 unset.
"""

import os
import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, "/root/repo")
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert not jax.config.read("jax_enable_x64")

    from defuse_tpu.parallel.launch import (allgather_read_stats,
                                            allgather_read_stats_sums)
    from defuse_tpu.stats.readstats import ReadStats, stats_from_sums

    # sums chosen to be exactly representable in f64 but NOT in f32,
    # and a readlength (50) whose mask bit lives above uint32
    n, s, ss = 45102084.0, 8997644846.0, 1813057613648.0
    merged = allgather_read_stats_sums(n, s, ss, [50])
    expect = stats_from_sums(n, s, ss, [50])
    assert merged.format() == expect.format(), (
        merged.format(), expect.format())
    assert merged.readlength_min == 50 and merged.readlengths == (50,)

    local = ReadStats(1000, 199.4951122657, 20.00289355, 50, 75,
                      (50, 75))
    m2 = allgather_read_stats(local)
    assert m2.readlengths == (50, 75), m2
    assert abs(m2.fraglength_mean - local.fraglength_mean) < 1e-9
    print("GATHER_EXACT_OK")
""")


def test_gather_bit_exact_without_x64():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_ENABLE_X64",)}
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", SCRIPT],
                          capture_output=True, text=True, env=env,
                          timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "GATHER_EXACT_OK" in proc.stdout
