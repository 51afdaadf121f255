"""Device availability probing.

JAX backend initialization can block indefinitely when an accelerator
sits behind a dead link (observed with tunneled plugin platforms) — and
it blocks while holding the GIL, so an in-process watchdog thread cannot
time it out.  The probe therefore runs an actual tiny computation in a
*subprocess*.  ``start_probe`` launches it without waiting (call at
pipeline entry so it overlaps host-side stages); ``tpu_backend_available``
collects the verdict with a bounded wait and caches it for the process.
"""

from __future__ import annotations

import subprocess
import sys
import threading

_LOCK = threading.Lock()
_STATE: dict = {}

_PROBE_SRC = (
    # OS-level self-destruct: a dead tunnel blocks inside jax C code
    # holding the GIL, so no Python watchdog can fire — but SIGALRM's
    # default disposition terminates the process regardless.  Without
    # this, non-destructive short waits (kill_on_timeout=False) leak a
    # busy-polling orphan per pipeline run.
    "import signal; signal.alarm(180);"
    "import time, jax, numpy;"
    "x = float(numpy.asarray(jax.numpy.ones(4).sum()));"
    "t0 = time.time();"
    "[numpy.asarray(jax.numpy.zeros(1)) for _ in range(4)];"
    "rtt_ms = (time.time() - t0) / 4 * 1000;"
    "buf = numpy.zeros(4 << 20, numpy.uint8);"
    "t0 = time.time();"
    "d = jax.device_put(buf); d.block_until_ready();"
    "up_s = time.time() - t0;"
    "bw = 4.0 / max(up_s, 1e-6);"
    "print((jax.default_backend() if x == 4.0 else 'bad'),"
    "      round(bw, 1), round(rtt_ms, 2))")


def start_probe() -> None:
    """Launch the device probe subprocess without blocking."""
    import os
    with _LOCK:
        if "verdict" not in _STATE:
            # test/deployment override: skip probing entirely
            assume = os.environ.get("DEFUSE_ASSUME_BACKEND")
            if assume:
                _STATE["verdict"] = assume == "tpu"
        if "verdict" in _STATE or "proc" in _STATE:
            return
        try:
            _STATE["proc"] = subprocess.Popen(
                [sys.executable, "-c", _PROBE_SRC],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True)
        except Exception:
            _STATE["verdict"] = False


def tpu_backend_available(timeout_s: float = 45.0,
                          kill_on_timeout: bool = True) -> bool:
    """True when a compiled TPU backend is up and answering.  Waits up to
    ``timeout_s`` for the probe (started here if not already running).

    ``kill_on_timeout=False`` makes the wait non-destructive: a probe
    that has not answered yet reports False for *this* call but keeps
    running, so a later call (or a second pipeline pass) can still
    collect a positive verdict.  Use short non-destructive waits on hot
    paths where the device is an optimization, not a requirement — a
    dead tunnel hangs the probe subprocess until killed, and a 45s
    serial stall in a 5s stage is worse than skipping the device.
    """
    start_probe()
    with _LOCK:
        if "verdict" in _STATE:
            return _STATE["verdict"]
        proc = _STATE["proc"]
        try:
            out, _ = proc.communicate(timeout=timeout_s)
            fields = out.split()
            verdict = proc.returncode == 0 and bool(fields) \
                and fields[0] == "tpu"
            if verdict and len(fields) >= 3:
                _STATE["link"] = {"bw_MBps": float(fields[1]),
                                  "rtt_ms": float(fields[2])}
        except subprocess.TimeoutExpired:
            if not kill_on_timeout:
                return False  # verdict stays pending
            proc.kill()
            verdict = False
        except Exception:
            verdict = False
        _STATE["verdict"] = verdict
        del _STATE["proc"]
        return verdict


def link_profile() -> dict | None:
    """Measured host<->device link profile from the probe ({bw_MBps,
    rtt_ms}), or None before a positive verdict.  A tunneled dev chip
    measures ~30MB/s / ~25ms; a local chip orders of magnitude better —
    callers use this to decide whether shipping a workload to the device
    beats computing it on the host.

    ``DEFUSE_LINK_BW`` (MB/s) / ``DEFUSE_LINK_RTT`` (ms) override the
    measured values — deployment tuning for co-located/PCIe-class links
    where the probe's one-shot measurement underestimates steady-state
    bandwidth, and the lever behind the bench's routing crossover table.
    """
    import os
    bw = os.environ.get("DEFUSE_LINK_BW")
    rtt = os.environ.get("DEFUSE_LINK_RTT")
    with _LOCK:
        link = _STATE.get("link")
    if bw or rtt:
        link = dict(link or {})
        if bw:
            link["bw_MBps"] = float(bw)
        if rtt:
            link["rtt_ms"] = float(rtt)
        link["override"] = True
    return link


_CACHE_ENABLED = False


def enable_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache.

    The gather-free device EM (cluster/matepair_em_batch.py) compiles in
    ~3min on the tunneled v5e but executes in seconds; caching the
    serialized executable makes every run after the first pay only
    execution.  Keyed on HLO + backend, so CPU tests and TPU runs don't
    collide.  Opt-out with DEFUSE_JAX_CACHE=0; override the directory by
    setting it to a path.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import os
    loc = os.environ.get("DEFUSE_JAX_CACHE", "")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(os.path.expanduser("~"), ".cache",
                           "defuse_tpu", "jax_cache")
    try:
        os.makedirs(loc, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _CACHE_ENABLED = True
    except Exception:
        pass  # older jax or read-only fs: compile-per-process fallback
