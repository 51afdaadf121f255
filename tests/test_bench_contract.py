"""Guard the bench output contract (VERDICT r4 items 1/10).

Round 4's headline was lost because bench.py printed one monolithic
JSON line that outgrew the driver's 2000-char tail capture.  The
contract now is: the FINAL stdout line is a compact headline JSON
guaranteed under 1.5KB that still carries the metric/value/vs_baseline
triple plus one-number summaries of every extras block.  These tests
pin that contract so it cannot silently regress again.
"""

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench


def _full_result(extra_pad=None):
    """A result shaped like the round-4 blob that broke the capture."""
    extra = {
        "device": "tpu",
        "n_read_pairs": 92800,
        "baseline_pairs_s": 6270.2,
        "exact_match_vs_reference": True,
        "screen_routing": "screen: host wins (est dev 0.72s vs host "
                          "0.13s, B=46953, link {'bw_MBps': 23.5})",
        "measured_device": "tpu",
        "frontend_pairs_s": 329645.1,
        "pallas_kernel": {"ms": "35.38", "B": "16384",
                          "marginal_us": "0.630", "variant": "v1-i32"},
        "verify_kernel": {"ms": "231.90", "C": "262144",
                          "marginal_us": "0.0489"},
        "stage_times_s": {f"discover:stage{i}": 0.01 for i in range(12)},
        "em_ablation_s": {"native": 0.801, "device": 79.075,
                          "device_warm": 22.193,
                          "device_matches_native": True},
        "forced_device_screen": {
            "elapsed_s": 0.463, "pairs_s": 200601.2,
            "stage_times_s": {f"s{i}": 0.01 for i in range(12)}},
        "forced_device_verify": {
            "elapsed_s": 0.5, "pairs_s": 190000.0},
        "kernel_rooflines": {
            "split_dp": {"measured_us_per_read": 0.327,
                         "ceiling_us_per_read": 0.34,
                         "pct_of_ceiling": 96.2, "basis": "x" * 80},
            "verify": {"measured_us_per_cand": 0.0489,
                       "pct_of_ceiling": 75.7, "basis": "y" * 80},
            "em": {"wall_s": 31.16, "device_fraction": 0.085,
                   "link_fraction": 0.521},
            "em_partB": {
                "N512": {"native_s": 1.0, "device_warm_s": 0.5,
                         "speedup_device": 2.0, "decisions_match": True},
                "N8192": {"native_s": 9.0, "device_warm_s": 1.0,
                          "speedup_device": 9.0, "decisions_match": True},
            },
        },
        "routing_table": {
            link: {"link": {"bw_MBps": 23.5, "rtt_ms": 133.0},
                   "screen": {"t_dev_s": 0.72, "t_host_s": 0.13,
                              "choice": "host"},
                   "verify": {"t_dev_s": 0.39, "t_host_s": 0.09,
                              "choice": "host"},
                   "em": {"t_dev_s": 6.28, "t_host_s": 2.11,
                          "choice": "host"}}
            for link in ("tunnel", "pcie")},
    }
    if extra_pad:
        extra.update(extra_pad)
    return {
        "metric": "read-pairs/s/chip (cluster+split-align); "
                  "fusion calls exact-match vs reference",
        "value": 305862.2,
        "unit": "read-pairs/s/chip",
        "vs_baseline": 48.781,
        "extra": extra,
    }


def test_headline_fits_capture_window():
    full = _full_result()
    # the full blob really is too big for the tail (the r4 failure mode)
    assert len(json.dumps(full)) > 2000
    line = json.dumps(bench.compact_headline(full, "BENCH_EXTRAS.json"))
    assert len(line) < 1500
    parsed = json.loads(line)
    assert parsed["value"] == 305862.2
    assert parsed["vs_baseline"] == 48.781
    assert parsed["unit"] == "read-pairs/s/chip"
    ex = parsed["extra"]
    assert ex["exact_match_vs_reference"] is True
    assert ex["device"] == "tpu"
    assert ex["em_native_s"] == 0.801
    assert ex["split_dp_pct_ceiling"] == 96.2
    assert ex["em_partB"] == {"N512": 2.0, "N8192": 9.0}
    assert ex["full_extras_file"] == "BENCH_EXTRAS.json"


def test_headline_survives_pathological_extras():
    """Even absurd extras cannot push the final line past the budget:
    compaction only copies known keys, and the byte-budget loop drops
    from the tail if a known field itself bloats."""
    full = _full_result({"junk": "z" * 100000})
    line = json.dumps(bench.compact_headline(full, None))
    assert len(line) < 1500
    assert json.loads(line)["value"] == 305862.2


def test_headline_handles_missing_extras():
    """CPU-fallback / partial runs (no rooflines, no ablation) still
    produce a parseable headline."""
    full = {"metric": "m", "value": 1.0, "unit": "u",
            "vs_baseline": None, "extra": {"device": "cpu-fallback"}}
    parsed = json.loads(json.dumps(bench.compact_headline(full, None)))
    assert parsed["vs_baseline"] is None
    assert parsed["extra"]["device"] == "cpu-fallback"
