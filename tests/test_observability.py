"""Tracing/metrics artifact + the DEFUSE_DEBUG_CHECKS assert layer."""

import json

import pytest

from defuse_tpu.utils import checks
from defuse_tpu.utils.profiling import Tracer


def test_tracer_artifact(tmp_path):
    t = Tracer(str(tmp_path))
    t.mark("alpha")
    t.mark("beta", items=42)
    t.count("reads", 100)
    t.count("reads", 50)
    path = t.flush()
    payload = json.loads(open(path).read())
    assert [s["stage"] for s in payload["stages"]] == ["alpha", "beta"]
    assert payload["stages"][1]["items"] == 42
    assert payload["counters"]["reads"] == 150
    assert payload["total_seconds"] >= 0


def test_checks_disabled_are_free(tmp_path):
    p = tmp_path / "garbage"
    p.write_text("not\ta\tvalid\tfile\n")
    # disabled: no parsing, no error
    checks.check_clusters_file(str(p), 1)
    checks.check_spanning_file(str(p))


def test_checks_catch_invariant_violations(tmp_path, monkeypatch):
    monkeypatch.setenv("DEFUSE_DEBUG_CHECKS", "1")
    good = tmp_path / "clusters.good"
    good.write_text(
        "0\t0\t5\t0\tREF\t+\t10\t60\n"
        "0\t1\t5\t1\tREF2\t-\t500\t550\n")
    checks.check_clusters_file(str(good), 1)

    missing_end = tmp_path / "clusters.bad"
    missing_end.write_text("0\t0\t5\t0\tREF\t+\t10\t60\n")
    with pytest.raises(checks.DebugCheckError, match="missing an end"):
        checks.check_clusters_file(str(missing_end), 1)

    # setcover must not assign a fragment to two clusters
    sc = tmp_path / "sc"
    clusters = tmp_path / "clusters.in"
    rows = ("0\t0\t5\t0\tA\t+\t1\t2\n0\t1\t5\t1\tB\t+\t1\t2\n"
            "1\t0\t5\t0\tC\t+\t1\t2\n1\t1\t5\t1\tD\t+\t1\t2\n")
    clusters.write_text(rows)
    sc.write_text(rows)
    with pytest.raises(checks.DebugCheckError, match="in 2 clusters"):
        checks.check_setcover_file(str(clusters), str(sc))

    # invented rows
    sc.write_text("7\t0\t9\t0\tZ\t+\t1\t2\n")
    with pytest.raises(checks.DebugCheckError, match="invented"):
        checks.check_setcover_file(str(clusters), str(sc))

    # unsorted split alignments
    split = tmp_path / "split"
    split.write_text("3\tx\n1\ty\n")
    with pytest.raises(checks.DebugCheckError, match="out of order"):
        checks.check_split_alignments_sorted(str(split))

    # spanning fragment with one end
    spanning = tmp_path / "spanning"
    spanning.write_text("9\t0\tREF\t+\t1\t50\n")
    with pytest.raises(checks.DebugCheckError, match="ends \\['0'\\]"):
        checks.check_spanning_file(str(spanning))


def test_pipeline_green_under_debug_checks(tmp_path, monkeypatch):
    """The full pipeline passes its own invariants with checks on, and
    the metrics artifacts land."""
    monkeypatch.setenv("DEFUSE_DEBUG_CHECKS", "1")
    from defuse_tpu.config import Config
    from defuse_tpu.pipeline.run import run_pipeline
    from synthdata import make_dataset, write_dataset

    ds = make_dataset(seed=3)
    paths = write_dataset(ds, tmp_path)
    config = Config.defaults(
        reference_fasta=str(paths["reference"]),
        cdna_regions=str(paths["exons"]), span_count_threshold=3,
        fallback_frag_mean="200.0", fallback_frag_stddev="20.0")
    outs = run_pipeline(
        config=config, output_dir=str(tmp_path / "out"),
        library_name="chk", spanning=str(paths["spanning"]),
        improper=str(paths["improper"]), fastq1=str(paths["fastq1"]),
        fastq2=str(paths["fastq2"]), use_device=False)
    assert (tmp_path / "out" / "metrics.json").exists()
    assert (tmp_path / "out" / "metrics.discover.json").exists()
    m = json.loads((tmp_path / "out" / "metrics.json").read_text())
    assert any(s["stage"] == "discover" for s in m["stages"])
