"""Part-B probe budget guard (VERDICT r4 item 10, recurred in r5).

The large-instance EM sweep runs inside a bench subprocess with a hard
timeout; on a slow tunnel the full sweep can outgrow it, and a killed
subprocess loses the ENTIRE record (the r4 failure mode, repeated in
round 5 at a 2x-slower link).  The probe therefore carries its own wall
budget and degrades to a partial record with explicit skip markers.
These tests pin that contract on CPU with tiny instances.
"""

import importlib.util
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load_probe():
    spec = importlib.util.spec_from_file_location(
        "em_roofline_probe",
        REPO / "scripts_dev" / "em_roofline_probe.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_part_b(capsys, monkeypatch, budget, sizes):
    monkeypatch.setenv("DEFUSE_PARTB_BUDGET_S", str(budget))
    probe = _load_probe()
    probe.part_b(sizes=sizes)
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines()
             if ln.startswith("EM_PROBE_B ")]
    assert len(lines) == 1, out
    return json.loads(lines[0][len("EM_PROBE_B "):])


def test_part_b_zero_budget_still_records_first_cell(
        capsys, monkeypatch):
    """The first cell always runs (a record with one measured cell
    beats none); later cells are skipped with markers, and the line
    still parses."""
    report = _run_part_b(capsys, monkeypatch, 0.0, sizes=(24, 32, 48))
    cell = report["N24"]
    assert cell["decisions_match"] is True
    assert cell["native_s"] >= 0.0 and cell["device_warm_s"] >= 0.0
    for skipped in ("N32", "N48"):
        assert report[skipped]["skipped"] == "budget"
        assert report[skipped]["budget_s"] == 0.0


def test_part_b_ample_budget_runs_every_cell(capsys, monkeypatch):
    report = _run_part_b(capsys, monkeypatch, 3600, sizes=(24, 32))
    for key in ("N24", "N32"):
        assert "skipped" not in report[key]
        assert report[key]["decisions_match"] is True
