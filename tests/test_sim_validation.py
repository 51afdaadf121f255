"""CI-sized simulated-real validation: chromosome-scale genome, strand
mix, per-base sequencing errors, DNA background — full frontend +
pipeline with recall/precision bounds (the 1M-pair run of the same
generator is recorded in SIM_VALIDATION_r2.md)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent
                       / "scripts_dev"))


def test_sim_validation_small():
    from sim_validation import main

    report = main(n_background=50_000, write_report=False)
    n_truth = report["n_true_fusions"]
    found_f, total_f = map(int, report["recall_filtered"].split("/"))
    assert total_f == n_truth
    assert found_f >= n_truth - 1, report
    assert report["precision_filtered"] >= 0.9, report
    assert report["frontend_pairs_per_s"] > 30_000, report
