"""Native align-regions aggregation parity (dt_align_regions).

The regions stage (``get_align_regions.pl`` semantics) routes through
the native file->file implementation when built; its output must be
BYTE-identical to the Python ``align_regions_lines`` path on arbitrary
inputs, including the first-ref/strand-wins rule and the empty-input
single-newline quirk.
"""

import numpy as np
import pytest

from defuse_tpu.cluster import native
from defuse_tpu.pipeline.regions import (align_regions_file,
                                         align_regions_lines)


def _rows(rng, n_clusters):
    lines = []
    for cid in rng.permutation(n_clusters):
        for cend in (0, 1):
            for _ in range(rng.integers(1, 4)):
                s = int(rng.integers(1, 1_000_000))
                e = s + int(rng.integers(50, 400))
                ref = f"chr{rng.integers(1, 23)}|t{rng.integers(1, 9)}"
                strand = "+" if rng.random() < 0.5 else "-"
                lines.append(f"{cid}\t{cend}\t{rng.integers(0, 99999)}"
                             f"\t{rng.integers(0, 2)}\t{ref}\t{strand}"
                             f"\t{s}\t{e}")
    return lines


def test_native_matches_python_bytes(tmp_path):
    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(5)
    lines = _rows(rng, 500)
    sc = tmp_path / "sc"
    sc.write_text("\n".join(lines) + "\n")
    want = "\n".join(align_regions_lines(lines)) + "\n"
    out = tmp_path / "regions"
    align_regions_file(sc, out)
    assert out.read_text() == want


def test_empty_input_single_newline(tmp_path):
    sc = tmp_path / "sc"
    sc.write_text("")
    out = tmp_path / "regions"
    align_regions_file(sc, out)
    assert out.read_text() == "\n"
