"""ReadIndex (.fqi) format parity + O(1) lookups."""

import random

from defuse_tpu.io.readindex import ReadIndex

from test_splitseq import _write_fqi


def _write_fastqs(tmp_path, n=60, seed=3):
    rng = random.Random(seed)
    seqs = [["".join(rng.choice("ACGT") for _ in range(rng.randint(30, 60)))
             for _ in range(n)] for _ in range(2)]
    paths = []
    for end in (0, 1):
        p = tmp_path / f"reads.{end + 1}.fastq"
        with open(p, "w") as fh:
            for i, s in enumerate(seqs[end]):
                fh.write(f"@{i}/{end + 1}\n{s}\n+\n{'I' * len(s)}\n")
        paths.append(str(p))
    return paths, seqs


def test_fqi_format_matches_reference_layout(tmp_path):
    paths, _seqs = _write_fastqs(tmp_path)
    ours = tmp_path / "ours.fqi"
    golden = tmp_path / "golden.fqi"
    ReadIndex.build(paths[0], paths[1], str(ours))
    _write_fqi(paths[0], paths[1], str(golden))
    assert ours.read_bytes() == golden.read_bytes()


def test_readindex_lookups(tmp_path):
    paths, seqs = _write_fastqs(tmp_path)
    ReadIndex.build(paths[0], paths[1], str(tmp_path / "reads.fqi"))
    with ReadIndex(str(tmp_path / "reads")) as ridx:
        for frag in (0, 1, 7, 59):
            for end in (0, 1):
                assert ridx.get(frag, end) == seqs[end][frag]
        assert ridx.get(1000, 0) == ""
