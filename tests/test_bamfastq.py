"""BAM->fastq conversion byte-identical to the reference bamfastq binary
on the bundled discordant.aligned.bam fixture."""

import subprocess

import pytest

from defuse_tpu.io.bam import bam_to_fastq, read_bam

BAM = "/root/reference/tools/discordant.aligned.bam"


def test_read_bam_parses_fixture():
    n = 0
    for name, flag, _ref, _pos, seq, qual in read_bam(BAM):
        assert seq and len(seq) == len(qual)
        assert name.endswith("/1") or name.endswith("/2")
        n += 1
    assert n == 1133


@pytest.mark.parametrize("flags", [
    dict(rename=True, multiples=True, paired_names=True),
    dict(rename=False, multiples=False, paired_names=True),
])
def test_bamfastq_golden(ref_binaries, tmp_path, flags):
    argv = [str(ref_binaries / "bamfastq"), "-b", BAM,
            "-1", str(tmp_path / "g1.fq"), "-2", str(tmp_path / "g2.fq")]
    if flags["rename"]:
        argv.append("-r")
    if flags["multiples"]:
        argv.append("-m")
    if flags["paired_names"]:
        argv.append("-p")
    subprocess.run(argv, check=True, capture_output=True)

    bam_to_fastq(BAM, tmp_path / "o1.fq", tmp_path / "o2.fq", **flags)
    for end in (1, 2):
        golden = (tmp_path / f"g{end}.fq").read_text()
        assert golden
        assert (tmp_path / f"o{end}.fq").read_text() == golden
