"""Utility components: matealign (golden vs reference binary), denovo
arbitration, exporters/converters."""

import io
import random
import subprocess

from defuse_tpu.align.matealign import matealign
from defuse_tpu.cli.exporters import qseq2fastq, results_to_circos_links
from defuse_tpu.io.fasta import FastaStore, write_fasta
from defuse_tpu.pipeline.denovo_arbitration import arbitrate


def test_matealign_golden(ref_binaries, tmp_path):
    rng = random.Random(6)
    ref_seq = "".join(rng.choice("ACGT") for _ in range(4000))
    ref_fa = tmp_path / "ref.fa"
    write_fasta(str(ref_fa), {"R": ref_seq})

    # end-0 mates anchored on R (SAM rows); end-1 reads sampled
    # downstream so they realign within the search window
    from defuse_tpu.core.types import revcomp
    sam_rows = []
    reads1, reads2 = [], []
    mate_alignments = {}
    for frag in range(12):
        pos = rng.randint(500, 3000)
        r1 = ref_seq[pos - 1:pos + 35 - 1]
        start2 = pos + rng.randint(60, 150)
        r2 = revcomp(ref_seq[start2 - 1:start2 + 35 - 1])
        reads1.append((frag, 0, r1))
        reads2.append((frag, 1, r2))
        sam_rows.append(f"{frag}/1\t0\tR\t{pos}\t255\t35M\t*\t0\t0\t"
                        f"{r1}\t{'I' * 35}")
        # anchor is the strand-facing start (matealign.cpp:155)
        mate_alignments[(frag, 0)] = [("R", 0, pos)]

    for end, reads in ((1, reads1), (2, reads2)):
        with open(tmp_path / f"reads.{end}.fastq", "w") as fh:
            for frag, _e, seq in reads:
                fh.write(f"@{frag}/{end}\n{seq}\n+\n{'I' * len(seq)}\n")

    proc = subprocess.run(
        [str(ref_binaries / "matealign"), "-r", str(ref_fa),
         "-1", str(tmp_path / "reads.1.fastq"),
         "-2", str(tmp_path / "reads.2.fastq"),
         "-s", "300", "-m", "10", "-x", "-5", "-g", "-5", "-t", "0.8"],
        input="\n".join(sam_rows) + "\n", capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr

    reference = FastaStore.from_file(str(ref_fa))
    ours = "\n".join(matealign(
        mate_alignments, reads1 + reads2, reference, search_length=300,
        match=10, mismatch=-5, gap=-5, threshold=0.8))
    assert ours.splitlines() == proc.stdout.splitlines()
    assert ours, "no matealign rows produced"


def test_arbitrate():
    assert arbitrate({1: 0.5, 2: 0.9}, {2: 0.95, 3: 0.1}) == \
        {1: "splitr", 2: "denovo", 3: "denovo"}


def test_circos_links():
    results = ("cluster_id\tgene_chromosome1\tgenomic_break_pos1\t"
               "gene_chromosome2\tgenomic_break_pos2\tprobability\n"
               "0\t1\t1000\t2\t2000\t0.9\n"
               "1\t3\t500\t4\t700\t0.1\n")
    import pathlib
    import tempfile
    path = pathlib.Path(tempfile.mkdtemp()) / "r.tsv"
    path.write_text(results)
    buf = io.StringIO()
    results_to_circos_links(str(path), buf, filtered_only=True)
    assert buf.getvalue() == "hs1 1000 1001 hs2 2000 2001\n"


def test_qseq2fastq():
    buf = io.StringIO()
    qseq2fastq(["M1\t5\t1\t2\t3\t4\t0\t1\tACG.T\tabcde"], buf)
    out = buf.getvalue().splitlines()
    assert out[0] == "@M1_5:1:2:3:4#0/1"
    assert out[1] == "ACGNT"
    assert out[3] == "".join(chr(ord(c) - 31) for c in "abcde")
