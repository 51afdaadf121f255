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


def test_expression_plot(tmp_path):
    """expression_plot.pl equivalent: pileup over a gene's transcripts,
    merged-exonic remap, breakpoint marker, plot + table outputs."""
    from defuse_tpu.cli.expression_plot import (expression_plot,
                                                merge_regions,
                                                merged_transcript_position)

    # merge + remap helpers on constructed intervals
    assert merge_regions([(10, 20), (15, 30), (40, 50)]) == \
        [(10, 30), (40, 50)]
    regions = [(100, 199), (300, 399)]
    assert merged_transcript_position(regions, 0, 100) == 1
    assert merged_transcript_position(regions, 0, 199) == 100
    assert merged_transcript_position(regions, 0, 300) == 101
    assert merged_transcript_position(regions, 0, 250) == 101  # snaps
    assert merged_transcript_position(regions, 1, 100) == 200  # - strand

    # two-transcript gene: T1 exons (100-199, 300-399), T2 (300-399,
    # 500-599); merged exonic length 300
    cdna_regions = tmp_path / "cdna.regions"
    cdna_regions.write_text(
        "GX\tT1\t1\t+\t100\t199\t300\t399\t\n"
        "GX\tT2\t1\t+\t300\t399\t500\t599\t\n")
    sam = tmp_path / "cdna.pair.sam"
    rows = []
    # 3 reads covering T1 positions 1-50 (genomic 100-149)
    for i in range(3):
        rows.append(f"{i}\t99\tGX|T1\t1\t255\t50M\t=\t1\t50\t{'A'*50}\t"
                    f"{'I'*50}")
    # 2 reads covering T2 positions 101-150 (genomic 500-549)
    for i in range(3, 5):
        rows.append(f"{i}\t99\tGX|T2\t101\t255\t50M\t=\t101\t50\t"
                    f"{'A'*50}\t{'I'*50}")
    sam.write_text("\n".join(rows) + "\n")

    results = tmp_path / "results.tsv"
    results.write_text(
        "cluster_id\tgene1\tgene2\tgenomic_break_pos1\t"
        "genomic_break_pos2\tgenomic_strand1\tgenomic_strand2\n"
        "7\tGX\tGY\t350\t9999\t+\t-\n")

    out = expression_plot(
        concordant_sam=str(sam), cdna_regions=str(cdna_regions),
        gene_id="GX", out_path=str(tmp_path / "gx.png"),
        results_path=str(results), fusion_id=7)

    table = {int(l.split("\t")[0]): int(l.split("\t")[1])
             for l in open(out["table"]).read().splitlines()[1:]}
    assert len(table) == 300  # merged exonic length
    assert table[1] == 3 and table[50] == 3 and table[51] == 0
    # T2 pos 101-150 = genomic 500-549 = merged exonic 201-250
    assert table[201] == 2 and table[250] == 2 and table[251] == 0
    # breakpoint at genomic 350 = merged exonic 151
    assert out["break_position"] == 151
    import pathlib as _pl
    assert out["plot"] and _pl.Path(out["plot"]).exists()


def test_export_cli(tmp_path):
    """The `export` subcommand drives every converter from the CLI."""
    from defuse_tpu.cli.main import main as cli_main

    results = tmp_path / "r.tsv"
    results.write_text(
        "cluster_id\tgene_chromosome1\tgenomic_break_pos1\t"
        "gene_chromosome2\tgenomic_break_pos2\tprobability\n"
        "0\t1\t1000\t2\t2000\t0.9\n1\t3\t500\t4\t700\t0.1\n")
    links = tmp_path / "links.txt"
    assert cli_main(["export", "circos-links", "-i", str(results),
                     "-o", str(links), "--filtered-only"]) == 0
    assert links.read_text() == "hs1 1000 1001 hs2 2000 2001\n"

    qseq = tmp_path / "in.qseq"
    qseq.write_text("M1\t5\t1\t2\t3\t4\t0\t1\tACG.T\tabcde\n")
    fq = tmp_path / "out.fq"
    assert cli_main(["export", "qseq2fastq", "-i", str(qseq),
                     "-o", str(fq)]) == 0
    assert fq.read_text().splitlines()[1] == "ACGNT"

    sol = tmp_path / "sol.fq"
    sol.write_text("@r/1\nACGT\n+\nabcd\n")
    std = tmp_path / "std.fq"
    assert cli_main(["export", "fq-all2std", "-i", str(sol),
                     "-o", str(std)]) == 0
    assert std.read_text().splitlines()[3] == \
        "".join(chr(ord(c) - 31) for c in "abcd")

    from synthdata import make_dataset, write_gtf
    ds = make_dataset(seed=3)
    gtf = tmp_path / "g.gtf"
    write_gtf(ds, gtf)
    expr = tmp_path / "expr.txt"
    expr.write_text(f"{ds.genes[0].name}\t12.5\nUNKNOWN_GENE\t1\n")
    pts = tmp_path / "points.txt"
    assert cli_main(["export", "circos-points", "-i", str(expr),
                     "-o", str(pts), "-g", str(gtf)]) == 0
    row = pts.read_text().splitlines()
    assert len(row) == 1 and row[0].startswith("hs") and \
        row[0].endswith(" 12.5")


def test_circos_converters_golden(tmp_path):
    """Byte parity vs the reference Perl converters
    (results_to_circos_links.pl / filter_equal.pl /
    cnv_to_circos_points.pl) and the create_circos_data.pl data-file
    contract (links split by orf, five CNV level tracks)."""
    from defuse_tpu.cli.exporters import (cnv_to_circos_points,
                                          create_circos_data,
                                          filter_equal,
                                          results_to_circos_link_rows)
    ref = "/root/reference/scripts"
    results = (
        "cluster_id\tlibrary_name\tgene_chromosome1\tgenomic_break_pos1"
        "\tgene_chromosome2\tgenomic_break_pos2\torf\n"
        "0\tlibA\t1\t1000\t2\t2000\tY\n"
        "1\tlibA\t3\t500\tX\t700\tN\n"
        "2\tlibA\t23\t42\tMT\t77\tY\n")
    res_path = tmp_path / "results.tsv"
    res_path.write_text(results)

    # results_to_circos_links.pl parity (whole file)
    golden = subprocess.run(
        ["perl", f"{ref}/results_to_circos_links.pl"],
        input=results, capture_output=True, text=True, check=True).stdout
    buf = io.StringIO()
    results_to_circos_link_rows(io.StringIO(results), buf)
    assert buf.getvalue() == golden

    # filter_equal.pl | results_to_circos_links.pl parity per orf flag
    for orf in ("Y", "N"):
        flt = subprocess.run(
            ["perl", f"{ref}/filter_equal.pl", "orf", orf],
            input=results, capture_output=True, text=True,
            check=True).stdout
        golden = subprocess.run(
            ["perl", f"{ref}/results_to_circos_links.pl"],
            input=flt, capture_output=True, text=True, check=True).stdout
        buf = io.StringIO()
        results_to_circos_link_rows(
            filter_equal(io.StringIO(results), "orf", orf), buf)
        assert buf.getvalue() == golden

    # cnv_to_circos_points.pl parity (incl. the 23 -> X rename)
    cnv = ("1\t100\t200\t3\t0.5\n"
           "23\t10\t20\t4\t1.25\n"
           "5\t1\t2\t9\t-0.75\n")
    cnv_path = tmp_path / "cnv.tsv"
    cnv_path.write_text(cnv)
    for levels in ((1, 2), (3,), (4, 5, 6), (7, 8), (9, 10, 11)):
        golden = subprocess.run(
            ["perl", f"{ref}/cnv_to_circos_points.pl",
             ",".join(map(str, levels))],
            input=cnv, capture_output=True, text=True, check=True).stdout
        buf = io.StringIO()
        cnv_to_circos_points(io.StringIO(cnv), levels, buf)
        assert buf.getvalue() == golden

    # create_circos_data: file set + contents
    paths = create_circos_data(str(res_path), str(tmp_path / "pfx"),
                               cnv_path=str(cnv_path))
    assert [p.rsplit("pfx", 1)[1] for p in paths] == \
        [".1.link", ".2.link", ".somatic.loss.txt", ".neut.txt",
         ".somatic.gain.txt", ".germline.loss.txt",
         ".germline.gain.txt"]
    link1 = open(paths[0]).read()
    assert "libA-0\ths1\t1000\t1000\n" in link1 and "libA-1" not in link1
    assert open(paths[3]).read() == "hs1\t100\t200\t0.5\n"
