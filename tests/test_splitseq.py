"""Golden test: split-read alignment text (splitseq viewer) byte-identical
to the reference splitseq binary."""

import struct
import subprocess

from defuse_tpu.align.tasks import SplitRow, create_tasks, \
    read_align_region_pairs
from defuse_tpu.cli.get_reads import splitseq_text
from defuse_tpu.core.exons import ExonRegions
from defuse_tpu.io.fasta import FastaStore
from defuse_tpu.pipeline.discover import discover_fusions

from synthdata import make_dataset, write_dataset

MEAN, STD = 200.0, 20.0


def _write_fqi(fastq1, fastq2, fqi_path):
    """Binary read index: per fragment, one long per end with the fastq
    file offset of the record (``tools/ReadIndex.cpp:67-129``)."""
    offsets = [{}, {}]
    for end, path in ((0, fastq1), (1, fastq2)):
        pos = 0
        with open(path, "rb") as fh:
            while True:
                start = pos
                header = fh.readline()
                if not header:
                    break
                pos += len(header)
                for _ in range(3):
                    pos += len(fh.readline())
                frag = int(header[1:].rsplit(b"/", 1)[0])
                offsets[end][frag] = start
    n = max(offsets[0]) + 1
    with open(fqi_path, "wb") as out:
        for frag in range(n):
            out.write(struct.pack("<qq", offsets[0].get(frag, 0),
                                  offsets[1].get(frag, 0)))


def test_splitseq_text_golden(ref_binaries, tmp_path):
    ds = make_dataset(seed=7)
    paths = write_dataset(ds, tmp_path)
    outdir = tmp_path / "out"
    discover_fusions(
        spanning=str(paths["spanning"]), improper=str(paths["improper"]),
        fastq1=str(paths["fastq1"]), fastq2=str(paths["fastq2"]),
        reference=str(paths["reference"]), exons=str(paths["exons"]),
        fragment_mean=MEAN, fragment_stddev=STD, precision=0.95,
        min_cluster_size=3, min_read_length=50, max_read_length=50,
        outdir=str(outdir), use_device=False)

    # reads prefix layout the reference ReadIndex expects
    prefix = tmp_path / "readsix"
    import shutil
    shutil.copy(paths["fastq1"], str(prefix) + ".1.fastq")
    shutil.copy(paths["fastq2"], str(prefix) + ".2.fastq")
    _write_fqi(str(prefix) + ".1.fastq", str(prefix) + ".2.fastq",
               str(prefix) + ".fqi")

    proc = subprocess.run(
        [str(ref_binaries / "splitseq"),
         "-f", str(paths["reference"]), "-e", str(paths["exons"]),
         "-u", str(MEAN), "-s", str(STD), "-n", "50", "-x", "50",
         "-r", str(outdir / "clusters.sc.regions"),
         "-p", str(prefix),
         "-a", str(outdir / "splitreads.predalign"), "-i", "-1"],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    golden = proc.stdout
    assert golden.strip(), "splitseq produced no alignment text"

    # ours
    reference = FastaStore.from_file(str(paths["reference"]))
    exons = ExonRegions.from_file(str(paths["exons"]))
    fusion_regions = read_align_region_pairs(
        str(outdir / "clusters.sc.regions"))
    tasks = create_tasks(reference, exons, MEAN, STD, 50, 50,
                         fusion_regions)
    rows_by_fusion: dict[int, list] = {}
    order = []
    with open(outdir / "splitreads.predalign") as fh:
        for line in fh:
            row = SplitRow.parse(line)
            if row.fusion_id not in rows_by_fusion:
                order.append(row.fusion_id)
            rows_by_fusion.setdefault(row.fusion_id, []).append(row)

    reads = {}
    for end, path in ((0, paths["fastq1"]), (1, paths["fastq2"])):
        with open(path) as fh:
            while True:
                header = fh.readline()
                if not header:
                    break
                seq = fh.readline().rstrip("\n")
                fh.readline()
                fh.readline()
                frag = int(header[1:].rsplit("/", 1)[0])
                reads[frag | (end << 31)] = seq

    import io
    buf = io.StringIO()
    for fid in order:
        if fid in tasks:
            splitseq_text(tasks[fid], rows_by_fusion[fid], reads, buf)
    assert buf.getvalue() == golden
