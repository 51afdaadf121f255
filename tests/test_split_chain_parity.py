"""End-to-end parity of the split-read chain on synthetic fusion data:

clusters -> setcover -> align regions -> dosplitalign -> evalsplitalign,
golden reference binaries vs our implementation, byte-identical at every
stage.
"""

import os
import subprocess

import pytest

from defuse_tpu.cluster.discordant import cluster_alignments
from defuse_tpu.cluster.matepair_em import EMParams
from defuse_tpu.cluster.setcover import run_setcover_file
from defuse_tpu.core.exons import ExonRegions
from defuse_tpu.io.fasta import FastaStore
from defuse_tpu.io.sam import iter_compact, iter_sam, load_alignments
from defuse_tpu.align.tasks import (SplitReadRealigner, create_tasks,
                                    evaluate_file, read_align_region_pairs)

from synthdata import align_regions_lines, make_dataset, write_dataset

MEAN, STD, PREC, MINCL = 200.0, 20.0, 0.95, 3
MINREAD = MAXREAD = 50


VARIANTS = {
    "plus_plus": dict(seed=7, fusion_pair=("TA", "TB"),
                      break_a=1700, break_b=1500),
    "minus_minus": dict(seed=11, fusion_pair=("TC", "TD"),
                        break_a=1100, break_b=900),
    "plus_minus": dict(seed=23, fusion_pair=("TB", "TC"),
                       break_a=2100, break_b=700),
}


@pytest.fixture(scope="module", params=sorted(VARIANTS))
def synth(request, tmp_path_factory):
    tmp = tmp_path_factory.mktemp(f"synth_{request.param}")
    ds = make_dataset(**VARIANTS[request.param])
    paths = write_dataset(ds, tmp)
    paths["dir"] = tmp
    paths["ds"] = ds
    return paths


def _sort_n(path_in, path_out):
    env = dict(os.environ, LC_ALL="C")
    with open(path_out, "w") as out:
        subprocess.run(["sort", "-n", str(path_in)], check=True, stdout=out,
                       env=env)


def test_full_chain_parity(ref_binaries, synth):
    tmp = synth["dir"]

    # --- stage 1: clustering -------------------------------------------
    clusters_golden = tmp / "clusters.golden"
    subprocess.run(
        [str(ref_binaries / "clustermatepairs"),
         "-a", str(synth["spanning"]), "-c", str(clusters_golden),
         "-u", str(MEAN), "-s", str(STD), "-p", str(PREC),
         "-m", str(MINCL)],
        check=True, capture_output=True)

    table = load_alignments(iter_compact(synth["spanning"]))
    rows = cluster_alignments(
        table, EMParams(MEAN, STD, PREC, MINCL))
    ours_text = "".join(r.format() + "\n" for r in rows)
    golden_text = clusters_golden.read_text()
    assert golden_text and ours_text == golden_text

    # --- stage 2: setcover ---------------------------------------------
    sc_golden = tmp / "clusters.sc.golden"
    subprocess.run(
        [str(ref_binaries / "setcover"), "-c", str(clusters_golden),
         "-o", str(sc_golden), "-m", str(MINCL)],
        check=True, capture_output=True)
    sc_ours = tmp / "clusters.sc.ours"
    clusters_ours = tmp / "clusters.ours"
    clusters_ours.write_text(ours_text)
    run_setcover_file(str(clusters_ours), str(sc_ours), MINCL)
    assert sc_ours.read_text() == sc_golden.read_text()
    assert sc_golden.read_text(), "setcover output is empty"

    # --- stage 3: align regions ----------------------------------------
    regions = tmp / "clusters.sc.regions"
    regions.write_text(
        "\n".join(align_regions_lines(sc_golden.read_text().splitlines()))
        + "\n")

    # --- stage 4: dosplitalign -----------------------------------------
    split_golden = tmp / "splitalign.golden"
    subprocess.run(
        [str(ref_binaries / "dosplitalign"),
         "-f", str(synth["reference"]), "-e", str(synth["exons"]),
         "-u", str(MEAN), "-s", str(STD),
         "-n", str(MINREAD), "-x", str(MAXREAD),
         "-r", str(regions), "-i", str(synth["improper"]),
         "-1", str(synth["fastq1"]), "-2", str(synth["fastq2"]),
         "-a", str(split_golden)],
        check=True, capture_output=True)

    reference = FastaStore.from_file(str(synth["reference"]))
    exons = ExonRegions.from_file(str(synth["exons"]))
    fusion_regions = read_align_region_pairs(str(regions))
    tasks = create_tasks(reference, exons, MEAN, STD, MINREAD, MAXREAD,
                         fusion_regions)
    realigner = SplitReadRealigner()
    for task in tasks.values():
        realigner.add_task(task)
    realigner.add_reads_fastq(str(synth["fastq1"]))
    realigner.add_reads_fastq(str(synth["fastq2"]))
    split_ours = tmp / "splitalign.ours"
    with open(split_ours, "w") as out:
        realigner.align_stream(iter_sam(str(synth["improper"])), out)

    golden_split_text = split_golden.read_text()
    assert golden_split_text, "dosplitalign produced no rows"
    assert split_ours.read_text() == golden_split_text

    # --- stage 5: evalsplitalign ---------------------------------------
    sorted_golden = tmp / "splitalign.sorted"
    _sort_n(split_golden, sorted_golden)

    out_golden = {n: tmp / f"{n}.golden" for n in ("seq", "break",
                                                   "predalign")}
    subprocess.run(
        [str(ref_binaries / "evalsplitalign"),
         "-f", str(synth["reference"]), "-e", str(synth["exons"]),
         "-u", str(MEAN), "-s", str(STD),
         "-n", str(MINREAD), "-x", str(MAXREAD),
         "-r", str(regions), "-a", str(sorted_golden),
         "-q", str(out_golden["seq"]), "-b", str(out_golden["break"]),
         "-p", str(out_golden["predalign"])],
        check=True, capture_output=True)

    out_ours = {n: tmp / f"{n}.ours" for n in ("seq", "break", "predalign")}
    with open(out_ours["seq"], "w") as seq_out, \
            open(out_ours["break"], "w") as break_out, \
            open(out_ours["predalign"], "w") as pred_out:
        evaluate_file(tasks, str(sorted_golden), seq_out, break_out,
                      pred_out)

    for name in ("seq", "break", "predalign"):
        golden = out_golden[name].read_text()
        assert golden, f"{name} golden empty"
        assert out_ours[name].read_text() == golden, f"{name} mismatch"

    # sanity: the predicted breakpoint sequence matches the simulated one
    ds = synth["ds"]
    seqs = [l.split("\t")[1] for l in
            out_golden["seq"].read_text().splitlines()]
    joined = [s.replace("|", "") for s in seqs]
    assert any(s in ds.fusion_seq or ds.fusion_seq[
        ds.fusion[1] - 60:ds.fusion[1] + 60] in s for s in joined), \
        "no predicted sequence overlaps the simulated fusion breakpoint"
