"""Golden test: annotation features byte-identical to the reference
``annotate_fusions.pl`` (run with the vendored BioPerl) on synthetic data.
"""

import os
import shutil
import subprocess

import pytest

from defuse_tpu.annotate.features import Repeats, annotate_fusions
from defuse_tpu.annotate.gene_models import GeneModels
from defuse_tpu.annotate.mapping_stats import mapping_stats
from defuse_tpu.io.fasta import FastaStore
from defuse_tpu.pipeline.discover import discover_fusions
from defuse_tpu.stats.readstats import ReadStats

from synthdata import (make_dataset, write_dataset, write_genome_fasta,
                       write_gtf, write_repeats)

REF = "/root/reference"
MEAN, STD = 200.0, 20.0


@pytest.fixture(scope="module")
def anno_env(tmp_path_factory, ref_binaries):
    tmp = tmp_path_factory.mktemp("annotate")
    ds = make_dataset(seed=47, fusion_pair=("TA", "TB"), break_a=1700,
                      break_b=1500)
    paths = write_dataset(ds, tmp)

    outdir = tmp / "output"
    discover_fusions(
        spanning=str(paths["spanning"]), improper=str(paths["improper"]),
        fastq1=str(paths["fastq1"]), fastq2=str(paths["fastq2"]),
        reference=str(paths["reference"]), exons=str(paths["exons"]),
        fragment_mean=MEAN, fragment_stddev=STD, precision=0.95,
        min_cluster_size=3, min_read_length=50, max_read_length=50,
        outdir=str(outdir), use_device=False)

    # dataset files for annotation
    gtf = tmp / "genes.gtf"
    write_gtf(ds, gtf)
    genome_fa = tmp / "genome.fa"
    write_genome_fasta(ds, genome_fa)
    repeats = tmp / "repeats.regions"
    write_repeats(ds, repeats)
    est_aligns = tmp / "intronEst.txt"
    est_aligns.write_text("")  # no EST evidence

    # output-directory artifacts annotate_fusions.pl expects
    stats = ReadStats(500, MEAN, STD, 50, 50, (50,))
    (outdir / "concordant.read.stats").write_text(stats.format())
    # values as merge_expression.pl would write them (0.5-sums)
    expression = {g.name: ("10.5" if i % 2 else str(10 + i))
                  for i, g in enumerate(ds.genes)}
    with open(outdir / "expression.txt", "w") as fh:
        for gene, value in expression.items():
            fh.write(f"{gene}\t{value}\n")

    # empty breakpoint alignment PSLs (the gmap/blat stage's outputs)
    for name in ("genome", "genome.nointron", "cdna", "est", "exons",
                 "cds"):
        (outdir / f"breakpoints.{name}.psl").write_text("")

    # spanning catalog for mapping stats
    filelist = outdir / "job0.spanning.filelist"
    filelist.write_text(f"1\t2\t{paths['spanning']}\n")
    (outdir / "reads.split.catalog").write_text(
        str(outdir / "job0") + "\n")

    config = tmp / "config.txt"
    config.write_text("\n".join([
        f"gene_models = {gtf}",
        f"genome_fasta = {genome_fa}",
        f"cdna_fasta = {paths['reference']}",
        f"exons_fasta = {tmp}/unused.exons.fa",
        f"cds_fasta = {tmp}/unused.cds.fa",
        f"est_fasta = {tmp}/unused.est.fa",
        f"est_alignments = {est_aligns}",
        f"repeats_regions = {repeats}",
        f"reference_fasta = {paths['reference']}",
        "splice_bias = 10",
        "samtools_bin = /bin/true",
        "percent_identity_threshold = 0.90",
        "calculate_extra_annotations = no",
        f"tools_directory = {ref_binaries}",
        f"scripts_directory = {REF}/scripts",
        "max_insert_size = 500",
    ]) + "\n")

    return dict(tmp=tmp, ds=ds, paths=paths, outdir=outdir, gtf=gtf,
                genome_fa=genome_fa, repeats=repeats, config=config,
                expression=expression, stats=stats)


def test_annotate_golden(anno_env):
    env = anno_env
    proc = subprocess.run(
        ["perl", f"{REF}/scripts/annotate_fusions.pl",
         "-c", str(env["config"]), "-d", str(env["tmp"]),
         "-o", str(env["outdir"]), "-n", "synthlib"],
        capture_output=True, text=True,
        env=dict(os.environ, PERL_HASH_SEED="0", PERL_PERTURB_KEYS="0"))
    assert proc.returncode == 0, proc.stderr
    golden = proc.stdout
    assert golden, "reference annotation produced no rows"

    gene_models = GeneModels(str(env["gtf"]))
    genome = FastaStore.from_file(str(env["genome_fa"]))
    repeats = Repeats(str(env["repeats"]))

    outdir = env["outdir"]
    breaks = {}
    for line in open(outdir / "splitreads.break"):
        f = line.rstrip("\n").split("\t")
        breaks.setdefault(int(f[0]), {})[int(f[1])] = (f[2], f[3],
                                                       int(f[4]))
    seqs = {}
    for line in open(outdir / "splitreads.seq"):
        f = line.rstrip("\n").split("\t")
        seqs[int(f[0])] = f[1]
    clusters = {}
    spanning_by_frag = {}
    solution = {}
    for line in open(outdir / "clusters.sc"):
        f = line.rstrip("\n").split("\t")
        cid, cend, frag = int(f[0]), int(f[1]), int(f[2])
        clusters.setdefault(cid, {}).setdefault(cend, {})[frag] = (
            int(f[6]), int(f[7]))
        solution[frag] = cid

    spanning_rows = []
    for line in open(env["paths"]["spanning"]):
        f = line.rstrip("\n").split("\t")
        spanning_rows.append((int(f[0]), int(f[1]), f[2], f[3],
                              int(f[4]), int(f[5])))

    mstats = mapping_stats(spanning_rows, solution, gene_models)

    rows = annotate_fusions(
        breaks=breaks, seqs=seqs, clusters=clusters,
        gene_models=gene_models, genome=genome, repeats=repeats,
        expression=env["expression"], read_stats=env["stats"],
        library_name="synthlib", mapping_stats=mstats,
        psl_genome=str(outdir / "breakpoints.genome.psl"),
        psl_genome_nointron=str(outdir / "breakpoints.genome.nointron.psl"),
        psl_cdna=str(outdir / "breakpoints.cdna.psl"),
        psl_est=str(outdir / "breakpoints.est.psl"),
        psl_estisland=str(outdir / "breakpoints.genome.psl.estisl.psl")
        if (outdir / "breakpoints.genome.psl.estisl.psl").exists()
        else None,
        psl_exons=str(outdir / "breakpoints.exons.psl"),
        psl_cds=str(outdir / "breakpoints.cds.psl"))

    ours = "".join(r + "\n" for r in rows)
    if ours != golden:
        import difflib
        diff = list(difflib.unified_diff(golden.splitlines(),
                                         ours.splitlines(), lineterm=""))
        print("\n".join(diff[:60]))
    assert ours == golden


def _psl_row(matches, t_inserts, strand, cluster_id, q_size, q_start,
             q_end, t_name, t_size, t_start, t_end, blocks):
    f = ["0"] * 21
    f[0] = str(matches)
    f[7] = str(t_inserts)
    f[8] = strand
    f[9] = str(cluster_id)
    f[10] = str(q_size)
    f[11] = str(q_start)
    f[12] = str(q_end)
    f[13] = t_name
    f[14] = str(t_size)
    f[15] = str(t_start)
    f[16] = str(t_end)
    f[17] = str(len(blocks))
    f[18] = ",".join(str(b[0]) for b in blocks) + ","
    f[19] = ",".join(str(b[1]) for b in blocks) + ","
    f[20] = ",".join(str(b[2]) for b in blocks) + ","
    return "\t".join(f)


def test_annotate_golden_with_psl(anno_env):
    """Exercise the PSL-driven features: percident scaling, homology,
    orf phase, exon-boundary snapping, altsplice, est islands."""
    env = anno_env
    outdir = env["outdir"]
    ds = env["ds"]

    # collect cluster geometry for crafting rows
    breaks = {}
    for line in open(outdir / "splitreads.break"):
        f = line.rstrip("\n").split("\t")
        breaks.setdefault(int(f[0]), {})[int(f[1])] = (f[2], f[3],
                                                       int(f[4]))
    seqs = {}
    for line in open(outdir / "splitreads.seq"):
        f = line.rstrip("\n").split("\t")
        seqs[int(f[0])] = f[1]

    genome_rows, cdna_rows, exon_rows, cds_rows = [], [], [], []
    for cid, seq in seqs.items():
        if "|" not in seq or cid not in breaks:
            continue
        qsize = len(seq) - 1
        bar = seq.find("|")
        # partial genome alignment: left flank maps perfectly
        genome_rows.append(_psl_row(bar, 0, "+", cid, qsize, 0, bar,
                                    "1", 120000, 5000, 5000 + bar,
                                    [(bar, 0, 5000)]))
        # right flank maps too (homology overlap of 6)
        genome_rows.append(_psl_row(qsize - bar, 0, "+", cid, qsize,
                                    bar - 6, qsize, "2", 120000, 9000,
                                    9000 + qsize - bar + 6,
                                    [(qsize - bar + 6, bar - 6, 9000)]))
        # cdna full-length spurious alignment (altsplice-style)
        cdna_rows.append(_psl_row(int(qsize * 0.95), 0, "+", cid, qsize,
                                  0, qsize, "GA|TA", 3500, 100,
                                  100 + qsize, [(qsize, 0, 100)]))
        # exon boundary hit: query splits exactly at the bar between two
        # exon targets
        exon_rows.append(_psl_row(bar, 0, "+", cid, qsize, 0, bar,
                                  "GA|TA|1", bar, 0, bar,
                                  [(bar, 0, 0)]))
        exon_rows.append(_psl_row(qsize - bar, 0, "+", cid, qsize, bar,
                                  qsize, "GB|TB|2", 900, 0, qsize - bar,
                                  [(qsize - bar, bar, 0)]))
        # cds rows with matching phase
        cds_rows.append(_psl_row(30, 0, "+", cid, qsize, 3, 33,
                                 "GA|TA|1", 800, 60, 90, [(30, 3, 60)]))
        cds_rows.append(_psl_row(30, 0, "+", cid, qsize, 6, 36,
                                 "GB|TB|2", 800, 63, 93, [(30, 6, 63)]))

    (outdir / "breakpoints.genome.psl").write_text(
        "\n".join(genome_rows) + "\n" if genome_rows else "")
    (outdir / "breakpoints.genome.nointron.psl").write_text(
        "\n".join(genome_rows) + "\n" if genome_rows else "")
    (outdir / "breakpoints.cdna.psl").write_text(
        "\n".join(cdna_rows) + "\n" if cdna_rows else "")
    (outdir / "breakpoints.exons.psl").write_text(
        "\n".join(exon_rows) + "\n" if exon_rows else "")
    (outdir / "breakpoints.cds.psl").write_text(
        "\n".join(cds_rows) + "\n" if cds_rows else "")
    estisl = outdir / "breakpoints.genome.psl.estisl.psl"
    if estisl.exists():
        estisl.unlink()

    proc = subprocess.run(
        ["perl", f"{REF}/scripts/annotate_fusions.pl",
         "-c", str(env["config"]), "-d", str(env["tmp"]),
         "-o", str(outdir), "-n", "synthlib"],
        capture_output=True, text=True,
        env=dict(os.environ, PERL_HASH_SEED="0", PERL_PERTURB_KEYS="0"))
    assert proc.returncode == 0, proc.stderr
    golden = proc.stdout
    assert "orf\tY" in golden and "exonboundaries\tY" in golden, \
        "crafted PSLs did not exercise orf/exonboundaries"

    gene_models = GeneModels(str(env["gtf"]))
    genome = FastaStore.from_file(str(env["genome_fa"]))
    repeats = Repeats(str(env["repeats"]))
    clusters = {}
    solution = {}
    for line in open(outdir / "clusters.sc"):
        f = line.rstrip("\n").split("\t")
        cid, cend, frag = int(f[0]), int(f[1]), int(f[2])
        clusters.setdefault(cid, {}).setdefault(cend, {})[frag] = (
            int(f[6]), int(f[7]))
        solution[frag] = cid
    spanning_rows = []
    for line in open(env["paths"]["spanning"]):
        f = line.rstrip("\n").split("\t")
        spanning_rows.append((int(f[0]), int(f[1]), f[2], f[3],
                              int(f[4]), int(f[5])))
    mstats = mapping_stats(spanning_rows, solution, gene_models)

    rows = annotate_fusions(
        breaks=breaks, seqs=seqs, clusters=clusters,
        gene_models=gene_models, genome=genome, repeats=repeats,
        expression=env["expression"], read_stats=env["stats"],
        library_name="synthlib", mapping_stats=mstats,
        psl_genome=str(outdir / "breakpoints.genome.psl"),
        psl_genome_nointron=str(outdir /
                                "breakpoints.genome.nointron.psl"),
        psl_cdna=str(outdir / "breakpoints.cdna.psl"),
        psl_est=str(outdir / "breakpoints.est.psl"),
        est_alignments=str(env["tmp"] / "intronEst.txt"),
        psl_exons=str(outdir / "breakpoints.exons.psl"),
        psl_cds=str(outdir / "breakpoints.cds.psl"))

    ours = "".join(r + "\n" for r in rows)
    if ours != golden:
        import difflib
        diff = list(difflib.unified_diff(golden.splitlines(),
                                         ours.splitlines(), lineterm=""))
        print("\n".join(diff[:80]))
    assert ours == golden
