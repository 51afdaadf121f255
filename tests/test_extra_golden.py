"""Golden tests: extra annotations vs the reference Perl scripts
(calc_break_concordant.pl / calc_interrupted.pl), with a faithful
samtools-view shim (region query over a plain-SAM 'bam')."""

import os
import stat
import subprocess

import pytest

from defuse_tpu.annotate.extra import (break_concordant, index_sam_by_ref,
                                       interrupted)
from defuse_tpu.annotate.gene_models import GeneModels
from defuse_tpu.stats.readstats import ReadStats

from synthdata import make_dataset, write_gtf
from test_stats_filters import _make_concordant_sam

REF = "/root/reference"
MEAN, STD = 200.0, 20.0

SHIM = r'''#!/usr/bin/env python3
"""samtools-view shim: `view <sam-as-bam> ['tid' | 'tid:lo-hi']`.
Emits rows on rname tid overlapping [lo, hi] (1-based inclusive;
alignment end = pos + len(seq) - 1, matching the simple full-match
CIGARs these tests generate)."""
import sys

_view, path = sys.argv[1], sys.argv[2]
region = sys.argv[3] if len(sys.argv) > 3 else None
tid, lo, hi = None, None, None
if region:
    if ":" in region:
        tid, span = region.rsplit(":", 1)
        lo_s, hi_s = span.split("-")
        lo, hi = int(lo_s), int(hi_s)
    else:
        tid = region
with open(path) as fh:
    for line in fh:
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        if tid is not None and f[2] != tid:
            continue
        if lo is not None:
            pos = int(f[3])
            end = pos + len(f[9]) - 1
            if end < lo or pos > hi:
                continue
        sys.stdout.write(line)
'''


@pytest.fixture(scope="module")
def extra_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("extra_golden")
    ds = make_dataset(seed=7)
    gtf = tmp / "genes.gtf"
    write_gtf(ds, gtf)

    outdir = tmp / "output"
    outdir.mkdir()
    _make_concordant_sam(ds, outdir / "cdna.pair.bam", n_pairs=2000)
    (outdir / "concordant.read.stats").write_text(
        ReadStats(500, MEAN, STD, 50, 50, (50,)).format())

    samtools = tmp / "samtools"
    samtools.write_text(SHIM)
    samtools.chmod(samtools.stat().st_mode | stat.S_IEXEC)

    ga, gb = ds.genes[0], ds.genes[1]
    bp_a = ga.exons[2][0] + 50
    bp_b = gb.exons[1][0] + 50
    breaks_path = tmp / "breaks"
    breaks_path.write_text(f"0\t0\t1\t+\t{bp_a}\n0\t1\t2\t-\t{bp_b}\n")
    breaks = {0: {0: ("1", "+", bp_a), 1: ("2", "-", bp_b)}}

    config = tmp / "config.txt"
    config.write_text("\n".join([
        f"gene_models = {gtf}",
        "splice_bias = 10",
        f"samtools_bin = {samtools}",
    ]) + "\n")
    return dict(tmp=tmp, outdir=outdir, config=config, gtf=gtf,
                breaks_path=breaks_path, breaks=breaks)


def _patched_script(script, tmp):
    """The shipped scripts never declare ``$dataset_directory`` — a
    strict-mode compile error, so they cannot run as-is from the
    reference tree.  Copy with ONLY the declaration added (and the lib
    path pinned back to the reference scripts dir); behavior untouched."""
    src = open(f"{REF}/scripts/{script}").read()
    if "my $dataset_directory" not in src:
        src = src.replace(
            "my $breaks_filename;",
            "my $breaks_filename;\nmy $dataset_directory;", 1)
    src = src.replace('use lib "$FindBin::RealBin";',
                      f'use lib "{REF}/scripts";', 1)
    dst = tmp / script
    dst.write_text(src)
    return str(dst)


def _run_ref(script, env):
    proc = subprocess.run(
        ["perl", _patched_script(script, env["tmp"]),
         "-c", str(env["config"]), "-d", str(env["tmp"]),
         "-o", str(env["outdir"]), "-b", str(env["breaks_path"])],
        capture_output=True, text=True,
        env=dict(os.environ, PERL_HASH_SEED="0", PERL_PERTURB_KEYS="0"))
    assert proc.returncode == 0, proc.stderr
    return sorted(l for l in proc.stdout.splitlines() if l)


def test_break_concordant_golden(extra_env):
    env = extra_env
    golden = _run_ref("calc_break_concordant.pl", env)
    assert golden, "reference produced no break-concordant rows"

    gm = GeneModels(str(env["gtf"]))
    with open(env["outdir"] / "cdna.pair.bam") as fh:
        by_ref = index_sam_by_ref(fh)
    max_frag = int(MEAN + 3 * STD)
    bc = break_concordant(env["breaks"], gm, by_ref, max_frag,
                          splice_bias=10)
    ours = sorted(f"{cid}\t{cend}\t{count}"
                  for (cid, cend), count in bc.items())
    assert ours == golden


def test_interrupted_golden(extra_env):
    env = extra_env
    golden = _run_ref("calc_interrupted.pl", env)
    assert golden, "reference produced no interrupted rows"

    gm = GeneModels(str(env["gtf"]))
    with open(env["outdir"] / "cdna.pair.bam") as fh:
        by_ref = index_sam_by_ref(fh)
    info = interrupted(env["breaks"], gm, by_ref, splice_bias=10)
    ours = sorted(
        f"{cid}\t{cend}\t{gene}\t{sb}\t{sa}\t{cb}\t{ca}"
        for (cid, cend), (gene, sb, sa, cb, ca) in info.items())
    assert ours == golden
