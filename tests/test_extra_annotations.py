"""Behavior tests for the extra annotations (break-concordant and
interrupted indices)."""

from defuse_tpu.annotate.extra import (break_concordant, index_sam_by_ref,
                                       interrupted, interrupted_index,
                                       splicing_index)
from defuse_tpu.annotate.gene_models import GeneModels

from synthdata import make_dataset, write_gtf
from test_stats_filters import _make_concordant_sam


def test_break_concordant_and_interrupted(tmp_path):
    ds = make_dataset(seed=7)
    gtf = tmp_path / "genes.gtf"
    write_gtf(ds, gtf)
    gm = GeneModels(str(gtf))
    sam = tmp_path / "concordant.sam"
    _make_concordant_sam(ds, sam, n_pairs=2000)
    with open(sam) as fh:
        by_ref = index_sam_by_ref(fh)

    ga = ds.genes[0]
    gb = ds.genes[1]
    # genomic breakpoints inside the genes (the reference's location
    # screen uses the raw break position, so transcript-space breaks are
    # skipped — quirk preserved; genome-ref cluster ends drive these)
    bp_a = ga.exons[2][0] + 50
    bp_b = gb.exons[1][0] + 50
    breaks = {0: {0: ("1", "+", bp_a), 1: ("2", "-", bp_b)}}
    bc = break_concordant(breaks, gm, by_ref, max_fragment_length=260,
                          splice_bias=10)
    # a concordantly-expressed gene has reads spanning any mid position
    assert bc.get((0, 0), 0) > 0
    assert bc.get((0, 1), 0) > 0

    info = interrupted(breaks, gm, by_ref, splice_bias=10)
    assert (0, 0) in info and (0, 1) in info
    gene, sb, sa, cb, ca = info[(0, 0)]
    assert gene == "GA"
    assert sb > 0 and sa > 0
    assert cb + ca > 0
    total_exonic = sum(e - s + 1 for s, e in ga.exons)
    # split sizes cover the transcript (+1 for the shared break base)
    assert abs((sb + sa) - (total_exonic + 1)) <= 1

    si = splicing_index(bc, {0: 10})
    assert si[(0, 0)] == bc[(0, 0)] / 10
    ii = interrupted_index(info)
    # uninterrupted expression: before/after expression roughly equal
    assert 0.3 < ii[(0, 0)] < 3.0
