"""Opt-in de novo breakpoint assembly stage.

The reference 0.8 ships the de Bruijn ``PathFinder`` assembler
(``tools/PathFinder.cpp``) but no longer invokes it; the legacy flow
(``scripts/select_breakpoint_seq.pl``, retired) assembled each cluster's
candidate reads and arbitrated splitr-vs-denovo by spanning p-value.
This stage revives that capability behind ``denovo_assembly = yes``:
per cluster, candidate reads (as nominated for split realignment) are
assembled left-anchored/right-anchored through ``align.denovo.PathFinder``
and written to ``denovo.seq``; ``denovo.predict`` records, per cluster,
which prediction source survives arbitration.  Outputs are additional
files — ``results.tsv`` keeps exact reference-schema parity.
"""

from __future__ import annotations

from ..align.denovo import PathFinder
from .denovo_arbitration import arbitrate


def assemble_clusters(candidate_rows, read_lookup, k: int = 21,
                      max_length: int = 500, min_count: int = 2):
    """Assemble a breakpoint sequence per cluster.

    candidate_rows: iterable of (cluster_id, fragment, read_end,
    rev_comp) as produced by the native candidate collection (or the
    Python ``collect_candidates``).  ``read_lookup(fragment, read_end)``
    returns the raw read sequence.  A candidate with ``rev_comp == 1``
    was nominated by a mate on the *left* (cluster end 0) flank — the
    read itself therefore sits downstream, toward/past the junction, so
    it seeds the *right* side of the path search (and vice versa).

    Returns {cluster_id: (sequence, n_reads)} for assembled clusters.
    """
    from ..core.types import revcomp

    by_cluster: dict[int, list[tuple[str, int, int]]] = {}
    for (cid, fragment, read_end, rev_comp) in candidate_rows:
        seq = read_lookup(int(fragment), int(read_end))
        if not seq:
            continue
        if rev_comp:
            seq = revcomp(seq)
        by_cluster.setdefault(int(cid), []).append(
            (seq, 0 if rev_comp else 1, 1 if rev_comp else 0))

    out: dict[int, tuple[str, int]] = {}
    for cid in sorted(by_cluster):
        entries = by_cluster[cid]
        seqs = [e[0] for e in entries]
        lflags = [e[1] for e in entries]
        rflags = [e[2] for e in entries]
        finder = PathFinder(k=k, max_length=max_length, find_all=False,
                            min_count=min_count)
        if finder.find_path(seqs, lflags, rflags) and finder.sequences:
            out[cid] = (finder.sequences[0], len(seqs))
    return out


def write_denovo_outputs(assemblies, splitr_span_pval, outdir):
    """``denovo.seq`` rows + ``denovo.predict`` arbitration column.

    Clusters with no split-read support get a winning denovo prediction;
    clusters with both keep splitr unless its spanning p-value is worse
    (legacy ``select_breakpoint_seq.pl:29-76`` rule; without a genomic
    breakpos for the assembly we treat its p-value as losing ties).
    """
    import pathlib

    out = pathlib.Path(outdir)
    denovo_pval = {cid: float("-inf") for cid in assemblies}
    verdict = arbitrate(
        {cid: float(p) for cid, p in splitr_span_pval.items()},
        denovo_pval)
    with open(out / "denovo.seq", "w") as fh:
        for cid in sorted(assemblies):
            seq, count = assemblies[cid]
            fh.write(f"{cid}\t{seq}\t{count}\n")
    with open(out / "denovo.predict", "w") as fh:
        for cid in sorted(verdict):
            fh.write(f"{cid}\t{verdict[cid]}\n")
    return {"denovo_seq": str(out / "denovo.seq"),
            "denovo_predict": str(out / "denovo.predict")}
