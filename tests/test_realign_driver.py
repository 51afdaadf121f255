"""Native two-phase realign driver vs the Python collect/realign chain.

The end-to-end discover goldens already cover the driver; this pins the
module-level contract: identical candidate nomination and identical
split-row bytes, with and without a survivors mask.
"""

import numpy as np
import pytest

from defuse_tpu.align.batch_realign import (collect_candidates,
                                            realign_candidates)
from defuse_tpu.align.tasks import (SplitReadRealigner, create_tasks,
                                    read_align_region_pairs)
from defuse_tpu.cluster.setcover import run_setcover_file
from defuse_tpu.core.exons import ExonRegions
from defuse_tpu.io.fasta import FastaStore
from defuse_tpu.io.sam import iter_sam
from defuse_tpu.ops.split_dp_batch import dp_row_maxima
from defuse_tpu.pipeline.regions import align_regions_lines

from synthdata import make_dataset, write_dataset

MEAN, STD = 200.0, 20.0


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from defuse_tpu.cluster import native
    if not native.available():
        pytest.skip("native library not built")
    from defuse_tpu.cluster.discordant import cluster_alignments, \
        write_clusters
    from defuse_tpu.cluster.matepair_em import EMParams
    from defuse_tpu.io.sam import iter_compact, load_alignments

    tmp = tmp_path_factory.mktemp("driver")
    ds = make_dataset(seed=11)
    paths = write_dataset(ds, tmp)
    params = EMParams(MEAN, STD, 0.95, 3)
    table = load_alignments(iter_compact(paths["spanning"]))
    rows = cluster_alignments(table, params, em_mode="native")
    write_clusters(rows, str(tmp / "clusters"))
    run_setcover_file(str(tmp / "clusters"), str(tmp / "sc"), 3)
    (tmp / "regions").write_text("\n".join(align_regions_lines(
        (tmp / "sc").read_text().splitlines())) + "\n")

    reference = FastaStore.from_file(str(paths["reference"]))
    exons = ExonRegions.from_file(str(paths["exons"]))
    tasks = create_tasks(reference, exons, MEAN, STD, 50, 50,
                         read_align_region_pairs(str(tmp / "regions")))
    realigner = SplitReadRealigner()
    for task in tasks.values():
        realigner.add_task(task)
    realigner.add_reads_fastq(str(paths["fastq1"]))
    realigner.add_reads_fastq(str(paths["fastq2"]))
    return tmp, paths, tasks, realigner


def _python_rows(realigner, improper):
    candidates = collect_candidates(realigner, iter_sam(improper))
    rows = realign_candidates(realigner, candidates, dp_row_maxima)
    return candidates, "".join(r.format() + "\n" for r in rows)


def _make_driver(native, paths, tasks, realigner):
    cluster_ids = sorted(tasks)
    return native.RealignDriver(
        str(paths["improper"]),
        (str(paths["fastq1"]), str(paths["fastq2"])), realigner.binned,
        cluster_ids,
        [tasks[c].split_align_seq[0] for c in cluster_ids],
        [tasks[c].split_align_seq[1] for c in cluster_ids])


def test_driver_rows_match_python(setup, tmp_path):
    from defuse_tpu.cluster import native
    tmp, paths, tasks, realigner = setup
    candidates, py_text = _python_rows(realigner, str(paths["improper"]))
    assert py_text, "fixture produced no split rows"

    driver = _make_driver(native, paths, tasks, realigner)
    assert driver.n_candidates == len(candidates)
    out = tmp_path / "rows.native"
    driver.emit(out)
    assert out.read_text() == py_text
    driver.close()


def test_driver_indexed_store_matches_eager(setup, tmp_path):
    """The deferred .fqi-indexed read store (selective pread of only the
    candidate records) must reproduce the eager full-parse driver
    byte-for-byte: same candidate count, same read matrix, same rows."""
    from defuse_tpu.cluster import native
    tmp, paths, tasks, realigner = setup

    ingested = native.ingest_fastq(str(paths["fastq1"]),
                                   str(paths["fastq2"]),
                                   str(tmp_path / "reads"))
    assert ingested is not None
    r1 = tmp_path / "reads" / "reads.1.fastq"
    r2 = tmp_path / "reads" / "reads.2.fastq"
    handle = native.reads_index(str(r1), str(r2))
    assert handle is not None

    cluster_ids = sorted(tasks)
    flank1s = [tasks[c].split_align_seq[0] for c in cluster_ids]
    flank2s = [tasks[c].split_align_seq[1] for c in cluster_ids]
    indexed = native.RealignDriver(
        str(paths["improper"]), handle, realigner.binned, cluster_ids,
        flank1s, flank2s)
    eager = _make_driver(native, paths, tasks, realigner)
    assert indexed.n_candidates == eager.n_candidates

    ri, li, fi = indexed.read_matrix(64)
    re_, le, fe = eager.read_matrix(64)
    assert (li == le).all() and (fi == fe).all()
    assert (ri == re_).all()

    out_i = tmp_path / "rows.indexed"
    out_e = tmp_path / "rows.eager"
    indexed.emit(out_i)
    eager.emit(out_e)
    assert out_i.read_bytes() == out_e.read_bytes()
    indexed.close()
    eager.close()


def test_driver_group_store_matches_eager(setup, tmp_path):
    """The grouped read store (per-rank shard stores dispatched by
    global fragment-id base — the distributed tail's replacement for a
    whole-library index) must reproduce the eager full-parse driver
    byte-for-byte.  Mirrors the production shape: each shard ingested
    independently (local ordinals), bases at the shard boundaries."""
    from defuse_tpu.cluster import native
    tmp, paths, tasks, realigner = setup

    def records(path):
        recs = []
        with open(path) as fh:
            while True:
                h = fh.readline()
                if not h:
                    break
                recs.append(h + fh.readline() + fh.readline()
                            + fh.readline())
        return recs

    r1, r2 = records(str(paths["fastq1"])), records(str(paths["fastq2"]))
    assert len(r1) == len(r2) and len(r1) >= 4
    k = len(r1) // 2
    parts = []
    for p, sl in enumerate((slice(0, k), slice(k, None))):
        d = tmp_path / f"shard{p}"
        d.mkdir()
        (d / "in.1.fastq").write_text("".join(r1[sl]))
        (d / "in.2.fastq").write_text("".join(r2[sl]))
        # shard ingest renumbers to local ordinals, exactly like the
        # per-rank frontend
        assert native.ingest_fastq(str(d / "in.1.fastq"),
                                   str(d / "in.2.fastq"),
                                   str(d / "reads")) is not None
        h = native.reads_index(str(d / "reads" / "reads.1.fastq"),
                               str(d / "reads" / "reads.2.fastq"))
        assert h is not None
        parts.append(h)
    group = native.reads_group(parts, [0, k])
    assert group is not None

    cluster_ids = sorted(tasks)
    flank1s = [tasks[c].split_align_seq[0] for c in cluster_ids]
    flank2s = [tasks[c].split_align_seq[1] for c in cluster_ids]
    grouped = native.RealignDriver(
        str(paths["improper"]), group, realigner.binned, cluster_ids,
        flank1s, flank2s)
    eager = _make_driver(native, paths, tasks, realigner)
    assert grouped.n_candidates == eager.n_candidates

    rg, lg, fg = grouped.read_matrix(64)
    re_, le, fe = eager.read_matrix(64)
    assert (lg == le).all() and (fg == fe).all()
    assert (rg == re_).all()

    out_g = tmp_path / "rows.grouped"
    out_e = tmp_path / "rows.eager"
    grouped.emit(out_g)
    eager.emit(out_e)
    assert out_g.read_bytes() == out_e.read_bytes()
    grouped.close()
    eager.close()


def test_driver_survivors_mask(setup, tmp_path):
    from defuse_tpu.cluster import native
    tmp, paths, tasks, realigner = setup
    candidates, py_text = _python_rows(realigner, str(paths["improper"]))

    driver = _make_driver(native, paths, tasks, realigner)
    B = driver.n_candidates
    reads_p, lens, fidx = driver.read_matrix(64)
    # reads round-trip exactly (incl. revcomp) through the native store
    for i, c in enumerate(candidates[:50]):
        assert bytes(reads_p[i, :lens[i]]).decode() == c.read_seq
        assert fidx[i] == sorted(tasks).index(c.cluster_id)

    # an all-ones mask must reproduce the full output
    out = tmp_path / "rows.mask"
    driver.emit(out, survivors=np.ones(B, dtype=bool))
    assert out.read_text() == py_text

    # masking out every candidate of one cluster drops exactly its rows
    drop = candidates[0].cluster_id
    mask = np.array([c.cluster_id != drop for c in candidates])
    driver.emit(out, survivors=mask)
    expected = "".join(line + "\n"
                       for line in py_text.splitlines()
                       if int(line.split("\t", 1)[0]) != drop)
    assert out.read_text() == expected
    driver.close()


def test_driver_emit_eval_matches_python_chain(setup, tmp_path):
    """dt_driver_emit_eval (emit + numeric sort + breakpoint vote /
    sequence reconstruction in C++) must reproduce the Python
    emit + sort + evaluate_file chain byte-for-byte across all five
    artifacts."""
    from defuse_tpu.align.tasks import evaluate_file
    from defuse_tpu.cluster import native
    tmp, paths, tasks, realigner = setup

    # Python chain
    candidates, py_text = _python_rows(realigner, str(paths["improper"]))
    lines = py_text.splitlines(keepends=True)
    lines.sort(key=lambda l: (int(l.split("\t", 1)[0]), l.encode()))
    py_sorted = "".join(lines)
    (tmp_path / "sorted.py").write_text(py_sorted)
    import io
    seq_o, break_o, pred_o = io.StringIO(), io.StringIO(), io.StringIO()
    evaluate_file(tasks, str(tmp_path / "sorted.py"), seq_o, break_o,
                  pred_o)

    # native chain
    driver = _make_driver(native, paths, tasks, realigner)
    outs = {n: tmp_path / f"nat.{n}" for n in
            ("split", "sorted", "seq", "break", "predalign")}
    total = driver.emit_eval(tasks, sorted(tasks), outs["split"],
                             outs["sorted"], outs["seq"], outs["break"],
                             outs["predalign"])
    driver.close()
    assert total is not None and total == len(lines)
    assert outs["split"].read_text() == py_text
    assert outs["sorted"].read_text() == py_sorted
    assert outs["seq"].read_text() == seq_o.getvalue()
    assert outs["break"].read_text() == break_o.getvalue()
    assert outs["predalign"].read_text() == pred_o.getvalue()


def test_build_fqi_matches_ingest_index(setup, tmp_path):
    """dt_fqi_build (the IO-only offset scan over already-renamed
    fastqs) must emit the exact .fqi bytes dt_fastq_ingest writes, and a
    driver over it must match the eager full-parse driver.  A
    non-renamed library must be refused (rc 2 -> False) so a wrong
    index can never be built."""
    from defuse_tpu.cluster import native
    tmp, paths, tasks, realigner = setup

    ingested = native.ingest_fastq(str(paths["fastq1"]),
                                   str(paths["fastq2"]),
                                   str(tmp_path / "reads"))
    assert ingested is not None
    r1 = tmp_path / "reads" / "reads.1.fastq"
    r2 = tmp_path / "reads" / "reads.2.fastq"
    ingest_fqi = (tmp_path / "reads" / "reads.fqi").read_bytes()

    built = tmp_path / "built.fqi"
    assert native.build_fqi(str(r1), str(r2), str(built))
    assert built.read_bytes() == ingest_fqi

    handle = native.reads_index(str(r1), str(r2), str(built))
    assert handle is not None
    cluster_ids = sorted(tasks)
    indexed = native.RealignDriver(
        str(paths["improper"]), handle, realigner.binned, cluster_ids,
        [tasks[c].split_align_seq[0] for c in cluster_ids],
        [tasks[c].split_align_seq[1] for c in cluster_ids])
    eager = _make_driver(native, paths, tasks, realigner)
    out_i = tmp_path / "rows.fqi_built"
    out_e = tmp_path / "rows.eager2"
    indexed.emit(out_i)
    eager.emit(out_e)
    assert out_i.read_bytes() == out_e.read_bytes()
    indexed.close()
    eager.close()

    # a non-renamed library must be refused
    bad1 = tmp_path / "bad.1.fastq"
    bad1.write_text("@SRR001.7/1\nACGT\n+\nIIII\n")
    assert not native.build_fqi(str(bad1), str(r2),
                                str(tmp_path / "bad.fqi"))
    assert not (tmp_path / "bad.fqi").exists()
