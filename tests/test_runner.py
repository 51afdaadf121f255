"""Incremental stage runner semantics (cmdrunner.pm contract):
up-to-date skip, input-change rerun, atomic tmp->rename, failure
cleanup, argv stages, parallel batches."""

import os
import time

import pytest

from defuse_tpu.pipeline.runner import Runner, StageError


def test_uptodate_skip_and_rerun(tmp_path):
    r = Runner(str(tmp_path / "log"))
    src = tmp_path / "in.txt"
    dst = tmp_path / "out.txt"
    src.write_text("v1")
    calls = []

    def stage(tmp_outputs):
        calls.append(1)
        with open(tmp_outputs[0], "w") as fh:
            fh.write(src.read_text().upper())

    assert r.run("s", stage, inputs=[src], outputs=[dst]) is True
    assert dst.read_text() == "V1"
    # second run: outputs newer than inputs -> skipped
    assert r.run("s", stage, inputs=[src], outputs=[dst]) is False
    assert calls == [1]
    # touching the input forces a rerun
    time.sleep(0.01)
    src.write_text("v2")
    os.utime(src)
    assert r.run("s", stage, inputs=[src], outputs=[dst]) is True
    assert dst.read_text() == "V2"


def test_failure_removes_partial_outputs(tmp_path):
    r = Runner(str(tmp_path / "log"))
    dst = tmp_path / "out.txt"

    def bad(tmp_outputs):
        with open(tmp_outputs[0], "w") as fh:
            fh.write("partial")
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        r.run("bad", bad, outputs=[dst])
    assert not dst.exists()
    assert not (tmp_path / "out.txt.tmp").exists()


def test_missing_output_is_stage_error(tmp_path):
    r = Runner(str(tmp_path / "log"))
    with pytest.raises(StageError):
        r.run("noop", lambda tmp_outputs: None,
              outputs=[tmp_path / "never.txt"])


def test_argv_stage_with_tmp_substitution(tmp_path):
    """argv stages get output args swapped for .tmp paths; the runner
    renames them into place on success."""
    r = Runner(str(tmp_path / "log"))
    src = tmp_path / "src.txt"
    src.write_text("payload")
    dst = tmp_path / "copy.txt"
    assert r.run("cp", ["/bin/cp", str(src), str(dst)],
                 inputs=[src], outputs=[dst]) is True
    assert dst.read_text() == "payload"

    with pytest.raises(StageError):
        r.run("false", ["/bin/false", str(tmp_path / "x")],
              outputs=[tmp_path / "x"])


def test_parallel_batch(tmp_path):
    r = Runner(str(tmp_path / "log"), max_parallel=3)
    outs = [tmp_path / f"o{i}" for i in range(4)]

    def make(i):
        def stage(tmp_outputs):
            with open(tmp_outputs[0], "w") as fh:
                fh.write(str(i))
        return stage

    for i, o in enumerate(outs):
        r.padd(f"p{i}", make(i), outputs=[o])
    r.prun()
    assert [o.read_text() for o in outs] == ["0", "1", "2", "3"]
    # batch is consumed
    r.prun()
