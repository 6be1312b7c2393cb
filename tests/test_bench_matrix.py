"""tools/bench_matrix.py CLI behavior (the per-pipeline regression surface).

The benches themselves run on the real chip (PERF_r03.json); here we pin the
argument handling that routes them — a typo'd --only silently benching
nothing is how a "refreshed" record turns out to be stale.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import bench_matrix


def test_only_unknown_pipeline_is_an_error(capsys):
    with pytest.raises(SystemExit):
        bench_matrix.main(["--only", "encoder", "--out", "/tmp/bm_should_not_exist.json"])
    err = capsys.readouterr().err
    assert "unknown pipeline" in err and "encoder_tta" in err
    assert not os.path.exists("/tmp/bm_should_not_exist.json")


def test_only_merge_keeps_other_records(tmp_path, monkeypatch):
    out = tmp_path / "matrix.json"
    out.write_text(json.dumps({
        "records": [
            {"pipeline": "prompt_tta", "ms_per_unit": 50.0},
            {"pipeline": "caption_tta", "ms_per_unit": 600.0},
        ],
        "quick": False,
        "note": "keep me",
    }))
    monkeypatch.setitem(
        bench_matrix.__dict__, "bench_caption_tta",
        lambda quick=False, **kw: {"pipeline": "caption_tta", "ms_per_unit": 123.0},
    )
    # avoid touching jax config in-test
    import rlcf_tpu.utils.runtime as rt
    monkeypatch.setattr(rt, "enable_compilation_cache", lambda *a, **k: None)
    bench_matrix.main(["--only", "caption_tta", "--out", str(out)])
    got = json.loads(out.read_text())
    recs = {r["pipeline"]: r for r in got["records"]}
    assert recs["prompt_tta"]["ms_per_unit"] == 50.0  # untouched record survives
    assert recs["caption_tta"]["ms_per_unit"] == 123.0  # refreshed in place
    assert got["note"] == "keep me"


def test_short_error_keeps_oom_headline():
    dump = "RESOURCE_EXHAUSTED: XLA:TPU compile permanent error.\n" \
           "Ran out of memory in memory space hbm. Used 25.23G of 15.75G hbm.\n" + \
           "buffer table line\n" * 500
    msg = bench_matrix._short_error(RuntimeError(dump))
    assert "Used 25.23G of 15.75G hbm" in msg
    assert len(msg) <= 300


def test_retrieval_sweep_survives_group_oom(monkeypatch):
    """A forced OOM at one group size must not erase the groups that already
    measured (VERDICT r4 weak #1: the harness threw away 8/16 when 32 blew)."""

    class FakeTTA:
        gallery_feats = __import__("numpy").zeros((4, 8), dtype="float32")

        def __init__(self, *a, **kw):
            pass

        def set_text_gallery(self, texts):
            return self

        def hbm_group_cap(self):
            return 20  # 32 skipped up front

        def adapt_queries(self, queries):
            if len(queries) >= 16:  # 16 passes the cap but "OOMs"
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED\nRan out of memory. Used 25.2G of 15.7G hbm.\n"
                    + "x" * 5000
                )
            import numpy as np

            return np.zeros((len(queries), 4), dtype="float32")

    import rlcf_tpu.tasks.retrieval as R

    monkeypatch.setattr(R, "RetrievalTTA", FakeTTA)
    rec = bench_matrix.bench_retrieval("i2t", quick=False)
    assert rec["group_sweep_ms_per_query"].keys() == {8}
    assert rec["best_group"] == 8
    assert "Used 25.2G of 15.7G hbm" in rec["groups_skipped"][16]
    assert len(rec["groups_skipped"][16]) <= 300
    assert rec["groups_skipped"][32] == "over HBM group cap 20"
    assert rec["hbm_group_cap"] == 20
