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
