"""tools/verify_data.py: manifest verification against fabricated trees."""

import hashlib
import json
import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from tools import verify_data as V  # noqa: E402


def test_missing_everything_fails(tmp_path, capsys):
    rc = V.main(["--data_root", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "MISSING" in out and "coco_karpathy_test.json" in out


def test_karpathy_md5_gate(tmp_path, capsys):
    d = tmp_path / "coco2014"
    d.mkdir()
    # wrong content -> BAD-MD5
    for rel in ("coco_karpathy_train.json", "coco_karpathy_val.json", "coco_karpathy_test.json"):
        (d / rel).write_text("[]")
    rc = V.main(["--data_root", str(tmp_path), "--sets", "coco"])
    out = capsys.readouterr().out
    assert rc == 1 and "BAD-MD5" in out

    # patch the manifest to the fabricated digests -> OK + image-count SHAPE
    digest = hashlib.md5(b"[]").hexdigest()
    old = dict(V.KARPATHY_MD5)
    try:
        for k in V.KARPATHY_MD5:
            V.KARPATHY_MD5[k] = digest
        (d / "val2014").mkdir()
        rc = V.main(["--data_root", str(tmp_path), "--sets", "coco"])
        out = capsys.readouterr().out
        assert "md5 verified" in out
        assert "SHAPE" in out  # 0 jpgs in val2014
        assert rc == 1
    finally:
        V.KARPATHY_MD5.update(old)


def test_classification_shape_checks(tmp_path, capsys):
    root = tmp_path
    a = root / "imagenet-a"
    a.mkdir()
    for i in range(200):
        (a / f"n{i:08d}").mkdir()
    rc = V.main(["--data_root", str(root), "--sets", "A"])
    out = capsys.readouterr().out
    assert rc == 0 and "OK" in out and "[A]" in out

    # wrong class count
    (a / "extra_dir").mkdir()
    rc = V.main(["--data_root", str(root), "--sets", "A"])
    out = capsys.readouterr().out
    assert rc == 1 and "201 class dirs" in out


def test_flickr_parse_and_fine_grained(tmp_path, capsys):
    ann = tmp_path / "flickr30k" / "annotations"
    ann.mkdir(parents=True)
    for split in ("train", "val", "test"):
        (ann / f"flickr30k_{split}.json").write_text(
            json.dumps([{"image": "a.jpg", "caption": ["a dog"]}])
        )
    air = tmp_path / "fgvc_aircraft"
    (air / "images").mkdir(parents=True)
    (air / "variants.txt").write_text("707-320\n")
    rc = V.main(["--data_root", str(tmp_path), "--sets", "flickr30k"])
    out = capsys.readouterr().out
    assert "1 records" in out
    rc = V.main(["--data_root", str(tmp_path), "--sets", "fine"])
    out = capsys.readouterr().out
    assert "[aircraft]" in out and "OK" in out
