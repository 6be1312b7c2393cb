"""NoCaps GT converter + per-domain report (`caption/tools/convert_nocaps_gt.py`)."""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(module_file):
    path = os.path.join(REPO, "tools", module_file)
    spec = importlib.util.spec_from_file_location(module_file[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_nocaps(path, counts=(2, 3, 1)):
    domains = ["in-domain", "near-domain", "out-domain"]
    images, anns, img_id, ann_id = [], [], 0, 0
    for dom, n in zip(domains, counts):
        for _ in range(n):
            images.append({"id": img_id, "file_name": f"img_{img_id}.jpg", "domain": dom})
            for k in range(2):
                anns.append({"image_id": img_id, "id": ann_id, "caption": f"caption {img_id} {k}"})
                ann_id += 1
            img_id += 1
    with open(path, "w") as fh:
        json.dump({"images": images, "annotations": anns}, fh)


def test_convert_nocaps_splits(tmp_path):
    src = tmp_path / "nocaps_val_4500_captions.json"
    _fake_nocaps(str(src))
    conv = _load("convert_caption_gt.py")
    written = conv.convert_nocaps_splits(str(src), str(tmp_path))
    names = sorted(os.path.basename(w) for w in written)
    assert names == sorted([
        "nocaps_val_2_in-domain.json", "nocaps_val_2_in-domain_clipscore.json",
        "nocaps_val_3_near-domain.json", "nocaps_val_3_near-domain_clipscore.json",
        "nocaps_val_1_out-domain.json", "nocaps_val_1_out-domain_clipscore.json",
    ])
    ann = json.load(open(tmp_path / "nocaps_val_3_near-domain.json"))
    # coco_format entries drive tta_caption --annotations directly
    assert {"image", "caption", "image_id"} <= set(ann[0])
    assert len(ann) == 3 and len(ann[0]["caption"]) == 2
    refs = json.load(open(tmp_path / "nocaps_val_2_in-domain_clipscore.json"))
    assert refs["img_0.jpg"] == ["caption 0 0", "caption 0 1"]


def test_nocaps_domain_report(tmp_path):
    rep = _load("nocaps_domain_report.py")
    rows = [
        {"clipscore": 0.6, "cider": 0.8, "bleu": [0.5, 0.4, 0.3, 0.2], "n_images": 10},
        {"clipscore": 0.5, "cider": 0.6, "bleu": [0.4, 0.3, 0.2, 0.1], "n_images": 30},
        {"clipscore": 0.4, "cider": 0.4, "bleu": [0.3, 0.2, 0.1, 0.0], "n_images": 10},
    ]
    paths = []
    for i, row in enumerate(rows):
        p = tmp_path / f"m{i}.json"
        json.dump(row, open(p, "w"))
        paths.append(str(p))
    report = rep.merge(paths)
    assert set(report["domains"]) == {"in-domain", "near-domain", "out-domain"}
    # weighted means: clipscore (6+15+4)/50 = 0.5
    assert abs(report["overall"]["clipscore"] - 0.5) < 1e-9
    assert report["overall"]["n_images"] == 50
    assert abs(report["overall"]["bleu"][0] - (5 + 12 + 3) / 50) < 1e-9


def test_nocaps_tools_cli(tmp_path):
    """Both tools run as scripts (the form the .sh files invoke)."""
    src = tmp_path / "nocaps_val_4500_captions.json"
    _fake_nocaps(str(src))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_caption_gt.py"),
         "nocaps-splits", str(src), str(tmp_path)],
        check=True,
    )
    m = tmp_path / "m.json"
    json.dump({"clipscore": 0.5, "n_images": 4}, open(m, "w"))
    out = tmp_path / "merged.json"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "nocaps_domain_report.py"),
         str(m), "--labels", "in-domain", "--out", str(out)],
        check=True,
    )
    assert json.load(open(out))["overall"]["n_images"] == 4
