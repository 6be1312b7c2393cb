"""Ground-truth reference converters (`caption/tools/convert_dataset_gt.py`,
`convert_nocaps_gt.py`): turn karpathy/nocaps annotation files into the
{image_id: [references...]} json that `rlcf_tpu.cli.clipscore_eval` consumes.

Usage:
  python tools/convert_caption_gt.py karpathy dataset_coco.json refs.json --split test
  python tools/convert_caption_gt.py nocaps nocaps_val.json refs.json
"""

from __future__ import annotations

import argparse
import json


def convert_karpathy(src: str, dst: str, split: str = "test"):
    with open(src) as fh:
        data = json.load(fh)
    out = {}
    for img in data["images"]:
        if img.get("split") != split:
            continue
        key = img.get("filename") or str(img["imgid"])
        out[key] = [s["raw"].strip() for s in img["sentences"]]
    with open(dst, "w") as fh:
        json.dump(out, fh)
    print(f"wrote {dst}: {len(out)} images")


def convert_nocaps(src: str, dst: str, domain: str | None = None):
    with open(src) as fh:
        data = json.load(fh)
    images = {im["id"]: im for im in data["images"]}
    out: dict = {}
    for ann in data["annotations"]:
        im = images[ann["image_id"]]
        if domain and im.get("domain") != domain:
            continue
        out.setdefault(im["file_name"], []).append(ann["caption"].strip())
    with open(dst, "w") as fh:
        json.dump(out, fh)
    print(f"wrote {dst}: {len(out)} images")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["karpathy", "nocaps"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--split", default="test")
    p.add_argument("--domain", default=None, help="nocaps: in-domain/near-domain/out-domain")
    args = p.parse_args()
    if args.kind == "karpathy":
        convert_karpathy(args.src, args.dst, args.split)
    else:
        convert_nocaps(args.src, args.dst, args.domain)


if __name__ == "__main__":
    main()
