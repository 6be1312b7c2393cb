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


def convert_nocaps_splits(src: str, out_dir: str | None = None):
    """Split the official nocaps val annotations into the three per-domain
    file pairs the c2n scripts consume (`caption/tools/convert_nocaps_gt.py`):

    - ``nocaps_val_{n}_{domain}.json``: coco_format list of
      ``{image, caption: [refs...], image_id}`` entries (drives
      ``tta_caption --annotations``),
    - ``nocaps_val_{n}_{domain}_clipscore.json``: ``{file_name: [refs...]}``
      (drives ``clipscore_eval --references_json``).

    File names carry the domain image count, reproducing the reference's
    ``val_417_in-domain`` / ``val_2670_near-domain`` / ``val_1413_out-domain``.
    """
    import os

    with open(src) as fh:
        data = json.load(fh)
    out_dir = out_dir or os.path.dirname(os.path.abspath(src))

    caps: dict = {}
    for ann in data["annotations"]:
        caps.setdefault(ann["image_id"], []).append(ann["caption"])

    coco_format: dict = {}
    clipscore_format: dict = {}
    for im in data["images"]:
        dom = im["domain"]
        coco_format.setdefault(dom, []).append(
            {"image": im["file_name"], "caption": caps[im["id"]], "image_id": im["id"]}
        )
        clipscore_format.setdefault(dom, {})[im["file_name"]] = caps[im["id"]]

    written = []
    for dom, items in coco_format.items():
        n = len(items)
        ann_path = os.path.join(out_dir, f"nocaps_val_{n}_{dom}.json")
        ref_path = os.path.join(out_dir, f"nocaps_val_{n}_{dom}_clipscore.json")
        with open(ann_path, "w") as fh:
            json.dump(items, fh)
        with open(ref_path, "w") as fh:
            json.dump(clipscore_format[dom], fh)
        print(f"wrote {ann_path} ({n} images) + clipscore refs")
        written.extend([ann_path, ref_path])
    return written


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["karpathy", "nocaps", "nocaps-splits"])
    p.add_argument("src")
    p.add_argument("dst", nargs="?", default=None, help="output file (or dir for nocaps-splits)")
    p.add_argument("--split", default="test")
    p.add_argument("--domain", default=None, help="nocaps: in-domain/near-domain/out-domain")
    args = p.parse_args()
    if args.kind == "karpathy":
        convert_karpathy(args.src, args.dst, args.split)
    elif args.kind == "nocaps-splits":
        convert_nocaps_splits(args.src, args.dst)
    else:
        convert_nocaps(args.src, args.dst, args.domain)


if __name__ == "__main__":
    main()
