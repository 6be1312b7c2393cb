"""One-time NoCaps validation-set fetch (connected environments).

Equivalent of `caption/tools/download_nocaps.py`: downloads the official
``nocaps_val_4500_captions.json`` annotation file and the referenced images
(each entry carries its own ``coco_url``), then splits the annotations into
the per-domain file pairs the c2n scripts consume
(``tools/convert_caption_gt.py nocaps-splits``).

This build environment has zero egress, so — like the GPT-2 BPE assets —
the data is fetched at deployment time rather than bundled.

Usage:
  python tools/download_nocaps.py --dest /data/nocaps [--limit N] [--workers 8]
"""

from __future__ import annotations

import argparse
import json
import os
import urllib.request
from concurrent.futures import ThreadPoolExecutor

ANNOTATIONS_URL = "https://nocaps.s3.amazonaws.com/nocaps_val_4500_captions.json"


def _fetch(url: str, path: str, retries: int = 5) -> bool:
    tmp = path + ".part"
    for attempt in range(retries):
        try:
            req = urllib.request.Request(url, headers={"User-Agent": "Mozilla/5.0"})
            with urllib.request.urlopen(req, timeout=30) as src, open(tmp, "wb") as out:
                out.write(src.read())
            os.replace(tmp, path)  # complete files only; partials never count as done
            return True
        except Exception as e:  # noqa: BLE001 - retry then report
            if attempt == retries - 1:
                print(f"FAILED {url}: {e}")
    if os.path.exists(tmp):
        os.remove(tmp)
    return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dest", default="nocaps")
    p.add_argument("--limit", type=int, default=None, help="cap on images (debug)")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    img_dir = os.path.join(args.dest, "val")
    os.makedirs(img_dir, exist_ok=True)
    ann_path = os.path.join(args.dest, "nocaps_val_4500_captions.json")
    if not os.path.isfile(ann_path):
        print(f"fetching {ANNOTATIONS_URL}")
        if not _fetch(ANNOTATIONS_URL, ann_path):
            raise SystemExit("could not fetch the annotation file")
    with open(ann_path) as fh:
        data = json.load(fh)

    images = data["images"][: args.limit]
    todo = [
        (im["coco_url"], os.path.join(img_dir, im["file_name"]))
        for im in images
        if not os.path.isfile(os.path.join(img_dir, im["file_name"]))
    ]
    print(f"{len(images)} images, {len(todo)} to download")
    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        ok = sum(ex.map(lambda t: _fetch(*t), todo))
    print(f"downloaded {ok}/{len(todo)}")

    # emit the per-domain annotation/reference pairs the c2n scripts consume
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convert_caption_gt", os.path.join(os.path.dirname(os.path.abspath(__file__)), "convert_caption_gt.py")
    )
    conv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(conv)
    conv.convert_nocaps_splits(ann_path, args.dest)


if __name__ == "__main__":
    main()
