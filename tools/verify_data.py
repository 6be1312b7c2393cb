"""Dataset manifest verifier: tell a first real run exactly what is missing.

The reference's LAVIS builders verify annotation md5s before use
(`retrieval/lavis/datasets/builders/base_dataset_builder.py:23-230`;
checksums from `retrieval/lavis/configs/datasets/coco/defaults_ret.yaml:19-30`
— the same three karpathy jsons back both the retrieval and caption
pipelines). The classification datasets (`TPT/data/datautils.py:22-72`) have
no published checksums, so they are verified structurally: expected directory
layout, class-directory counts, and marker files.

Usage:
    python tools/verify_data.py --data_root /path/to/datasets \
        [--sets A,R,V,I,K,coco,flickr30k,nocaps,fine] [--deep]

Prints one line per check (OK / MISSING / BAD-MD5 / SHAPE) and exits 1 if
anything required is missing or corrupt. ``--deep`` also md5s image archives
where a checksum is known (slow).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

# LAVIS-published annotation checksums (`defaults_ret.yaml` / `defaults_cap.yaml`)
KARPATHY_MD5 = {
    "coco2014/coco_karpathy_train.json": "aa31ac474cf6250ebb81d18348a07ed8",
    "coco2014/coco_karpathy_val.json": "b273847456ef5580e33713b1f7de52a0",
    "coco2014/coco_karpathy_test.json": "3ff34b0ef2db02d01c37399f6a2a6cd1",
}

# Flickr30k annotations ship without md5s in LAVIS; verify presence + parse.
FLICKR_ANN = [
    "flickr30k/annotations/flickr30k_train.json",
    "flickr30k/annotations/flickr30k_val.json",
    "flickr30k/annotations/flickr30k_test.json",
]

# Classification layouts (`TPT/data/datautils.py:22-39`): directory name,
# expected number of class subdirectories (0 = unchecked), marker subpath.
CLS_LAYOUTS = {
    "I": ("ImageNet/val", 1000, None),
    "A": ("imagenet-a", 200, None),
    "R": ("imagenet-r", 200, None),
    "K": ("ImageNet-Sketch", 1000, None),
    "V": ("imagenetv2-matched-frequency-format-val", 1000, None),
    "C": ("imagenet-c", 0, "gaussian_noise/5"),
}

# Fine-grained sets: (image subdir, Zhou split json) — see data/datasets.py
FINE_SPLITS = {
    "flower102": ("oxford_flowers", "jpg", "split_zhou_OxfordFlowers.json"),
    "food101": ("food-101", "images", "split_zhou_Food101.json"),
    "dtd": ("dtd", "images", "split_zhou_DescribableTextures.json"),
    "pets": ("oxford_pets", "images", "split_zhou_OxfordPets.json"),
    "sun397": ("sun397", "SUN397", "split_zhou_SUN397.json"),
    "caltech101": ("caltech-101", "101_ObjectCategories", "split_zhou_Caltech101.json"),
    "ucf101": ("ucf101", "UCF-101-midframes", "split_zhou_UCF101.json"),
    "cars": ("stanford_cars", "cars_test", "split_zhou_StanfordCars.json"),
    "eurosat": ("eurosat", "2750", "split_zhou_EuroSAT.json"),
    "aircraft": ("fgvc_aircraft", "images", "variants.txt"),
}


def _md5(path, chunk=1 << 20):
    h = hashlib.md5()
    with open(path, "rb") as fh:
        for b in iter(lambda: fh.read(chunk), b""):
            h.update(b)
    return h.hexdigest()


class Report:
    def __init__(self):
        self.failures = 0

    def ok(self, what, detail=""):
        print(f"OK       {what}" + (f"  ({detail})" if detail else ""))

    def fail(self, kind, what, detail=""):
        self.failures += 1
        print(f"{kind:<8} {what}" + (f"  ({detail})" if detail else ""))


def check_karpathy(root, rep: Report):
    for rel, want in KARPATHY_MD5.items():
        path = os.path.join(root, rel)
        if not os.path.isfile(path):
            rep.fail("MISSING", rel, "download: https://storage.googleapis.com/sfr-vision-language-research/datasets/" + os.path.basename(rel))
            continue
        got = _md5(path)
        if got != want:
            rep.fail("BAD-MD5", rel, f"{got} != {want}")
        else:
            rep.ok(rel, "md5 verified")
    img_dir = os.path.join(root, "coco2014")
    for sub in ("val2014",):
        d = os.path.join(img_dir, sub)
        if not os.path.isdir(d):
            rep.fail("MISSING", f"coco2014/{sub}/", "COCO 2014 images")
        else:
            n = sum(1 for f in os.listdir(d) if f.endswith(".jpg"))
            (rep.ok if n >= 40000 else lambda *a: rep.fail("SHAPE", *a))(
                f"coco2014/{sub}/", f"{n} jpgs (expect ~40504)"
            )


def check_flickr(root, rep: Report):
    for rel in FLICKR_ANN:
        path = os.path.join(root, rel)
        if not os.path.isfile(path):
            rep.fail("MISSING", rel)
            continue
        try:
            with open(path) as fh:
                ann = json.load(fh)
            assert isinstance(ann, list) and "image" in ann[0] and "caption" in ann[0]
            rep.ok(rel, f"{len(ann)} records")
        except Exception as e:
            rep.fail("SHAPE", rel, f"unparseable karpathy json: {e}")
    d = os.path.join(root, "flickr30k")
    if not os.path.isdir(d):
        rep.fail("MISSING", "flickr30k/ image root")


def check_nocaps(root, rep: Report):
    ann = os.path.join(root, "nocaps", "nocaps_val_4500_captions.json")
    if not os.path.isfile(ann):
        rep.fail("MISSING", "nocaps/nocaps_val_4500_captions.json",
                 "fetch with tools/fetch_nocaps.py (or nocaps.org)")
        return
    try:
        with open(ann) as fh:
            data = json.load(fh)
        n = len(data.get("images", []))
        (rep.ok if n == 4500 else lambda *a: rep.fail("SHAPE", *a))(
            "nocaps annotations", f"{n} images (expect 4500)"
        )
    except Exception as e:
        rep.fail("SHAPE", "nocaps annotations", str(e))


def check_classification(root, rep: Report, sets):
    for sid in sets:
        if sid not in CLS_LAYOUTS:
            continue
        rel, n_classes, marker = CLS_LAYOUTS[sid]
        d = os.path.join(root, rel)
        if not os.path.isdir(d):
            rep.fail("MISSING", f"[{sid}] {rel}/")
            continue
        if marker and not os.path.isdir(os.path.join(d, marker)):
            rep.fail("SHAPE", f"[{sid}] {rel}/{marker}/", "corruption/level subdirs expected")
            continue
        if n_classes:
            n = sum(1 for e in os.listdir(d) if os.path.isdir(os.path.join(d, e)))
            if n != n_classes:
                rep.fail("SHAPE", f"[{sid}] {rel}/", f"{n} class dirs (expect {n_classes})")
                continue
        rep.ok(f"[{sid}] {rel}/")


def check_fine_grained(root, rep: Report):
    for sid, (dirname, subdir, split) in FINE_SPLITS.items():
        base = os.path.join(root, dirname)
        if not os.path.isdir(base):
            rep.fail("MISSING", f"[{sid}] {dirname}/")
            continue
        missing = [p for p in (subdir, split) if not os.path.exists(os.path.join(base, p))]
        if missing:
            rep.fail("SHAPE", f"[{sid}] {dirname}/", f"missing {missing}")
        else:
            rep.ok(f"[{sid}] {dirname}/")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--sets", default="A,R,V,I,K,C,coco,flickr30k,nocaps,fine",
                    help="comma-separated subset of A,R,V,I,K,C,coco,flickr30k,nocaps,fine")
    args = ap.parse_args(argv)
    sets = set(args.sets.split(","))
    rep = Report()
    root = args.data_root

    if "coco" in sets:
        check_karpathy(root, rep)
    if "flickr30k" in sets:
        check_flickr(root, rep)
    if "nocaps" in sets:
        check_nocaps(root, rep)
    check_classification(root, rep, sets)
    if "fine" in sets:
        check_fine_grained(root, rep)

    if rep.failures:
        print(f"\n{rep.failures} problem(s) found", file=sys.stderr)
        return 1
    print("\nall requested datasets verified")
    return 0


if __name__ == "__main__":
    sys.exit(main())
