"""Dev-only: extract public class-name/template metadata into a JSON asset.

The lists (ImageNet class names, the 80 CLIP prompt templates, OOD-variant
label masks, fine-grained dataset class names) are public factual metadata from
the CLIP/TPT lineage; they are stored as package data rather than code.

Usage: python tools/gen_class_metadata.py
"""

import json
import os
import sys

REFERENCE = "/root/reference/TPT"
OUT = os.path.join(os.path.dirname(__file__), "..", "rlcf_tpu", "assets", "class_metadata.json")


def main():
    if not os.path.isdir(REFERENCE):
        raise SystemExit("reference checkout not found; asset regeneration unavailable")
    sys.path.insert(0, REFERENCE)
    from data.imagnet_prompts import imagenet_classes, imagenet_templates
    from data import imagenet_variants as v
    from data import cls_to_names as c

    fine_grained = {}
    for name in ("flower102", "dtd", "pets", "cars", "ucf101", "caltech101", "food101", "sun397", "aircraft", "eurosat"):
        fine_grained[name] = list(getattr(c, f"{name}_classes"))

    meta = {
        "imagenet_classes": list(imagenet_classes),
        "imagenet_templates": list(imagenet_templates),
        "imagenet_a_mask": list(v.imagenet_a_mask),       # 200 class indices
        "imagenet_r_mask": list(v.imagenet_r_mask),       # 1000 booleans
        "imagenet_v_mask": list(v.imagenet_v_mask),       # 1000 indices (identity order)
        "fine_grained": fine_grained,
    }
    with open(OUT, "w") as fh:
        json.dump(meta, fh)
    print(f"wrote {OUT} ({os.path.getsize(OUT)//1024} KiB)")


if __name__ == "__main__":
    main()
