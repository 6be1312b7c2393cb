"""Merge per-domain NoCaps metric files into one results table.

The reference reports in/near/out-domain rows separately (its c2n scripts run
one process per domain split, `caption/scripts/tta_clipcap_c2n.sh`; the
dataset carries the domain tags, `caption/image_llm/datasets/coco_cap.py:274`).
This tool joins the three ``clipscore_eval --out_json`` outputs into a single
``results_nocaps.json`` with per-domain rows plus an image-count-weighted
overall row.

Usage:
  python tools/nocaps_domain_report.py \
      exp/c2n_in/metrics.json exp/c2n_near/metrics.json exp/c2n_out/metrics.json \
      --out results_nocaps.json
"""

from __future__ import annotations

import argparse
import json

DOMAINS = ["in-domain", "near-domain", "out-domain"]
NUMERIC = ("clipscore", "ref_clipscore", "meteor", "rouge", "cider")


def merge(paths, labels=None):
    labels = labels or DOMAINS[: len(paths)]
    rows = {}
    for label, path in zip(labels, paths):
        with open(path) as fh:
            rows[label] = json.load(fh)

    total = sum(r.get("n_images", 0) for r in rows.values())
    overall = {}
    if total:
        keys = set().union(*(r.keys() for r in rows.values()))
        for key in keys:
            if key == "bleu":
                per = [r for r in rows.values() if "bleu" in r]
                if len(per) == len(rows):
                    overall["bleu"] = [
                        sum(r["bleu"][i] * r["n_images"] for r in per) / total for i in range(4)
                    ]
            elif key in NUMERIC:
                per = [r for r in rows.values() if key in r]
                if len(per) == len(rows):
                    overall[key] = sum(r[key] * r["n_images"] for r in per) / total
        overall["n_images"] = total
    return {"domains": rows, "overall": overall}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("metrics", nargs="+", help="per-domain metric jsons (in, near, out order)")
    p.add_argument("--labels", nargs="*", default=None)
    p.add_argument("--out", default="results_nocaps.json")
    args = p.parse_args()
    report = merge(args.metrics, args.labels)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    for label, row in report["domains"].items():
        cs = row.get("clipscore")
        cider = row.get("cider")
        print(f"{label}: n={row.get('n_images')} clipscore={cs} cider={cider}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
