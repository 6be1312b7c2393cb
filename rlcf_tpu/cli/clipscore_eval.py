"""CLIPScore / RefCLIPScore CLI (`clipscore/clipscore.py:220-285`).

Usage: python -m rlcf_tpu.cli.clipscore_eval candidates.json image_dir \
          [--references_json refs.json] [--compute_other_ref_metrics 1]

candidates.json: {image_id: caption}; references: {image_id: [refs...]}.
Image files resolve as ``image_dir/image_id`` with common extensions.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="CLIPScore evaluation (TPU)")
    p.add_argument("candidates_json")
    p.add_argument("image_dir")
    p.add_argument("--references_json", default=None)
    p.add_argument("--compute_other_ref_metrics", type=int, default=1)
    p.add_argument("--save_per_instance", default=None)
    p.add_argument("--out_json", default=None, help="write the metric summary as json")
    p.add_argument("--arch", default="ViT-B/32")
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--resolution", type=int, default=224)
    p.add_argument("--precision", default="fp32")
    from . import common

    common.add_decode_args(p)
    common.add_dry_run_arg(p)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--download_nltk", type=int, default=0,
                   help="fetch the wordnet corpus (nltk.download) before scoring "
                        "so METEOR runs exact/stem/synonym instead of degraded")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from . import common

    if common.finish_dry_run(args):
        return
    from ..data.transforms import preprocess_many
    from ..metrics.caption_metrics import get_all_metrics
    from ..metrics.clipscore import evaluate_captions

    common.enable_cache()
    params, cfg = common.load_policy(args)

    with open(args.candidates_json) as fh:
        candidates = json.load(fh)
    image_ids = list(candidates.keys())

    def resolve(image_id):
        base = os.path.join(args.image_dir, image_id)
        for cand in (base, base + ".jpg", base + ".png", base + ".jpeg"):
            if os.path.exists(cand):
                return cand
        raise FileNotFoundError(base)

    def images_iter(batch=32):
        paths = [resolve(i) for i in image_ids]
        for s0 in range(0, len(paths), batch):
            yield np.stack(preprocess_many(
                paths[s0 : s0 + batch], args.resolution,
                decode=args.decode, workers=args.decode_workers,
            ))

    references = None
    if args.references_json:
        with open(args.references_json) as fh:
            references = json.load(fh)
        references = {i: (r if isinstance(r, list) else [r]) for i, r in references.items()}

    out = evaluate_captions(params, cfg, candidates, images_iter, image_ids, references)
    if args.download_nltk:
        from ..metrics.caption_metrics import ensure_wordnet

        print(f"METEOR mode after wordnet fetch: {ensure_wordnet()}")
    if references and args.compute_other_ref_metrics:
        refs = [references[i] for i in image_ids]
        cands = [candidates[i] for i in image_ids]
        other = get_all_metrics(refs, cands)
        for b, sc in enumerate(other["bleu"]):
            print(f"BLEU-{b+1}: {sc*100:.2f}")
        for key in ("meteor", "rouge", "cider"):
            print(f"{key.upper()}: {other[key]*100:.2f}")
        if other.get("meteor_mode") != "nltk_wordnet":
            print(f"METEOR mode: {other['meteor_mode']} (degraded — not pycocoevalcap-comparable)")
        out.update({k: v for k, v in other.items()})
    print(f"CLIPScore: {out['clipscore']*100:.2f}")
    if "ref_clipscore" in out:
        print(f"RefCLIPScore: {out['ref_clipscore']*100:.2f}")
    if args.save_per_instance:
        with open(args.save_per_instance, "w") as fh:
            json.dump(out["per_instance"], fh)
    if args.out_json:
        summary = {k: v for k, v in out.items() if k != "per_instance"}
        summary["n_images"] = len(image_ids)
        with open(args.out_json, "w") as fh:
            json.dump(summary, fh, indent=2)
    return out


if __name__ == "__main__":
    main()
