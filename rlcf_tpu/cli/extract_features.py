"""CLIP feature pre-extraction for caption training (`caption/extractor_pickle.py`).

Builds the npz the supervised caption trainer consumes: CLIP text (and
optionally image) embeddings for each caption + OPT token ids and masks.

Usage: python -m rlcf_tpu.cli.extract_features --annotations ann.json \
          --images_root imgs/ --opt_vocab vocab.json --opt_merges merges.txt \
          --out embeddings.npz
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from . import common


def get_args(argv=None):
    p = argparse.ArgumentParser(description="CLIP feature extraction (TPU)")
    common.add_model_args(p)
    p.add_argument("--annotations", required=True, help="karpathy-format json")
    p.add_argument("--images_root", default=None, help="if set, also extract image embeddings")
    p.add_argument("--opt_vocab", default=None, help="vocab.json (default: auto-discovered)")
    p.add_argument("--opt_merges", default=None, help="merges.txt (default: auto-discovered)")
    p.add_argument("--prefix_length", type=int, default=40)
    p.add_argument("--token_len", type=int, default=40)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    common.enable_cache()
    from ..data.transforms import preprocess_pil
    from ..tasks.caption import extract_clip_features
    from ..tokenizer_gpt2 import load_gpt2_tokenizer

    params, cfg = common.load_policy(args)
    with open(args.annotations) as fh:
        ann = json.load(fh)[: args.limit]

    captions, image_for_caption = [], []
    for a in ann:
        caps = a["caption"] if isinstance(a["caption"], list) else [a["caption"]]
        for c in caps:
            captions.append(c)
            image_for_caption.append(a["image"])

    feats = extract_clip_features(params, cfg, texts=captions)

    if args.images_root:
        def images_iter(batch=32):
            buf = []
            for a in ann:
                buf.append(preprocess_pil(os.path.join(args.images_root, a["image"]), args.resolution))
                if len(buf) == batch:
                    yield np.stack(buf)
                    buf = []
            if buf:
                yield np.stack(buf)

        img_out = extract_clip_features(params, cfg, images_iter=images_iter())
        image_index = {a["image"]: i for i, a in enumerate(ann)}
        per_caption_img = np.stack([img_out["image_embeddings"][image_index[p]] for p in image_for_caption])
        feats["image_embeddings"] = per_caption_img

    tok = load_gpt2_tokenizer(args.opt_vocab, args.opt_merges)
    tokens, tmask = tok.batch_encode(captions, pad_to=args.token_len)
    mask = np.concatenate([np.ones((tokens.shape[0], args.prefix_length), np.int32), tmask], axis=1)
    np.savez(
        args.out,
        tokens=tokens,
        mask=mask,
        captions=np.array(captions, dtype=object),
        images=np.array(image_for_caption, dtype=object),
        **{k: v for k, v in feats.items()},
    )
    print(f"wrote {args.out}: {tokens.shape[0]} captions")


if __name__ == "__main__":
    main()
