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
    common.add_decode_args(p)
    common.add_dry_run_arg(p)
    p.add_argument(
        "--shard_size", type=int, default=0,
        help="captions per output shard; >0 streams shards with bounded "
        "memory (COCO-scale, ~600k captions — TPU-native equivalent of the "
        "reference's lmdb extractor, `caption/tools/extractor_lmdb.py:20-90`). "
        "0 = single npz (small sets)",
    )
    return p.parse_args(argv)


def _extract_sharded(args, params, cfg, ann, captions, image_for_caption):
    """Bounded-memory streaming extraction: encode chunk -> flush shard.

    Matches `caption/tools/extractor_lmdb.py:46-90` (batch encode + periodic
    commit); output is npz shards + manifest (see data/sharded_embeddings).
    """
    import functools

    import jax
    import jax.numpy as jnp

    from ..data.sharded_embeddings import ShardWriter
    from ..data.transforms import preprocess_many
    from ..models import clip as clip_model
    from ..tokenizer import tokenize as clip_tokenize
    from ..tokenizer_gpt2 import load_gpt2_tokenizer

    tok = load_gpt2_tokenizer(args.opt_vocab, args.opt_merges)
    encode_t = jax.jit(functools.partial(clip_model.encode_text, cfg=cfg))
    encode_i = jax.jit(functools.partial(clip_model.encode_image, cfg=cfg))
    img_cache: dict = {}

    def image_embed(paths):
        missing = [p for p in dict.fromkeys(paths) if p not in img_cache]
        for s in range(0, len(missing), 32):
            batch = missing[s : s + 32]
            imgs = np.stack(preprocess_many(
                [os.path.join(args.images_root, p) for p in batch],
                args.resolution, decode=args.decode, workers=args.decode_workers,
            ))
            feats = np.asarray(encode_i(params, images=jnp.asarray(imgs)))
            for p, f in zip(batch, feats):
                img_cache[p] = f
        out = np.stack([img_cache[p] for p in paths])
        img_cache.clear()  # images don't repeat across chunks (annotation order)
        return out

    base = args.out[:-4] if args.out.endswith(".npz") else args.out
    with ShardWriter(base, shard_size=args.shard_size) as w:
        enc_bs = 256
        for s in range(0, len(captions), args.shard_size):
            caps = captions[s : s + args.shard_size]
            imgs = image_for_caption[s : s + args.shard_size]
            ctoks = clip_tokenize(caps, truncate=True)
            text_emb = np.concatenate(
                [
                    np.asarray(encode_t(params, tokens=jnp.asarray(ctoks[i : i + enc_bs])))
                    for i in range(0, len(caps), enc_bs)
                ],
                axis=0,
            )
            tokens, tmask = tok.batch_encode(caps, pad_to=args.token_len)
            mask = np.concatenate(
                [np.ones((tokens.shape[0], args.prefix_length), np.int32), tmask], axis=1
            )
            chunk = {
                "text_embeddings": text_emb,
                "tokens": tokens,
                "mask": mask,
                "captions": np.array(caps, dtype=object),
                "images": np.array(imgs, dtype=object),
            }
            if args.images_root:
                chunk["image_embeddings"] = image_embed(imgs)
            w.append(chunk)
            print(f"extracted {min(s + args.shard_size, len(captions))}/{len(captions)} captions")
    print(f"wrote {base}.manifest.json: {len(captions)} captions in shards of {args.shard_size}")


def main(argv=None):
    args = get_args(argv)
    if common.finish_dry_run(args):
        return
    common.enable_cache()
    from ..data.transforms import preprocess_many
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

    if args.shard_size > 0:
        return _extract_sharded(args, params, cfg, ann, captions, image_for_caption)

    feats = extract_clip_features(params, cfg, texts=captions)

    if args.images_root:
        def images_iter(batch=32):
            paths = [os.path.join(args.images_root, a["image"]) for a in ann]
            for s0 in range(0, len(paths), batch):
                yield np.stack(preprocess_many(
                    paths[s0 : s0 + batch], args.resolution,
                    decode=args.decode, workers=args.decode_workers,
                ))

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
