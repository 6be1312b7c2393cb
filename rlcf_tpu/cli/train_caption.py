"""Supervised ClipCap/CapDec mapper training (`caption/train.py`).

Trains on precomputed CLIP embeddings (npz produced by
``rlcf_tpu.cli.extract_features`` or converted from the reference pickles).
``--synthetic`` fabricates a tiny dataset for smoke runs.

Example: python -m rlcf_tpu.cli.train_caption --synthetic --epochs 2
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from . import common


def get_args(argv=None):
    p = argparse.ArgumentParser(description="ClipCap/CapDec supervised training (TPU)")
    common.add_run_args(p)
    common.add_model_args(p)
    p.add_argument("--embeddings", default=None, help="npz with text/image embeddings + tokens + mask")
    p.add_argument("--cap_model", default="CapDec", choices=["CapDec", "ClipCap"])
    p.add_argument("--noise_variance", type=float, default=0.016)
    p.add_argument("--normalize_prefix", type=int, default=0)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--train_batch_size", type=int, default=40)
    p.add_argument("--train_lr", type=float, default=2e-5)
    p.add_argument("--warmup_steps", type=int, default=5000)
    p.add_argument("--prefix_length", type=int, default=40)
    p.add_argument("--clip_length", type=int, default=40)
    p.add_argument("--mapping_type", default="transformer", choices=["mlp", "transformer"])
    p.add_argument("--llm", default="opt-125m")
    p.add_argument("--opt_checkpoint", default=None)
    p.add_argument("--resume", default=None, help="ckpt-latest.npz to resume from")
    p.add_argument("--synthetic", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    if common.finish_dry_run(args):
        return
    common.enable_cache()
    import jax
    from ..models import mappers as M
    from ..models import opt as O
    from ..tasks import caption as Cap
    from ..utils.config import save_hparams

    save_hparams(args.output, vars(args), name="hparams_caption_train.json")

    if args.synthetic:
        ocfg = O.OPT_CONFIGS["test-tiny-opt"]
        clip_dim = 16
        mcfg = M.MapperConfig(args.mapping_type, clip_dim=clip_dim, llm_dim=ocfg.embed_dim,
                              prefix_length=4, clip_length=2, num_layers=1, n_heads=2)
        rng = np.random.default_rng(0)
        n = 64
        prefix = rng.normal(size=(n, clip_dim)).astype(np.float32)
        tokens = rng.integers(4, ocfg.vocab_size - 4, size=(n, 8)).astype(np.int32)
        tokens[:, 0] = ocfg.bos_token_id
        mask = np.ones((n, mcfg.prefix_length + 8), np.int32)
    else:
        ocfg = O.OPT_CONFIGS[args.llm]
        from ..data.sharded_embeddings import ShardedEmbeddings, is_sharded

        emb_key = "text_embeddings" if args.cap_model == "CapDec" else "image_embeddings"
        if is_sharded(args.embeddings):
            # COCO-scale sharded store: one shard resident at a time
            sharded = ShardedEmbeddings(args.embeddings)
            clip_dim = sharded.load_shard(0)[emb_key].shape[1]
            prefix = tokens = mask = None
        else:
            sharded = None
            data = np.load(args.embeddings)
            prefix = data[emb_key]
            tokens = data["tokens"].astype(np.int32)
            mask = data["mask"].astype(np.int32)
            clip_dim = prefix.shape[1]
        mcfg = M.MapperConfig(args.mapping_type, clip_dim=clip_dim, llm_dim=ocfg.embed_dim,
                              prefix_length=args.prefix_length, clip_length=args.clip_length)

    ccfg = Cap.CaptionModelConfig(mapper=mcfg, opt=ocfg, normalize_prefix=bool(args.normalize_prefix))
    params = Cap.init_caption_params(jax.random.PRNGKey(args.seed), ccfg)
    if args.opt_checkpoint:
        from ..models.convert import load_torch_file

        params["opt"], _ = O.convert_opt_state_dict(load_torch_file(args.opt_checkpoint))
    start_epoch = 0
    if args.resume and os.path.exists(args.resume):
        params["mapper"], start_epoch = Cap.load_mapper_checkpoint(args.resume, params["mapper"])
        start_epoch += 1

    use_sharded = not args.synthetic and sharded is not None
    n = len(sharded) if use_sharded else prefix.shape[0]
    steps_per_epoch = max(n // args.train_batch_size, 1)
    tcfg = Cap.TrainConfig(
        lr=args.train_lr, warmup_steps=args.warmup_steps,
        total_steps=steps_per_epoch * args.epochs, epochs=args.epochs,
        batch_size=args.train_batch_size, cap_model=args.cap_model,
        noise_variance=args.noise_variance, normalize_prefix=bool(args.normalize_prefix),
    )

    if use_sharded:
        shuffle_rng = np.random.default_rng(args.seed)

        def data_iter():
            for emb, toks, msk in sharded.batches(
                args.train_batch_size, (emb_key, "tokens", "mask"), rng=shuffle_rng
            ):
                yield emb, toks.astype(np.int32), msk.astype(np.int32)

    else:

        # same epoch-shuffle semantics as the sharded branch: the rng
        # advances across data_iter() calls, so every epoch reshuffles
        shuffle_rng = np.random.default_rng(args.seed)

        def data_iter():
            order = shuffle_rng.permutation(n)
            for s in range(0, n - args.train_batch_size + 1, args.train_batch_size):
                idx = order[s : s + args.train_batch_size]
                yield prefix[idx], tokens[idx], mask[idx]

    params, losses = Cap.train_caption_model(
        params, ccfg, tcfg, data_iter, rng=jax.random.PRNGKey(args.seed),
        checkpoint_dir=args.output, start_epoch=start_epoch,
    )
    print("loss_per_epoch_train:", [round(l, 4) for l in losses])
    return losses


if __name__ == "__main__":
    main()
