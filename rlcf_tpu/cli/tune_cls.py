"""RLCF / TPT / KD encoder test-time adaptation (`TPT/tune_cls_rl.py` family).

Tunes the CLIP visual tower per sample (optionally only normalization
affines; BN-prior statistics mixing for ResNet towers), with momentum-EMA
re-anchoring of the episode start point.

Example: python -m rlcf_tpu.cli.tune_cls --test_sets synthetic --limit 4 \
    --arch ViT-B/16 --reward_arch ViT-B/16 --tta_steps 3 --lr 1e-5 --batch_size 16
"""

from __future__ import annotations

import argparse

import numpy as np

from . import common


def get_args(argv=None):
    p = argparse.ArgumentParser(description="RLCF encoder TTA (TPU)")
    common.add_run_args(p)
    common.add_model_args(p)
    common.add_reward_args(p)
    common.add_tta_args(p)
    p.add_argument("--loss", default="rlcf", choices=["rlcf", "tpt", "kd", "dkd", "atkd"])
    p.add_argument("--ctx_prefix", default="a_photo_of_a", help="prompt prefix for class features")
    p.add_argument(
        "--dp", type=int, default=1,
        help="episode data-parallel width: with N>1 devices, episode groups "
        "shard over a dp mesh (visual-tower params replicate; the only "
        "cross-chip traffic is GSPMD's metric gathers)",
    )
    p.add_argument(
        "--remat", default="full", choices=["full", "save_attn", "none"],
        help="visual-tower backward remat policy: full = recompute every "
        "layer (lowest memory), save_attn = keep each block's attention "
        "output for the backward, none = store all activations (OOMs at "
        "64 views x group>1)",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    if common.finish_dry_run(args):
        return
    common.enable_cache()
    import jax
    import jax.numpy as jnp
    from ..core.episode import EpisodeConfig
    from ..data.augment import make_view_generator
    from ..data.class_names import get_classnames
    from ..data.datasets import PrefetchIterator, build_dataset, iter_canonical
    from ..metrics.classification import AccuracyMeter
    from ..tasks.classification import EncoderTTAClassifier
    from ..utils.config import save_hparams
    from ..utils.logging_utils import RunLogger

    logger = RunLogger(args.output)
    save_hparams(args.output, vars(args))
    params, cfg = common.load_policy(args)
    reward = common.build_reward(args)
    kd_map = {"KD": "kd", "DKD": "dkd", "ATKD": "atkd"}
    loss = kd_map[args.kd_loss] if args.loss in ("kd", "dkd", "atkd") else args.loss
    ecfg = EpisodeConfig(
        tta_steps=args.tta_steps, selection_p=args.selection_p, lr=args.lr,
        weight_decay=args.weight_decay, loss=loss, sample_k=args.sample_k,
        min_entropy_reg=bool(args.min_entropy_reg), min_entropy_w=args.min_entropy_w,
    )
    mesh = None
    if args.dp > 1:
        from ..parallel.mesh import make_mesh, round_to_dp

        mesh = make_mesh(n_devices=args.dp, dp=args.dp, tp=1)
        print(f"mesh: {dict(mesh.shape)}")
        rounded = round_to_dp(args.episode_group, mesh)
        if rounded != args.episode_group:
            print(f"NOTE: rounding --episode_group {args.episode_group} -> {rounded} (multiple of dp)")
            args.episode_group = rounded
    clf = EncoderTTAClassifier(
        params, cfg, reward, ecfg,
        prompt_prefix=(args.ctx_prefix or "a photo of a").replace("_", " "),
        only_norm=bool(args.tune_norm),
        momentum_update=bool(args.momentum_update),
        update_freq=args.update_freq, update_w=args.update_w, momentum=args.tta_momentum,
        bn_prior=None if args.prior_strength < 0 else args.prior_strength,
        mesh=mesh,
        remat={"full": True, "save_attn": "save_attn", "none": False}[args.remat],
    )
    gen = make_view_generator(n_views=args.batch_size, resolution=args.resolution, augmix=bool(args.augmix), hard_aug=bool(args.hard_aug))

    results = {}
    for set_id in args.test_sets.split("/"):
        classnames = ["class_%d" % i for i in range(10)] if set_id == "synthetic" else get_classnames(set_id)
        clf.setup(classnames)
        dataset = build_dataset(set_id, args.data, mode=args.dataset_mode, corruption=args.corruption, level=args.level)
        meter = AccuracyMeter()
        group, labels = [], []
        counter = 0
        for img, label in PrefetchIterator(
            iter_canonical(dataset, 256, seed=args.seed, limit=args.limit,
                           workers=args.decode_workers, decode=args.decode)
        ):
            group.append(img)
            labels.append(label)
            if len(group) == args.episode_group:
                keys = jax.random.split(jax.random.PRNGKey(args.seed * 7 + counter), len(group))
                counter += 1
                views = gen(jnp.asarray(np.stack(group)), keys)
                logits, _ = clf.adapt(views)
                meter.update(np.asarray(logits), np.asarray(labels))
                group, labels = [], []
        if group:
            keys = jax.random.split(jax.random.PRNGKey(args.seed * 7 + counter), len(group))
            views = gen(jnp.asarray(np.stack(group)), keys)
            logits, _ = clf.adapt(views)
            meter.update(np.asarray(logits), np.asarray(labels))
        results[set_id] = meter.summary()
        logger.text(f"=> Acc. on testset [{set_id}]: @1 {results[set_id]['top1']} / @5 {results[set_id]['top5']}")
    logger.results_json(results)
    print(results)
    return results


if __name__ == "__main__":
    main()
