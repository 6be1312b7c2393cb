"""Export the fused prompt-TTA episode as an AOT serving artifact.

TPU-native deployment path (no reference equivalent — the reference serves by
re-running its Python loop): lowers the full episode (frozen towers + scan)
to portable StableHLO via jax.export. The artifact takes weights as call
arguments, so one export serves any checkpoint of the same architecture.

Example: python -m rlcf_tpu.cli.export_serving --test_sets A \
    --arch ViT-B/16 --reward_arch ViT-L/14 --batch_size 64 \
    --episode_group 4 --out /tmp/episode.rlcfx
"""

from __future__ import annotations

import argparse

from . import common


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Export TTA episode for serving (StableHLO)")
    common.add_run_args(p)
    common.add_model_args(p)
    common.add_reward_args(p)
    common.add_tta_args(p)
    p.add_argument("--out", required=True, help="output artifact path (.rlcfx)")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets, e.g. 'tpu' or 'tpu,cpu' (default: current backend)")
    p.add_argument("--views_dtype", default="float32", choices=["float32", "uint8"],
                   help="serving view input dtype (uint8 = raw pixels, normalized in-graph)")
    p.add_argument("--input", default="images", choices=["images", "tokens"],
                   help="'tokens' exports the patch-major hot path (u8 policy tokens in, "
                   "reward depatchified in-graph; ViT policies only)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    if common.finish_dry_run(args):
        return
    common.enable_cache()
    import jax.numpy as jnp

    from ..core.episode import EpisodeConfig
    from ..data.class_names import get_classnames
    from ..tasks.classification import PromptTTAClassifier
    from ..utils.export import export_serving, save_exported

    params, cfg = common.load_policy(args)
    reward = common.build_reward(args)
    ecfg = EpisodeConfig(
        tta_steps=args.tta_steps, selection_p=args.selection_p, lr=args.lr,
        weight_decay=args.weight_decay, sample_k=args.sample_k, loss=getattr(args, "loss", "rlcf"),
    )
    set_id = args.test_sets.split("/")[0]
    classnames = ["class_%d" % i for i in range(10)] if set_id == "synthetic" else get_classnames(set_id)
    clf = PromptTTAClassifier(params, cfg, reward, ecfg, ctx_init=args.ctx_init or "a photo of a").setup(classnames)

    platforms = args.platforms.split(",") if args.platforms else None
    if args.input == "tokens":
        if not cfg.is_vit:
            raise SystemExit("--input tokens requires a ViT policy (ResNets keep the image input)")
        if args.views_dtype != "float32":
            print("NOTE: --views_dtype is ignored with --input tokens (tokens are always uint8)")
        p_sz = cfg.vision_patch_size
        if args.resolution % p_sz:
            raise SystemExit(f"--input tokens needs resolution % patch == 0 ({args.resolution} vs {p_sz})")
        shape = (args.episode_group, args.batch_size, (args.resolution // p_sz) ** 2, p_sz * p_sz * 3)
        blob = export_serving(clf.serving_fn_tokens(), clf.serving_example_args_tokens(shape), platforms=platforms)
        desc = f"policy tokens {shape} uint8"
    else:
        shape = (args.episode_group, args.batch_size, args.resolution, args.resolution, 3)
        dtype = jnp.uint8 if args.views_dtype == "uint8" else jnp.float32
        blob = export_serving(clf.serving_fn(), clf.serving_example_args(shape, views_dtype=dtype), platforms=platforms)
        desc = f"views {shape} {args.views_dtype}"
    save_exported(args.out, blob)
    print(f"exported fused episode ({len(classnames)} classes, {desc}) "
          f"-> {args.out} ({len(blob)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
