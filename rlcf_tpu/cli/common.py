"""Shared CLI plumbing: argument surface and model/reward construction.

The flag surface mirrors the reference parsers (`TPT/params.py:13-98`,
`retrieval/params.py:7-57`, `caption/image_llm/params.py:8-110`) so reference
users can carry their scripts over; checkpoint paths are optional — without
them models are randomly initialized (this environment has no checkpoint
egress) with a loud warning, which still exercises the full pipelines.
"""

from __future__ import annotations

import argparse
import os
import sys


def add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--arch", "-a", default="ViT-B/16", help="policy CLIP architecture")
    p.add_argument("--clip_checkpoint", default=None, help="OpenAI CLIP .pt for the policy")
    p.add_argument("--resolution", default=224, type=int)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument(
        "--verify_checkpoint", type=int, default=1,
        help="check --clip_checkpoint's SHA256 against the published OpenAI "
        "digest for --arch before loading (`TPT/clip/clip.py:53-70`); "
        "fine-tuned checkpoints skip the check automatically (unknown digest "
        "is only an error when the file claims to be a stock arch). 0 = off",
    )
    p.add_argument(
        "--download", type=int, default=0,
        help="auto-download missing stock OpenAI checkpoints (policy + reward) "
        "to $RLCF_CHECKPOINT_DIR (default ~/.cache/rlcf_tpu/clip), SHA256-"
        "verified (`TPT/clip/clip.py:42-70`); refuses loudly without egress",
    )


def add_reward_args(p: argparse.ArgumentParser):
    p.add_argument("--reward_arch", default="ViT-L/14")
    p.add_argument("--reward_checkpoint", default=None)
    p.add_argument("--multiple_reward_models", type=int, default=0)
    p.add_argument("--reward_checkpoints", nargs="*", default=None, help="ckpts for the ensemble archs")
    p.add_argument("--sample_k", type=int, default=5)
    p.add_argument("--reward_process", type=int, default=1)
    p.add_argument("--process_batch", type=int, default=0)
    p.add_argument("--reward_amplify", type=int, default=0)
    p.add_argument("--weighted_scores", type=int, default=1)


def add_tta_args(p: argparse.ArgumentParser):
    p.add_argument("--tta_steps", type=int, default=1)
    p.add_argument("--selection_p", type=float, default=0.1)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--batch_size", type=int, default=64, help="views per sample (1 base + N-1 augmented)")
    p.add_argument("--n_ctx", type=int, default=4)
    p.add_argument("--ctx_init", default=None, type=str)
    p.add_argument("--load", default=None, type=str, help="pretrained CoOp prompt checkpoint")
    p.add_argument("--augmix", type=int, default=1)
    p.add_argument("--hard_aug", type=int, default=0)
    p.add_argument("--min_entropy_reg", type=int, default=0)
    p.add_argument("--min_entropy_w", type=float, default=0.1)
    p.add_argument("--momentum_update", type=int, default=0)
    p.add_argument("--update_freq", type=int, default=256)
    p.add_argument("--update_w", type=float, default=1.0)
    p.add_argument("--tta_momentum", type=float, default=0.9999)
    p.add_argument("--tune_norm", type=int, default=0)
    p.add_argument("--prior_strength", type=float, default=-1)
    p.add_argument("--kd_loss", default="KD", choices=["KD", "DKD", "ATKD"])
    p.add_argument("--episode_group", type=int, default=4, help="episodes run in parallel per device batch")


def add_run_args(p: argparse.ArgumentParser):
    p.add_argument("data", metavar="DIR", nargs="?", default=".", help="dataset root")
    p.add_argument("--test_sets", default="A", help="slash-separated dataset ids; 'synthetic' works without data")
    p.add_argument("--dataset_mode", default="test")
    p.add_argument("--output", default="exp_01")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=None, help="cap on evaluated samples")
    p.add_argument("--print_freq", "-p", type=int, default=500)
    p.add_argument("--corruption", default="defocus_blur")
    p.add_argument("--level", default="5")
    add_decode_args(p)
    add_dry_run_arg(p)


def add_dry_run_arg(p: argparse.ArgumentParser):
    p.add_argument(
        "--dry_run", action="store_true",
        help="validate the full command line (flags, choices, config "
        "resolution) and exit before loading checkpoints or data — the "
        "RUNBOOK pre-flight so a first connected run can't die on a typo",
    )


def finish_dry_run(args) -> bool:
    """If --dry_run was passed, print the resolved config and signal the
    CLI to return (placed after each CLI's cheap arg fixups, before any
    checkpoint/dataset/model work)."""
    if not getattr(args, "dry_run", False):
        return False
    import json as _json

    print("DRY RUN OK: " + _json.dumps(
        {k: v for k, v in sorted(vars(args).items())}, default=str))
    return True


def add_decode_args(p: argparse.ArgumentParser):
    p.add_argument(
        "--decode", default="pil", choices=["pil", "native"],
        help="image loader: 'native' = threaded C++ JPEG/PNG decode + canonicalize "
        "(bit-identical decode, resize within ~±2 gray of PIL on ~0.03%% of pixels); "
        "'pil' preserves exact PIL preprocessing",
    )
    p.add_argument(
        "--decode_workers", type=int, default=0,
        help="decode threads for --decode native (0 = auto: min(8, cpus))",
    )


def load_policy(args):
    import jax
    import jax.numpy as jnp
    from ..models import clip as clip_model
    from ..models.convert import load_clip_checkpoint

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    if not args.clip_checkpoint and getattr(args, "download", 0):
        from ..models.convert import download_checkpoint

        args.clip_checkpoint = download_checkpoint(args.arch)
    if args.clip_checkpoint and os.path.exists(args.clip_checkpoint):
        from ..models.convert import CLIP_CHECKPOINT_SHA256, check_checkpoint_digest

        # Integrity gate (`TPT/clip/clip.py:53-70`): a file matching a
        # *different* stock release fails loudly (wrong download); an unknown
        # digest is allowed with a note (fine-tuned/converted checkpoints).
        if getattr(args, "verify_checkpoint", 1) and args.arch in CLIP_CHECKPOINT_SHA256:
            status, detail = check_checkpoint_digest(args.clip_checkpoint, args.arch)
            if status == "wrong-arch":
                raise RuntimeError(
                    f"{args.clip_checkpoint} is the stock OpenAI {detail} checkpoint, "
                    f"not {args.arch}; pass the right file or --verify_checkpoint 0"
                )
            if status == "unknown":
                print(
                    f"NOTE: {args.clip_checkpoint} is not a stock OpenAI release "
                    f"(sha256 {detail[:12]}…); loading as a fine-tuned/converted {args.arch}",
                    file=sys.stderr,
                )
        params, cfg = load_clip_checkpoint(args.clip_checkpoint, dtype=dtype)
    else:
        print(
            f"WARNING: no --clip_checkpoint; initializing {args.arch} randomly "
            "(throughput-realistic, accuracy-meaningless)",
            file=sys.stderr,
        )
        cfg = clip_model.get_config(args.arch)
        params = jax.jit(lambda k: clip_model.init_clip_params(k, cfg, dtype=dtype))(jax.random.PRNGKey(args.seed))
    return params, cfg


def build_reward(args):
    import jax
    import jax.numpy as jnp
    from ..core.reward import ClipReward, ClipRewardEnsemble, RewardConfig, build_reward_model

    rcfg = RewardConfig(
        sample_k=args.sample_k,
        reward_process=bool(args.reward_process),
        process_batch=bool(args.process_batch),
        amplify=bool(args.reward_amplify),
        default_resolution=args.resolution,
    )
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    if args.multiple_reward_models:
        archs = ["ViT-L/14@336px", "RN50x64", "ViT-L/14"]
        ckpts = args.reward_checkpoints or [None] * len(archs)
        if getattr(args, "download", 0):
            from ..models.convert import download_checkpoint

            ckpts = [c or download_checkpoint(a) for a, c in zip(archs, ckpts)]
        members = [
            build_reward_model(a, rcfg, checkpoint=c, rng_seed=i + 1, dtype=dtype)
            for i, (a, c) in enumerate(zip(archs, ckpts))
        ]
        return ClipRewardEnsemble(members, rcfg, weighted=bool(args.weighted_scores))
    if not args.reward_checkpoint and getattr(args, "download", 0):
        from ..models.convert import download_checkpoint

        args.reward_checkpoint = download_checkpoint(args.reward_arch)
    if not args.reward_checkpoint:
        print(
            f"WARNING: no --reward_checkpoint; initializing {args.reward_arch} randomly",
            file=sys.stderr,
        )
    return build_reward_model(args.reward_arch, rcfg, checkpoint=args.reward_checkpoint, rng_seed=1, dtype=dtype)


def enable_cache():
    from ..utils.runtime import enable_compilation_cache

    enable_compilation_cache()
