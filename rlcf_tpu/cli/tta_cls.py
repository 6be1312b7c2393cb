"""RLCF / TPT / KD prompt test-time adaptation for classification.

The `TPT/tpt_cls_rl.py` / `tpt_cls.py` / `tune_cls_kd.py` entry point family:
per test image, generate the augmented view batch on device, run a REINFORCE
(or entropy / KD) episode over the CoOp prompt, and score the adapted
prediction. Episodes run ``--episode_group`` at a time (vmapped).

Example (no data / checkpoints required):
  python -m rlcf_tpu.cli.tta_cls --test_sets synthetic --limit 8 \
      --arch ViT-B/16 --reward_arch ViT-B/16 --tta_steps 3 --batch_size 16 \
      --ctx_init a_photo_of_a --loss rlcf
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from . import common


def get_args(argv=None):
    p = argparse.ArgumentParser(description="RLCF prompt TTA (TPU)")
    common.add_run_args(p)
    common.add_model_args(p)
    common.add_reward_args(p)
    common.add_tta_args(p)
    p.add_argument("--loss", default="rlcf", choices=["rlcf", "tpt", "kd", "dkd", "atkd"])
    p.add_argument("--tpt", action="store_true", help="compat flag: TPT entropy loss")
    p.add_argument("--cocoop", action="store_true", help="CoCoOp image-conditioned prompts (entropy TTA)")
    p.add_argument("--resume", action="store_true", help="continue from the progress journal in --output")
    p.add_argument(
        "--bongard_split", default="unseen_obj_unseen_act",
        help="Bongard-HOI split name (used when 'bongard' is in --test_sets)",
    )
    p.add_argument(
        "--learned_cls", type=int, default=1,
        help="Bongard mode: 1 = learnable class token with ['X','X'] names "
        "(`custom_clip.py:350-355`), 0 = fixed ['True','False'] prompts",
    )
    p.add_argument(
        "--tp", type=int, default=1,
        help="class-axis tensor-parallel width; with >1 devices a (dp, tp) "
        "mesh shards episode batches over dp and the class axis over tp",
    )
    p.add_argument(
        "--viewgen", default="auto", choices=["auto", "fused", "device", "native"],
        help="AugMix backend: 'fused' = fully-fused Pallas TPU kernel (ships the "
        "196 KB source image, builds all views in VMEM, emits patch-major u8 "
        "tokens — the production TPU path); 'device' = jitted XLA pipeline; "
        "'native' = C++ host pipeline emitting uint8. 'auto' picks fused on a "
        "single TPU chip with a ViT policy, device otherwise",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    if args.tpt and args.loss == "rlcf":
        args.loss = "tpt"
    if common.finish_dry_run(args):
        return
    common.enable_cache()

    import jax
    import jax.numpy as jnp
    from ..core.episode import EpisodeConfig
    from ..core.prompt import load_coop_ctx
    from ..data.augment import make_view_generator
    from ..data.class_names import get_classnames
    from ..data.datasets import PrefetchIterator, build_dataset, iter_canonical
    from ..metrics.classification import AccuracyMeter
    from ..tasks.classification import PromptTTAClassifier
    from ..utils.config import save_hparams
    from ..utils.logging_utils import RunLogger

    logger = RunLogger(args.output)
    save_hparams(args.output, vars(args))
    params, cfg = common.load_policy(args)
    reward = common.build_reward(args)
    kd_map = {"KD": "kd", "DKD": "dkd", "ATKD": "atkd"}
    loss = kd_map[args.kd_loss] if args.loss == "kd" else args.loss
    ecfg = EpisodeConfig(
        tta_steps=args.tta_steps,
        selection_p=args.selection_p,
        lr=args.lr,
        weight_decay=args.weight_decay,
        loss=loss,
        sample_k=args.sample_k,
        min_entropy_reg=bool(args.min_entropy_reg),
        min_entropy_w=args.min_entropy_w,
    )
    mesh = None
    if args.tp > 1:
        from ..parallel.mesh import make_mesh, round_to_dp

        mesh = make_mesh(tp=args.tp)
        print(f"mesh: {dict(mesh.shape)}")
        rounded = round_to_dp(args.episode_group, mesh)
        if rounded != args.episode_group:
            print(f"NOTE: rounding --episode_group {args.episode_group} -> {rounded} (multiple of dp)")
            args.episode_group = rounded
    if args.cocoop:
        if mesh is not None:
            raise SystemExit("--tp > 1 is not supported with --cocoop (prompt-TTA only)")
        from ..tasks.classification import CoCoOpTTAClassifier, convert_cocoop_checkpoint

        ctx0 = meta_net = None
        if args.load:
            from ..models.convert import load_torch_file

            ctx0, meta_net = convert_cocoop_checkpoint(load_torch_file(args.load))
        import dataclasses as _dc

        clf = CoCoOpTTAClassifier(
            params, cfg, _dc.replace(ecfg, loss="tpt"),
            ctx_init=args.ctx_init or "a photo of a", n_ctx=args.n_ctx, ctx0=ctx0, meta_net=meta_net,
        )
    else:
        ctx0 = load_coop_ctx(args.load) if args.load else None
        clf = PromptTTAClassifier(
            params, cfg, reward, ecfg, ctx_init=args.ctx_init or "a photo of a", n_ctx=args.n_ctx, ctx0=ctx0,
            mesh=mesh,
        )
    # token-mode eligibility (shared by the fused and native backends);
    # mirrors the classifier's token_mode_ok (ViT policy + single reward) —
    # checked statically because _prepare_tokens only exists after setup()
    token_ok = (
        not args.cocoop
        and cfg.is_vit
        and args.resolution % cfg.vision_patch_size == 0
        and not args.multiple_reward_models
    )
    if args.viewgen == "auto":
        from ..ops.pallas_augmix import fused_available

        args.viewgen = "fused" if (fused_available() and token_ok and not args.hard_aug) else "device"
        print(f"viewgen: auto -> {args.viewgen}")
    if args.viewgen == "fused":
        if args.hard_aug:
            raise SystemExit("--viewgen fused does not implement --hard_aug (BYOL); use --viewgen device")
        if not token_ok:
            raise SystemExit("--viewgen fused needs a ViT policy in token mode; use --viewgen device")
        gen = None
    elif args.viewgen == "native":
        from ..data import native as native_mod

        if args.hard_aug:
            raise SystemExit("--viewgen native does not implement --hard_aug (BYOL); use --viewgen device")
        if not native_mod.available():
            raise SystemExit("--viewgen native: no C++ toolchain available to build the host pipeline")
        gen = None
    else:
        gen = make_view_generator(
            n_views=args.batch_size, resolution=args.resolution, augmix=bool(args.augmix), hard_aug=bool(args.hard_aug)
        )

    import json as _json
    import os as _os

    results = {}
    for set_id in args.test_sets.split("/"):
        t0 = time.time()
        if set_id == "bongard":
            # Few-shot Bongard-HOI episodes take a different driver shape
            # (support CE + query scoring) — see `tasks/bongard.py`.
            from ..tasks.bongard import run_bongard

            results[set_id] = run_bongard(args, params, cfg, logger)
            logger.text(logger.elapsed_line(f"dataset {set_id}"))
            continue
        classnames = ["class_%d" % i for i in range(10)] if set_id == "synthetic" else get_classnames(set_id)
        clf.setup(classnames)
        dataset = build_dataset(set_id, args.data, mode=args.dataset_mode, corruption=args.corruption, level=args.level)
        meter = AccuracyMeter()

        # Fault tolerance: deterministic sample order (seeded shuffle) plus a
        # progress journal makes mid-dataset resume a skip-count.
        journal_path = _os.path.join(args.output, f"progress_{set_id.replace('/', '_')}.jsonl")
        skip = 0
        if args.resume and _os.path.exists(journal_path):
            with open(journal_path) as fh:
                for line in fh:
                    rec = _json.loads(line)
                    meter.update_counts({1: rec["c1"], 5: rec["c5"]}, rec["n"])
                    skip += rec["n"]
            print(f"resuming {set_id}: {skip} samples already scored")
        journal = open(journal_path, "a")

        group_imgs, group_labels = [], []
        rng_counter = [skip // max(args.episode_group, 1)]

        # Token mode (fused / native backends): ship patch-major u8 tokens
        # when the policy is a ViT (single reward) — the TPU hot path: fast
        # transfer layout + patch embedding as one MXU matmul, selected views
        # depatchified on device for the reward. NHWC u8 otherwise.
        use_tokens = gen is None and token_ok
        # fused kernel can also pre-patchify for a ViT reward at the same res
        reward_same_res = (
            args.viewgen == "fused"
            and not args.multiple_reward_models
            and clf.reward.cfg.is_vit
            and clf.reward.cfg.image_resolution == args.resolution
        )

        def flush():
            if not group_imgs:
                return
            imgs = np.stack(group_imgs)  # already canonical [256, 256, 3] u8
            if args.viewgen == "fused":  # all viewgen on device, in one kernel
                from ..ops.pallas_augmix import fused_views, fused_views_sharded

                keys = jax.random.split(jax.random.PRNGKey(args.seed * 100003 + rng_counter[0]), len(group_imgs))
                rng_counter[0] += 1
                planar = np.ascontiguousarray(imgs.astype(np.uint8).transpose(0, 3, 1, 2))
                fkw = dict(
                    n_views=args.batch_size, resolution=args.resolution, src_size=256,
                    augmix=bool(args.augmix), p_policy=cfg.vision_patch_size,
                    p_reward=clf.reward.cfg.vision_patch_size if reward_same_res else 0,
                )
                if mesh is not None and len(group_imgs) % mesh.shape["dp"] == 0:
                    # multi-chip: viewgen shards over dp alongside the episodes
                    views = fused_views_sharded(jnp.asarray(planar), keys, mesh, **fkw)
                else:
                    views = fused_views(jnp.asarray(planar), keys, **fkw)
            elif gen is None:  # native host pipeline, raw u8 (device normalizes)
                if use_tokens:
                    from ..data.native import generate_views_native_patch_u8

                    views = generate_views_native_patch_u8(
                        imgs.astype(np.uint8), n_views=args.batch_size,
                        p_policy=cfg.vision_patch_size, resolution=args.resolution,
                        augmix=bool(args.augmix), seed=args.seed * 100003 + rng_counter[0],
                    )
                else:
                    from ..data.native import generate_views_native_u8

                    views = generate_views_native_u8(
                        imgs.astype(np.uint8), n_views=args.batch_size, resolution=args.resolution,
                        augmix=bool(args.augmix), seed=args.seed * 100003 + rng_counter[0],
                    )
                rng_counter[0] += 1
            else:
                keys = jax.random.split(jax.random.PRNGKey(args.seed * 100003 + rng_counter[0]), len(group_imgs))
                rng_counter[0] += 1
                views = gen(jnp.asarray(imgs), keys)
            if isinstance(views, tuple):  # fused policy+reward token pair
                logits, _ = clf.adapt_tokens(*views)
            elif use_tokens:
                logits, _ = clf.adapt_tokens(views)
            else:
                logits, _ = clf.adapt(views)
            from ..metrics.classification import topk_correct

            counts = topk_correct(np.asarray(logits), np.asarray(group_labels))
            meter.update_counts({k: int(v) for k, v in counts.items()}, len(group_labels))
            journal.write(_json.dumps({"n": len(group_labels), "c1": int(counts[1]), "c5": int(counts[5])}) + "\n")
            journal.flush()
            group_imgs.clear()
            group_labels.clear()

        seen = 0
        for img, label in PrefetchIterator(
            iter_canonical(dataset, 256, seed=args.seed, limit=args.limit,
                           workers=args.decode_workers, decode=args.decode)
        ):
            seen += 1
            if seen <= skip:
                continue
            group_imgs.append(img)
            group_labels.append(label)
            if len(group_imgs) == args.episode_group:
                flush()
        flush()
        journal.close()
        results[set_id] = meter.summary()
        logger.text(
            logger.elapsed_line(f"dataset {set_id}"),
            f"=> Acc. on testset [{set_id}]: @1 {results[set_id]['top1']} / @5 {results[set_id]['top5']}",
        )
        _ = t0
    logger.results_json(results)
    print("======== Result Summary ========", results)
    return results


if __name__ == "__main__":
    main()
