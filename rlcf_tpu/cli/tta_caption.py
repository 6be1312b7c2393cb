"""Caption test-time adaptation (`caption/capdec_tta.py`).

Per test image: CLIP-encode to a prefix, run ``tta_steps`` of beam-K caption
sampling + CLIPScore REINFORCE on the mapper, emit a final beam-5 caption.
Outputs the COCO-format results json + {image: caption} json + a
sampled-caption/reward trace file. ``--synthetic`` runs without data using a
tiny OPT/vocab.

Example: python -m rlcf_tpu.cli.tta_caption --synthetic --tta_steps 2
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from . import common


def get_args(argv=None):
    p = argparse.ArgumentParser(description="RLCF caption TTA (TPU)")
    common.add_run_args(p)
    common.add_model_args(p)
    common.add_reward_args(p)
    p.add_argument("--tta_steps", type=int, default=4)
    p.add_argument("--tta_lr", type=float, default=3e-6)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--use_nucleus_sampling", type=int, default=0)
    p.add_argument(
        "--decode_seg_len", type=int, default=16,
        help="segment-bucketed beam gen cache (models/opt.py seg_len): "
        "reorder/attention traffic scales with elapsed tokens, identical "
        "outputs (default 16: measured 225-255 vs 316 ms/img at the "
        "reference caption config, PERF_r05); 0 = off",
    )
    p.add_argument(
        "--quantize_decode", type=int, default=0,
        help="int8 weight-only OPT decode (halves the per-token weight "
        "stream; generation-only — the CE/update path keeps full precision; "
        "sampled captions may differ within quantization error)",
    )
    p.add_argument("--prefix_length", type=int, default=40)
    p.add_argument("--clip_length", type=int, default=40)
    p.add_argument("--mapping_type", default="transformer", choices=["mlp", "transformer"])
    p.add_argument("--normalize_prefix", type=int, default=0)
    p.add_argument("--llm", default="opt-125m")
    p.add_argument("--checkpoint", default=None, help="supervised ClipCap/CapDec mapper ckpt (npz or torch)")
    p.add_argument("--opt_checkpoint", default=None, help="HF OPT torch checkpoint")
    p.add_argument("--opt_vocab", default=None, help="vocab.json for the OPT tokenizer")
    p.add_argument("--opt_merges", default=None, help="merges.txt for the OPT tokenizer")
    p.add_argument("--clip_model_type", default="ViT-B/16", help="feature-extractor CLIP arch")
    p.add_argument("--annotations", default=None)
    p.add_argument("--images_root", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--momentum_update", type=int, default=0)
    p.add_argument("--update_freq", type=int, default=256)
    p.add_argument("--update_w", type=float, default=1.0)
    p.add_argument("--tta_momentum", type=float, default=0.9999)
    p.add_argument("--out_results_file", default=None)
    p.add_argument("--out_clipscore_file", default=None)
    p.add_argument(
        "--episode_group", type=int, default=16,
        help="images adapted per device batch (each decode step streams the "
        "full OPT weights, so images per batch amortize the dominant cost; "
        "16 is the measured v5e knee — 24 OOMs, 8 is ~30%% slower)")
    p.add_argument(
        "--dp", type=int, default=1,
        help="episode data-parallel width: with N>1 devices, adapt_batch "
        "groups (per-image mapper states) shard over a dp mesh; OPT/reward "
        "params replicate",
    )
    p.add_argument(
        "--tp", type=int, default=1,
        help="tensor-parallel width for the OPT decode weight stream "
        "(Megatron split: heads/ffn/vocab shard over tp; parallel/tp_opt.py)",
    )
    return p.parse_args(argv)


def _synthetic_tokenizer(tmp_dir):
    """Tiny byte-level vocab for data-free smoke runs."""
    import json as _json
    from ..tokenizer_gpt2 import Gpt2Tokenizer, _byte_to_unicode

    os.makedirs(tmp_dir, exist_ok=True)
    b2u = _byte_to_unicode()
    vocab = {"<pad>": 1, "</s>": 2}
    next_id = 4
    for ch in b2u.values():
        if ch not in vocab:
            vocab[ch] = next_id
            next_id += 1
    vocab_p = os.path.join(tmp_dir, "vocab.json")
    merges_p = os.path.join(tmp_dir, "merges.txt")
    with open(vocab_p, "w") as fh:
        _json.dump(vocab, fh)
    with open(merges_p, "w") as fh:
        fh.write("#version\n")
    return Gpt2Tokenizer(vocab_p, merges_p)


def main(argv=None):
    args = get_args(argv)
    if common.finish_dry_run(args):
        return
    common.enable_cache()
    import jax
    import jax.numpy as jnp
    from ..models import clip as clip_model
    from ..models import mappers as M
    from ..models import opt as O
    from ..tasks import caption as Cap
    from ..tokenizer_gpt2 import Gpt2Tokenizer
    from ..utils.config import save_hparams
    from ..utils.logging_utils import CaptionTraceLogger, RunLogger

    logger = RunLogger(args.output)
    save_hparams(args.output, vars(args), name="hparams_caption.json")

    # feature-extractor CLIP (policy prefix source) + reward
    feat_args = argparse.Namespace(**{**vars(args), "arch": args.clip_model_type})
    clip_params, clip_cfg = common.load_policy(feat_args)
    reward = common.build_reward(args)

    if args.synthetic:
        ocfg = O.OPT_CONFIGS["test-tiny-opt"]
        mcfg = M.MapperConfig(
            args.mapping_type, clip_dim=clip_cfg.embed_dim, llm_dim=ocfg.embed_dim,
            prefix_length=4, clip_length=2, num_layers=1, n_heads=2,
        )
        tok = _synthetic_tokenizer(os.path.join(args.output, "tok"))
        max_new = 8
    else:
        ocfg = O.OPT_CONFIGS[args.llm]
        mcfg = M.MapperConfig(
            args.mapping_type, clip_dim=clip_cfg.embed_dim, llm_dim=ocfg.embed_dim,
            prefix_length=args.prefix_length, clip_length=args.clip_length,
        )
        from ..tokenizer_gpt2 import load_gpt2_tokenizer

        tok = load_gpt2_tokenizer(args.opt_vocab, args.opt_merges)
        max_new = 50
    ccfg = Cap.CaptionModelConfig(mapper=mcfg, opt=ocfg, normalize_prefix=bool(args.normalize_prefix))
    params = Cap.init_caption_params(jax.random.PRNGKey(args.seed), ccfg)
    if args.opt_checkpoint:
        from ..models.convert import load_torch_file

        params["opt"], _ = O.convert_opt_state_dict(load_torch_file(args.opt_checkpoint))
    if args.checkpoint:
        if args.checkpoint.endswith(".npz"):
            params["mapper"], _ = Cap.load_mapper_checkpoint(args.checkpoint, params["mapper"])
        else:
            from ..models.convert import load_torch_file

            params["mapper"] = M.convert_mapper_state_dict(load_torch_file(args.checkpoint), mcfg)

    mesh = None
    if args.dp > 1 or args.tp > 1:
        from ..parallel.mesh import make_mesh, round_to_dp

        mesh = make_mesh(n_devices=args.dp * args.tp, dp=args.dp, tp=args.tp)
        print(f"mesh: {dict(mesh.shape)}")
        rounded = round_to_dp(args.episode_group, mesh)
        if rounded != args.episode_group:
            print(f"NOTE: rounding --episode_group {args.episode_group} -> {rounded} (multiple of dp)")
            args.episode_group = rounded
    tta = Cap.CaptionTTA(
        params, ccfg, reward, tok,
        tta_steps=args.tta_steps, lr=args.tta_lr, weight_decay=args.weight_decay,
        sample_k=args.sample_k, max_new_tokens=max_new,
        use_nucleus=bool(args.use_nucleus_sampling),
        momentum_update=bool(args.momentum_update), update_freq=args.update_freq,
        update_w=args.update_w, momentum=args.tta_momentum, mesh=mesh,
        quantize_decode=bool(args.quantize_decode),
        decode_seg_len=args.decode_seg_len or None,
    )

    # Reference caption CLIs take --dataset_mode as an int selecting the eval
    # set (0=COCO 1=Flickr30k 2=NoCaps, `image_llm/params.py`); the shared
    # run-args default ("test") maps to path-keyed results.
    try:
        dmode = int(args.dataset_mode)
    except (TypeError, ValueError):
        dmode = -1

    # data
    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        n = args.limit or 4
        samples = [
            (f"synthetic_{i}", f"synthetic_{i}",
             rng.normal(size=(args.resolution, args.resolution, 3)).astype(np.float32))
            for i in range(n)
        ]
    else:
        from ..data.transforms import preprocess_many

        with open(args.annotations) as fh:
            ann = json.load(fh)

        # image_id extraction per eval set (`caption/image_llm/datasets/
        # coco_cap.py:239-289`): COCO parses the trailing number of
        # COCO_val2014_000000xxxx.jpg, Flickr the numeric stem, NoCaps carries
        # explicit ids; default (-1) keys results by the image path.
        def entry_id(a):
            img = a["image"]
            if dmode == 0:
                return int(img.split("_")[-1][:-4])
            if dmode == 1:
                return int(img.split("/")[-1][:-4])
            if dmode == 2:
                return a["image_id"]
            return img

        imgs = preprocess_many(
            [os.path.join(args.images_root, a["image"]) for a in ann[: args.limit]],
            args.resolution, decode=args.decode, workers=args.decode_workers,
        )
        samples = [
            (entry_id(a), os.path.basename(a["image"]) if dmode >= 0 else a["image"], im)
            for a, im in zip(ann[: args.limit], imgs)
        ]

    encode_img = jax.jit(lambda p, x: clip_model.encode_image(p, clip_cfg, x))
    trace_log = CaptionTraceLogger(os.path.join(args.output, "caption_trace.txt"))
    results, per_image = [], {}

    def run_group(group):
        ids = [g[0] for g in group]
        subs = [g[1] for g in group]
        imgs = np.stack([g[2] for g in group])
        embs = np.asarray(encode_img(clip_params, jnp.asarray(imgs))).astype(np.float32)
        if args.normalize_prefix:
            embs = embs / np.linalg.norm(embs, axis=-1, keepdims=True)
        trace: list = []
        if len(group) == 1:
            captions = [tta.adapt_image(imgs[0], embs[0], trace=trace)]
        else:
            captions = tta.adapt_batch(imgs, embs, trace=trace)
        for image_id, sub, caption in zip(ids, subs, captions):
            trace_log.log_id(str(sub))
            trace_log.log_final(caption)
            results.append({"image_id": image_id, "caption": caption})
            per_image[str(sub)] = caption
        for step_samples in trace:
            trace_log.log_samples([t for t, _ in step_samples], [r for _, r in step_samples])

    buf = []
    for item in samples:
        buf.append(item)
        if len(buf) == args.episode_group:
            run_group(buf)
            buf = []
    if buf:
        run_group(buf)
    trace_log.close()

    out_results = args.out_results_file or os.path.join(args.output, "results_caption.json")
    out_cs = args.out_clipscore_file or os.path.join(args.output, "results_clipscore.json")
    with open(out_results, "w") as fh:
        json.dump(results, fh)
    with open(out_cs, "w") as fh:
        json.dump(per_image, fh)
    logger.text(f"wrote {out_results} ({len(results)} captions)")
    return results


if __name__ == "__main__":
    main()
