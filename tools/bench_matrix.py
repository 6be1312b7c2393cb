"""Per-pipeline benchmark matrix -> PERF_rNN JSON records.

One command, four machine-readable records (the regression surface VERDICT
round 2 asked for — only the flagship had one):

    python tools/bench_matrix.py [--out PERF_r04.json] [--quick]

Pipelines (reference configs, BASELINE.md matrix):
  1. prompt_tta    — flagship `rlcf-prompt.sh`: ViT-B/16 policy, ViT-L/14
                     reward, 64 views, 3 steps, 200 classes (ms/image)
  2. encoder_tta   — `rlcf-tune.sh`: visual-tower fwd+bwd episodes (ms/image)
  3. retrieval_i2t / retrieval_t2i — `tta_coco_ret.sh`: 8 steps over cached
                     galleries (ms/query)
  4. caption_tta   — `tta_capdec_c2n.sh`: OPT-125m beam-6 x 4 steps + final
                     beam-5 (ms/image, includes the host retokenize loop)

Each record: ms/unit, analytic TFLOP/unit, MFU vs v5e bf16 peak (see
`rlcf_tpu/utils/flops.py` for the accounting; generation-bound pipelines
naturally read low MFU). Weights are randomly initialized — throughput is
weight-independent (no checkpoint egress here).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _median_time(fn, block, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        block(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _short_error(e: BaseException, limit: int = 300) -> str:
    """One-line failure summary. OOM dumps are multi-KB buffer tables that
    drown the perf JSON (VERDICT r4 weak #4) — keep only the headline
    'Used X of Y hbm' line when present, else the first line, truncated."""
    import re

    text = re.sub(r"\x1b\[[0-9;]*m", "", f"{type(e).__name__}: {e}")  # strip ANSI
    for line in text.splitlines():
        if "hbm" in line.lower() and "used" in line.lower():
            return line.strip()[:limit]
    return text.splitlines()[0][:limit] if text else type(e).__name__


def bench_prompt_tta(quick=False):
    import jax
    import jax.numpy as jnp
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.tasks.classification import PromptTTAClassifier
    from rlcf_tpu.data.class_names import get_classnames
    from rlcf_tpu.ops.pallas_augmix import fused_views, fused_available
    from rlcf_tpu.utils.flops import vit_tower_flops, text_tower_flops, V5E_BF16_PEAK

    group, n_views, steps = (2, 16, 3) if quick else (4, 64, 3)
    pcfg, rcfg = C.get_config("ViT-B/16"), C.get_config("ViT-L/14")
    pparams = jax.jit(lambda k: C.init_clip_params(k, pcfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    rparams = jax.jit(lambda k: C.init_clip_params(k, rcfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(1))
    reward = ClipReward(rparams, rcfg, RewardConfig(sample_k=3))
    ecfg = EpisodeConfig(tta_steps=steps, selection_p=0.1, lr=7e-3, sample_k=3)
    clf = PromptTTAClassifier(pparams, pcfg, reward, ecfg, ctx_init="a photo of a")
    classnames = get_classnames("A")
    clf.setup(classnames)

    imgs = np.random.default_rng(0).integers(0, 256, (group, 3, 256, 256), dtype=np.uint8)
    if fused_available():
        toks = fused_views(jnp.asarray(imgs), jax.random.split(jax.random.PRNGKey(0), group),
                           n_views=n_views, resolution=224, src_size=256, p_policy=16, p_reward=14)
        run = lambda: clf.adapt_tokens(*toks)
    else:
        from rlcf_tpu.data.augment import make_view_generator

        gen = make_view_generator(n_views=n_views, resolution=224)
        views = gen(jnp.asarray(imgs.transpose(0, 2, 3, 1)), jax.random.split(jax.random.PRNGKey(0), group))
        run = lambda: clf.adapt(views)
    run()  # compile
    sec = _median_time(run, lambda o: np.asarray(o[0]))

    n_keep = max(1, int(n_views * ecfg.selection_p))
    n_cls, t_txt = clf.prompt_state.fixed_embed.shape[:2]
    fl = (
        vit_tower_flops(pcfg, n_views, 224)
        + vit_tower_flops(rcfg, n_keep, 224)
        + (3 * steps + 1) * text_tower_flops(pcfg, n_cls * t_txt)
    )
    return {
        "pipeline": "prompt_tta",
        "config": f"ViT-B/16 policy, ViT-L/14 reward, {n_views} views, {steps} steps, {n_cls} classes",
        "ms_per_unit": round(sec / group * 1e3, 1),
        "unit": "image",
        "tflop_per_unit": round(fl / 1e12, 2),
        "mfu_pct_v5e_bf16": round(100 * fl * group / sec / V5E_BF16_PEAK, 1),
    }


def bench_encoder_tta(quick=False, remat=True):
    import jax
    import jax.numpy as jnp
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.tasks.classification import EncoderTTAClassifier
    from rlcf_tpu.data.class_names import get_classnames
    from rlcf_tpu.utils.flops import vit_tower_flops, V5E_BF16_PEAK

    group, n_views, steps = (1, 16, 3) if quick else (2, 64, 3)
    pcfg, rcfg = C.get_config("ViT-B/16"), C.get_config("ViT-L/14")
    pparams = jax.jit(lambda k: C.init_clip_params(k, pcfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    rparams = jax.jit(lambda k: C.init_clip_params(k, rcfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(1))
    reward = ClipReward(rparams, rcfg, RewardConfig(sample_k=3))
    ecfg = EpisodeConfig(tta_steps=steps, selection_p=0.1, lr=1e-5, sample_k=3)
    clf = EncoderTTAClassifier(pparams, pcfg, reward, ecfg, remat=remat)
    clf.setup(get_classnames("A"))

    views = jnp.asarray(
        np.random.default_rng(0).normal(size=(group, n_views, 224, 224, 3)).astype(np.float32)
    )
    run = lambda: clf.adapt(views)
    run()
    sec = _median_time(run, lambda o: np.asarray(o[0]), iters=3)

    n_keep = max(1, int(n_views * ecfg.selection_p))
    # selection fwd over all views (no residuals kept); every step fwd+bwd on
    # the n_keep recompute (bwd ~ 2x fwd; core/episode.py step-0 strategy);
    # final prediction fwd on view 0; reward fwd on n_keep
    fl = (
        vit_tower_flops(pcfg, n_views, 224)
        + steps * 3 * vit_tower_flops(pcfg, n_keep, 224)
        + vit_tower_flops(pcfg, 1, 224)
        + vit_tower_flops(rcfg, n_keep, 224)
    )
    return {
        "pipeline": "encoder_tta",
        "config": f"ViT-B/16 visual-tower episodes, ViT-L/14 reward, {n_views} views, "
        f"{steps} steps, remat={remat!r}",
        "ms_per_unit": round(sec / group * 1e3, 1),
        "unit": "image",
        "tflop_per_unit": round(fl / 1e12, 2),
        "mfu_pct_v5e_bf16": round(100 * fl * group / sec / V5E_BF16_PEAK, 1),
    }


def _synthetic_captions(n_images, caps_per_image):
    """COCO-shaped caption set with heavy word reuse (BPE-cache friendly)."""
    subjects = ["dog", "rider", "kitchen", "plane", "market", "skier", "bus", "pizza"]
    verbs = ["standing near", "moving past", "resting beside", "crossing"]
    scenes = ["a city street", "an open field", "the station", "a wooden table"]
    texts, img2txt, txt2img = [], {}, {}
    tid = 0
    for i in range(n_images):
        img2txt[i] = []
        for c in range(caps_per_image):
            texts.append(
                f"a {subjects[(i + c) % 8]} {verbs[(i * 3 + c) % 4]} {scenes[(i + 2 * c) % 4]}"
            )
            img2txt[i].append(tid)
            txt2img[tid] = i
            tid += 1
    return texts, img2txt, txt2img


def _synthetic_gallery(n_images=64, caps_per_image=4, res=224):
    from rlcf_tpu.tasks.retrieval import RetrievalGallery

    texts, img2txt, txt2img = _synthetic_captions(n_images, caps_per_image)
    imgs = np.random.default_rng(0).normal(size=(n_images, res, res, 3)).astype(np.float32)
    return RetrievalGallery([f"s_{i}.jpg" for i in range(n_images)], texts, img2txt, txt2img), imgs


def _image_chunks(n_total, chunk, res=224):
    """Iterator of [chunk, res, res, 3] batches reusing ONE host buffer.

    Feature-extraction timing is pixel-independent; reusing the buffer keeps
    host RAM at one chunk (a real 5k x 224^2 fp32 gallery is 3 GB) while the
    device still encodes n_total images.
    """
    buf = np.random.default_rng(0).normal(size=(chunk, res, res, 3)).astype(np.float32)
    for s in range(0, n_total, chunk):
        yield buf[: min(chunk, n_total - s)]


def bench_retrieval(direction, quick=False, mesh=None):
    """COCO-scale retrieval TTA bench (`tta_coco_ret.sh` shapes).

    Real COCO test: 5,000 gallery images / 25,010 captions
    (`retrieval/clip_ret_policy.py:150-160`). Records (a) gallery feature
    precompute seconds, (b) per-query ms at that gallery scale, (c) the
    group-size knee (8/16/32 sweep).
    """
    import jax
    import jax.numpy as jnp
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.tasks.retrieval import RetrievalTTA
    from rlcf_tpu.tokenizer import tokenize
    from rlcf_tpu.utils.flops import vit_tower_flops, text_tower_flops, V5E_BF16_PEAK

    steps = 2 if quick else 8
    groups = (2, 4) if quick else (8, 16, 32)
    n_gal = 16 if quick else 5000
    caps_per_image = 4 if quick else 5  # 25k captions at full scale
    sample_k = 20 if direction == "i2t" else 12  # `tta_coco_ret.sh`
    pcfg, rcfg = C.get_config("ViT-B/16"), C.get_config("ViT-L/14")
    pparams = jax.jit(lambda k: C.init_clip_params(k, pcfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    rparams = jax.jit(lambda k: C.init_clip_params(k, rcfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(1))
    reward = ClipReward(rparams, rcfg, RewardConfig(sample_k=sample_k))
    ecfg = EpisodeConfig(tta_steps=steps, lr=1e-6, sample_k=sample_k, adam_eps=1e-6)
    texts, _, _ = _synthetic_captions(n_gal, caps_per_image)
    tta = RetrievalTTA(pparams, pcfg, reward, ecfg, direction=direction, mesh=mesh)

    t0 = time.perf_counter()
    if direction == "i2t":
        tta.set_text_gallery(texts)
    else:
        tta.set_image_gallery(_image_chunks(n_gal, 250), _image_chunks(n_gal, 250))
    jax.block_until_ready(tta.gallery_feats)
    precompute_s = time.perf_counter() - t0

    if direction == "i2t":
        q_buf = np.random.default_rng(1).normal(size=(max(groups), 224, 224, 3)).astype(np.float32)
    else:
        q_buf = np.asarray(tokenize(texts[: max(groups)], truncate=True))

    # group-size sweep: each decode-free episode is per-query fwd+bwd towers;
    # grouping batches those towers — find where ms/query stops improving.
    # Per-group try/except: one OOM must not erase the groups that already
    # measured (VERDICT r4 weak #1/#4); groups above the HBM estimate are
    # skipped up front (`RetrievalTTA.hbm_group_cap`).
    cap = tta.hbm_group_cap()
    sweep, skipped = {}, {}
    for g in groups:
        if cap is not None and g > cap:
            skipped[g] = f"over HBM group cap {cap}"
            continue
        queries = q_buf[:g]
        run = lambda: tta.adapt_queries(queries)
        try:
            run()  # compile this batch shape
            sec = _median_time(run, lambda o: np.asarray(o), iters=3)
        except Exception as e:
            skipped[g] = _short_error(e)
            continue
        sweep[g] = round(sec / g * 1e3, 1)
    if not sweep:
        raise RuntimeError(f"all groups failed: {skipped}")
    best_group = min(sweep, key=sweep.get)
    sec_per_query = max(sweep[best_group] / 1e3, 1e-12)

    # per query: tta_steps x (policy fwd+bwd on 1 query) + final fwd; gallery
    # matmuls are negligible FLOPs but at 25k texts their HBM reads are not —
    # the measured ms reflects them
    if direction == "i2t":
        per_fwd = vit_tower_flops(pcfg, 1, 224)
    else:
        per_fwd = text_tower_flops(pcfg, 77)
    fl = (steps * 3 + 1) * per_fwd
    return {
        "pipeline": f"retrieval_{direction}",
        "config": f"ViT-B/16 policy, ViT-L/14 reward, {steps} steps, sample_k={sample_k}, "
        f"gallery {len(texts)} texts / {n_gal} images (COCO test scale)",
        "ms_per_unit": sweep[best_group],
        "unit": "query",
        "gallery_precompute_s": round(precompute_s, 1),
        "group_sweep_ms_per_query": sweep,
        **({"groups_skipped": skipped} if skipped else {}),
        **({"hbm_group_cap": cap} if cap is not None else {}),
        "best_group": best_group,
        "tflop_per_unit": round(fl / 1e12, 3),
        "mfu_pct_v5e_bf16": round(100 * fl / sec_per_query / V5E_BF16_PEAK, 1),
    }


def bench_retrieval_tp_ab(quick=False):
    """tp=2 sharded-gallery vs unsharded A/B on the virtual CPU mesh.

    Must run in its own process with JAX_PLATFORMS=cpu and
    XLA_FLAGS=--xla_force_host_platform_device_count=8 (this function
    re-execs itself with those set if needed). CPU-mesh wall times are NOT
    TPU numbers — the record only certifies that the tp-sharded gallery path
    compiles, matches the unsharded scores, and reports the relative delta.
    """
    import os as _os
    import subprocess
    import sys as _sys

    def _needs_reexec():
        if _os.environ.get("JAX_PLATFORMS") != "cpu":
            return True
        import jax as _jax

        return len(_jax.devices()) < 2  # cpu set by hand but no virtual mesh

    if _needs_reexec():
        env = dict(_os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS=_os.environ.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=8")
        cmd = [_sys.executable, __file__, "--only", "retrieval_tp_ab",
               "--out", "/dev/null"] + (["--quick"] if quick else [])
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
        for line in proc.stdout.splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("pipeline") == "retrieval_tp_ab":
                rec["note"] = "re-executed under the virtual 8-CPU mesh"
                return rec
        raise RuntimeError(f"tp A/B subprocess failed: {proc.stderr[-2000:]}")

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.tasks.retrieval import RetrievalTTA

    # tiny arch on CPU; the A/B isolates the gallery-matmul sharding, which is
    # arch-independent
    pcfg, rcfg = C.get_config("test-small"), C.get_config("test-small")
    pparams = C.init_clip_params(jax.random.PRNGKey(0), pcfg)
    rparams = C.init_clip_params(jax.random.PRNGKey(1), rcfg)
    n_gal, caps, group, steps = (64, 4, 4, 2) if quick else (1000, 5, 8, 8)
    texts, _, _ = _synthetic_captions(n_gal, caps)
    res = pcfg.image_resolution
    queries = np.random.default_rng(1).normal(size=(group, res, res, 3)).astype(np.float32)

    def build(mesh):
        reward = ClipReward(rparams, rcfg, RewardConfig(sample_k=3))
        ecfg = EpisodeConfig(tta_steps=steps, lr=1e-6, sample_k=3, adam_eps=1e-6)
        tta = RetrievalTTA(pparams, pcfg, reward, ecfg, direction="i2t", mesh=mesh)
        tta.set_text_gallery(texts)
        return tta

    results = {}
    scores = {}
    for name, mesh in [("unsharded", None),
                       ("tp2", Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2), ("dp", "tp")))]:
        tta = build(mesh)
        run = lambda: tta.adapt_queries(queries)
        run()
        sec = _median_time(run, lambda o: np.asarray(o), iters=3)
        results[name] = round(sec / group * 1e3, 2)
        scores[name] = run()
    err = float(np.max(np.abs(scores["tp2"] - scores["unsharded"])))
    return {
        "pipeline": "retrieval_tp_ab",
        "config": f"i2t, {len(texts)}-text gallery sharded over tp=2 vs unsharded, "
        f"{steps} steps, test-small arch, VIRTUAL 8-CPU MESH (relative delta only)",
        "ms_per_query": results,
        "tp2_vs_unsharded_speedup": round(results["unsharded"] / results["tp2"], 2),
        "max_abs_score_diff": err,
        "unit": "query",
    }


def _byte_level_tokenizer():
    """Synthetic byte-only GPT-2 vocab (no merges): decode/encode timing is
    representative without real tokenizer assets (zero-egress environment)."""
    import json as _json
    import tempfile

    from rlcf_tpu.tokenizer_gpt2 import Gpt2Tokenizer, _byte_to_unicode

    vocab = {"<pad>": 1, "</s>": 2}
    nid = 4
    for ch in _byte_to_unicode().values():
        if ch not in vocab:
            vocab[ch] = nid
            nid += 1
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "vocab.json"), "w") as fh:
        _json.dump(vocab, fh)
    with open(os.path.join(d, "merges.txt"), "w") as fh:
        fh.write("#version\n")
    return Gpt2Tokenizer(os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt"))


def bench_caption_tta(quick=False, group=None, quantize_decode=False, seg_len=16):
    import jax
    import jax.numpy as jnp
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.models import mappers as M
    from rlcf_tpu.models.opt import OPT_CONFIGS
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.tasks.caption import CaptionModelConfig, CaptionTTA, init_caption_params
    from rlcf_tpu.utils.flops import (
        V5E_BF16_PEAK, text_tower_flops, transformer_decode_flops, vit_tower_flops,
    )

    # group 16: each decode step streams the full OPT weights, so images per
    # batch amortize the dominant cost (the CLI equivalent: --episode_group
    # 16); measured knee on v5e 16G — 24 OOMs, 8 is ~30% slower. Override
    # with --caption_group for the knee sweep.
    group = group or (2 if quick else 16)
    steps, sample_k, max_new = (2, 3, 16) if quick else (4, 6, 50)
    rcfg_arch = C.get_config("ViT-B/16" if quick else "ViT-L/14")
    rparams = jax.jit(lambda k: C.init_clip_params(k, rcfg_arch, dtype=jnp.bfloat16))(jax.random.PRNGKey(1))
    reward = ClipReward(rparams, rcfg_arch, RewardConfig(sample_k=sample_k, process_batch=True))
    ocfg = OPT_CONFIGS["opt-125m"]
    mcfg = M.MapperConfig("transformer", clip_dim=512, llm_dim=ocfg.hidden,
                          prefix_length=40, clip_length=40)
    ccfg = CaptionModelConfig(mapper=mcfg, opt=ocfg)
    params = init_caption_params(jax.random.PRNGKey(0), ccfg, dtype=jnp.bfloat16)
    tok = _byte_level_tokenizer()
    tta = CaptionTTA(params, ccfg, reward, tok, tta_steps=steps, sample_k=sample_k,
                     max_new_tokens=max_new, quantize_decode=quantize_decode,
                     decode_seg_len=seg_len)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(group, 224, 224, 3)).astype(np.float32))
    clip_embs = jnp.asarray(rng.normal(size=(group, 512)).astype(np.float32))
    run = lambda: tta.adapt_batch(images, clip_embs)
    run()
    t0 = time.perf_counter()
    run()
    sec = time.perf_counter() - t0  # adapt_batch blocks internally (host loop)

    P = ccfg.prefix_length
    dec = transformer_decode_flops(ocfg.n_layers, ocfg.hidden, max_new, P + max_new // 2)
    # per image: steps x (beam-K decode + reward + fwd/bwd CE on K captions)
    # + final beam-5 decode
    L = P + max_new
    fwd_ce = transformer_decode_flops(ocfg.n_layers, ocfg.hidden, L, L // 2)  # full-seq fwd ~ decode sum
    # reward image encode is hoisted out of the step loop (once per image);
    # only the text tower runs every step on the fresh captions
    fl = (
        steps * (sample_k * dec + 3 * sample_k * fwd_ce)
        + 5 * dec
        + vit_tower_flops(rcfg_arch, 1, 224)
        + steps * text_tower_flops(rcfg_arch, sample_k * 77)
    )
    return {
        "pipeline": "caption_tta",
        "config": f"OPT-125m + transformer mapper, {rcfg_arch.name} reward, "
        f"{steps} steps, beam-{sample_k}, {max_new} new tokens",
        "ms_per_unit": round(sec / group * 1e3, 1),
        "unit": "image",
        "tflop_per_unit": round(fl / 1e12, 3),
        "mfu_pct_v5e_bf16": round(100 * fl * group / sec / V5E_BF16_PEAK, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PERF_r04.json")
    ap.add_argument("--quick", action="store_true", help="tiny shapes (CI smoke; numbers not comparable)")
    ap.add_argument("--only", default=None, help="comma-separated subset of pipeline names")
    ap.add_argument("--caption_group", type=int, default=None,
                    help="caption_tta episode-group override (decode-phase knee sweep)")
    args = ap.parse_args(argv)

    from rlcf_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    benches = {
        "prompt_tta": lambda: bench_prompt_tta(args.quick),
        "encoder_tta": lambda: bench_encoder_tta(args.quick),
        "retrieval_i2t": lambda: bench_retrieval("i2t", args.quick),
        "retrieval_t2i": lambda: bench_retrieval("t2i", args.quick),
        "caption_tta": lambda: bench_caption_tta(args.quick, group=args.caption_group),
        # opt-in (not in the default matrix): CPU-mesh tp A/B, the encoder
        # remat-policy A/B arm (saved attention outputs), int8 weight-only
        # decode, and the segment-bucketed beam cache
        "caption_tta_int8": lambda: {
            **bench_caption_tta(args.quick, group=args.caption_group, quantize_decode=True),
            "pipeline": "caption_tta_int8",
        },
        "caption_tta_seg0": lambda: {  # seg-cache ablation (pre-r5 default)
            **bench_caption_tta(args.quick, group=args.caption_group, seg_len=None),
            "pipeline": "caption_tta_seg0",
        },
        "caption_tta_seg8": lambda: {
            **bench_caption_tta(args.quick, group=args.caption_group, seg_len=8),
            "pipeline": "caption_tta_seg8",
        },
        "caption_tta_int8_seg16": lambda: {  # == int8 on the seg16 default
            **bench_caption_tta(args.quick, group=args.caption_group,
                                quantize_decode=True, seg_len=16),
            "pipeline": "caption_tta_int8_seg16",
        },
        "retrieval_tp_ab": lambda: bench_retrieval_tp_ab(args.quick),
        "encoder_tta_save_attn": lambda: {
            **bench_encoder_tta(args.quick, remat="save_attn"),
            "pipeline": "encoder_tta_save_attn",
        },
        "encoder_tta_noremat": lambda: {
            # with the step-0 recompute strategy the backward only touches the
            # S selected views (S=6 at the reference config) — activations fit
            # without checkpointing, and skipping remat saves the per-step
            # recompute forward (3x fwd(S) per step instead of 4x)
            **bench_encoder_tta(args.quick, remat=False),
            "pipeline": "encoder_tta_noremat",
        },
    }
    if not args.only:
        benches.pop("retrieval_tp_ab")
        benches.pop("encoder_tta_save_attn")
        benches.pop("encoder_tta_noremat")
        benches.pop("caption_tta_int8")
        benches.pop("caption_tta_seg0")
        benches.pop("caption_tta_seg8")
        benches.pop("caption_tta_int8_seg16")
    if args.only:
        keep = set(args.only.split(","))
        unknown = keep - benches.keys()
        if unknown:
            ap.error(f"--only: unknown pipeline(s) {sorted(unknown)}; choose from {sorted(benches)}")
        benches = {k: v for k, v in benches.items() if k in keep}

    records = []
    for name, fn in benches.items():
        t0 = time.time()
        try:
            rec = fn()
        except Exception as e:  # keep the matrix running; record the failure
            rec = {"pipeline": name, "error": _short_error(e)}
        rec["bench_wall_s"] = round(time.time() - t0, 1)
        records.append(rec)
        print(json.dumps(rec), flush=True)

    out = {"records": records, "quick": args.quick}
    if args.only and os.path.exists(args.out):
        # partial refresh: replace matching pipelines in the existing matrix
        # (same --quick mode only) instead of clobbering the other records
        try:
            with open(args.out) as fh:
                prev = json.load(fh)
        except (OSError, ValueError):
            prev = None
        if prev and prev.get("quick", False) == args.quick:
            fresh = {r["pipeline"]: r for r in records}
            merged = [fresh.pop(r.get("pipeline"), r) for r in prev.get("records", [])]
            out["records"] = merged + list(fresh.values())
            for k, v in prev.items():  # keep any extra fields (e.g. "note")
                out.setdefault(k, v)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"# wrote {args.out}", file=sys.stderr)
    return records


if __name__ == "__main__":
    main()
