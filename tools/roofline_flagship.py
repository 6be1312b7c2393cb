"""Stage-level roofline for the flagship RLCF prompt-TTA episode.

Times the two compiled stages of `PromptTTAClassifier` separately on the
real chip and reports XLA's own FLOP counts (`compiled.cost_analysis()`),
bytes accessed, and %-of-peak against v5e bf16 peak.

CAVEAT (measured 2026-08-16): cost_analysis() under-reports dot/conv FLOPs
~10x on this axon backend — treat its mfu_pct as a lower bound and use
bench.py's analytic `episode_mfu_pct_v5e_bf16` for the real MFU figure
(PERF.md round-2 table).

Stage A (prepare): 64-view ViT-B/16 policy encode + confidence selection +
ViT-L/14 reward encode of the selected views.
Stage B (episodes): per-sample scan of tta_steps text-tower fwd+bwd + AdamW
+ final logits.

Usage: python tools/roofline_flagship.py  [BENCH_VIEWS / BENCH_GROUP env]
"""

import json
import os
import sys
import time

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0  # TPU v5e (v5 lite) per-chip bf16 peak


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from rlcf_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.data.class_names import get_classnames
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.tasks.classification import PromptTTAClassifier

    n_views = int(os.environ.get("BENCH_VIEWS", 64))
    group = int(os.environ.get("BENCH_GROUP", 4))
    iters = int(os.environ.get("ROOFLINE_ITERS", 10))
    dtype = jnp.bfloat16

    pcfg = C.get_config("ViT-B/16")
    rcfg = C.get_config("ViT-L/14")
    pparams = jax.jit(lambda k: C.init_clip_params(k, pcfg, dtype=dtype))(jax.random.PRNGKey(0))
    rparams = jax.jit(lambda k: C.init_clip_params(k, rcfg, dtype=dtype))(jax.random.PRNGKey(1))
    jax.block_until_ready((pparams, rparams))

    reward = ClipReward(rparams, rcfg, RewardConfig(sample_k=3))
    ecfg = EpisodeConfig(tta_steps=3, selection_p=0.1, lr=7e-3, sample_k=3)
    clf = PromptTTAClassifier(pparams, pcfg, reward, ecfg, ctx_init="a photo of a")
    clf.setup(get_classnames("A"))

    rng = np.random.default_rng(0)
    views = jnp.asarray(rng.normal(size=(group, n_views, 224, 224, 3)).astype(np.float32) * 0.3)

    # ---- lower/compile each stage explicitly for cost analysis ----
    prep_fn = clf._prepare
    prep_args = (clf.clip_params, clf._reward_params_arg, clf._tf0, clf._reward_feats_arg, views)
    prep_lowered = prep_fn.lower(*prep_args)
    prep_compiled = prep_lowered.compile()
    img_feats, sel, r_sim = prep_fn(*prep_args)
    jax.block_until_ready((img_feats, sel, r_sim))

    ep_fn = clf._episodes
    ep_args = (clf.clip_params, clf._trainable0, clf._pt_args, clf._tf0, img_feats, sel, r_sim)
    ep_lowered = ep_fn.lower(*ep_args)
    ep_compiled = ep_lowered.compile()
    logits, _ = ep_fn(*ep_args)
    jax.block_until_ready(logits)

    def timeit(fn, args, n):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_prep = timeit(prep_fn, prep_args, iters)
    t_ep = timeit(ep_fn, ep_args, iters)

    def costs(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))

    f_prep, b_prep = costs(prep_compiled)
    f_ep, b_ep = costs(ep_compiled)

    def row(name, t, f, b):
        tf = f / 1e12
        mfu = (f / t) / (V5E_BF16_PEAK_TFLOPS * 1e12)
        gibs = b / t / 2**30
        return {
            "stage": name,
            "ms_total": round(t * 1e3, 2),
            "ms_per_image": round(t * 1e3 / group, 2),
            "tflops": round(tf, 3),
            "tflops_per_image": round(tf / group, 3),
            "mfu_pct": round(100 * mfu, 1),
            "GiB_per_s": round(gibs, 1),
        }

    rows = [
        row("A_prepare (64-view policy + reward encode)", t_prep, f_prep, b_prep),
        row("B_episodes (3x text fwd+bwd + AdamW + final)", t_ep, f_ep, b_ep),
        row("total", t_prep + t_ep, f_prep + f_ep, b_prep + b_ep),
    ]
    for r in rows:
        print(json.dumps(r))
    total = rows[-1]
    print(
        f"# {total['ms_per_image']} ms/img, {total['tflops_per_image']} TFLOP/img, "
        f"MFU {total['mfu_pct']}% of v5e bf16 peak ({V5E_BF16_PEAK_TFLOPS} TF/s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
