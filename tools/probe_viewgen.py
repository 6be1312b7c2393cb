"""Probe: where do the flagship's non-episode ~9 ms/img go?

Times, on the real chip, with device-resident inputs:
  (a) the fused Pallas viewgen alone (ptoks+rtoks for a group),
  (b) prepare_tokens + episodes on resident tokens (the 'episode-only' number),
  (c) the single-dispatch adapt_sources_fn (viewgen+prepare+episodes fused).
(c) - (b) should equal (a) if composition is free; any excess is fusion loss.
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rlcf_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from rlcf_tpu.models import clip as C
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.tasks.classification import PromptTTAClassifier
    from rlcf_tpu.data.class_names import get_classnames
    from rlcf_tpu.ops.pallas_augmix import fused_views

    group = int(os.environ.get("BENCH_GROUP", 4))
    n_views = 64
    pcfg, rcfg = C.get_config("ViT-B/16"), C.get_config("ViT-L/14")
    pparams = jax.jit(lambda k: C.init_clip_params(k, pcfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    rparams = jax.jit(lambda k: C.init_clip_params(k, rcfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(1))
    reward = ClipReward(rparams, rcfg, RewardConfig(sample_k=3))
    ecfg = EpisodeConfig(tta_steps=3, selection_p=0.1, lr=7e-3, sample_k=3)
    clf = PromptTTAClassifier(pparams, pcfg, reward, ecfg, ctx_init="a photo of a")
    clf.setup(get_classnames("A"))

    rng = np.random.default_rng(0)
    imgs_planar = jnp.asarray(rng.integers(0, 256, (group, 3, 256, 256), dtype=np.uint8))
    jax.block_until_ready(imgs_planar)
    fkw = dict(n_views=n_views, resolution=224, src_size=256,
               p_policy=pcfg.vision_patch_size, p_reward=rcfg.vision_patch_size)
    keys = jax.random.split(jax.random.PRNGKey(0), group)

    def timeit(name, fn, leaf, iters=6):
        fn()  # compile
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(leaf(out))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        print(f"{name}: {ms:.1f} ms/group = {ms/group:.2f} ms/img", flush=True)
        return fn()

    toks = timeit("(a) fused viewgen", lambda: fused_views(imgs_planar, keys, **fkw),
                  lambda o: o[0])
    jax.block_until_ready(toks)
    timeit("(b) adapt_tokens (prepare+episodes)", lambda: clf.adapt_tokens(*toks),
           lambda o: o[0])
    run_src = clf.adapt_sources_fn(n_views=n_views, src_size=256, resolution=224)
    timeit("(c) adapt_sources_fn (fused all)", lambda: run_src(imgs_planar, 0),
           lambda o: o[0])


if __name__ == "__main__":
    main()
