"""Probe: where do the flagship's non-episode ms/img go?

All timings block on DEVICE completion (no D2H of token buffers — a 77 MB
token pair crosses the tunnel at ~37 MB/s and swamps kernel time).

Arms, per group size:
  kernel_both   fused viewgen emitting policy(16) + reward(14) tokens
  kernel_ponly  fused viewgen emitting policy tokens only (half the writes)
  ep_both       adapt_tokens(ptoks, rtoks)   — reward from its own tokens
  ep_ponly      adapt_tokens(ptoks)          — reward via device depatchify
  fused_both    adapt_sources_fn (viewgen+prepare+episodes, one dispatch)
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rlcf_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

from rlcf_tpu.models import clip as C
from rlcf_tpu.core.reward import ClipReward, RewardConfig
from rlcf_tpu.core.episode import EpisodeConfig
from rlcf_tpu.tasks.classification import PromptTTAClassifier
from rlcf_tpu.data.class_names import get_classnames
from rlcf_tpu.ops.pallas_augmix import fused_views

n_views = 64
pcfg, rcfg = C.get_config("ViT-B/16"), C.get_config("ViT-L/14")
pparams = jax.jit(lambda k: C.init_clip_params(k, pcfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
rparams = jax.jit(lambda k: C.init_clip_params(k, rcfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(1))
reward = ClipReward(rparams, rcfg, RewardConfig(sample_k=3))
ecfg = EpisodeConfig(tta_steps=3, selection_p=0.1, lr=7e-3, sample_k=3)
clf = PromptTTAClassifier(pparams, pcfg, reward, ecfg, ctx_init="a photo of a")
clf.setup(get_classnames("A"))


def timeit(name, group, fn, iters=6):
    try:
        fn()  # compile
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        print(f"g{group} {name}: {ms:.1f} ms/group = {ms/group:.2f} ms/img", flush=True)
    except Exception as e:
        print(f"g{group} {name}: FAILED {type(e).__name__}: {e}", flush=True)


for group in (4, 8):
    rng = np.random.default_rng(0)
    imgs_planar = jnp.asarray(rng.integers(0, 256, (group, 3, 256, 256), dtype=np.uint8))
    jax.block_until_ready(imgs_planar)
    keys = jax.random.split(jax.random.PRNGKey(0), group)
    base = dict(n_views=n_views, resolution=224, src_size=256, p_policy=16)

    jb = jax.jit(lambda i, k: fused_views(i, k, **base, p_reward=14))
    jp = jax.jit(lambda i, k: fused_views(i, k, **base, p_reward=0))
    timeit("kernel_both ", group, lambda: jb(imgs_planar, keys))
    timeit("kernel_ponly", group, lambda: jp(imgs_planar, keys))

    ptoks, rtoks = jb(imgs_planar, keys)
    jax.block_until_ready((ptoks, rtoks))
    timeit("ep_both     ", group, lambda: clf.adapt_tokens(ptoks, rtoks))
    timeit("ep_ponly    ", group, lambda: clf.adapt_tokens(ptoks))

    run_src = clf.adapt_sources_fn(n_views=n_views, src_size=256, resolution=224)
    timeit("fused_both  ", group, lambda: run_src(imgs_planar, 0))
