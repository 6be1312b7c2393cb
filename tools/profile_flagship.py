"""Profile the flagship prompt-TTA pipeline on the real chip.

Times view generation and episodes separately (pipeline-drained) and
optionally captures a jax.profiler trace.

Usage: python tools/profile_flagship.py [--trace_dir DIR] [--views 64] [--group 4]
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace_dir", default=None)
    p.add_argument("--views", type=int, default=64)
    p.add_argument("--group", type=int, default=4)
    p.add_argument("--classes", default="A")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rlcf_tpu.utils.runtime import enable_compilation_cache
    from rlcf_tpu.utils.profiling import trace, device_memory_stats

    enable_compilation_cache()
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.tasks.classification import PromptTTAClassifier
    from rlcf_tpu.data.augment import make_view_generator
    from rlcf_tpu.data.class_names import get_classnames

    pcfg = C.get_config("ViT-B/16")
    rcfg = C.get_config("ViT-L/14")
    pparams = jax.jit(lambda k: C.init_clip_params(k, pcfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
    rparams = jax.jit(lambda k: C.init_clip_params(k, rcfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(1))
    reward = ClipReward(rparams, rcfg, RewardConfig(sample_k=3))
    clf = PromptTTAClassifier(pparams, pcfg, reward, EpisodeConfig(tta_steps=3, selection_p=0.1, lr=7e-3, sample_k=3))
    clf.setup(get_classnames(args.classes))
    gen = make_view_generator(n_views=args.views, resolution=224)

    imgs = np.random.randint(0, 256, (args.group, 256, 256, 3), dtype=np.uint8)
    keys = jax.random.split(jax.random.PRNGKey(0), args.group)

    # compile
    views = gen(jnp.asarray(imgs), keys)
    np.asarray(views[0, 0, 0, 0])
    logits, _ = clf.adapt(views)
    np.asarray(logits)
    print("compiled; hbm:", device_memory_stats())

    def timed(fn, n):
        t0 = time.time()
        out = None
        for i in range(n):
            out = fn(i)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        return (time.time() - t0) / n

    t_gen = timed(lambda i: gen(jnp.asarray(imgs), jax.random.split(jax.random.PRNGKey(i), args.group)), args.iters)
    t_ep = timed(lambda i: clf.adapt(views)[0], args.iters)
    print(f"viewgen: {t_gen*1000:.0f} ms/group ({t_gen/args.group*1000:.0f} ms/img)")
    print(f"episode: {t_ep*1000:.0f} ms/group ({t_ep/args.group*1000:.0f} ms/img)")
    print(f"combined serial: {(t_gen+t_ep)/args.group*1000:.0f} ms/img -> {args.group/(t_gen+t_ep):.2f} img/s")

    if args.trace_dir:
        with trace(args.trace_dir):
            views2 = gen(jnp.asarray(imgs), keys)
            logits, _ = clf.adapt(views2)
            np.asarray(logits)
        print("trace written to", args.trace_dir)


if __name__ == "__main__":
    main()
