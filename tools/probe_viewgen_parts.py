"""Probe: split the fused viewgen's cost into sampler / kernel / patchify.

Times each stage as its own jitted program with device-resident inputs and
block_until_ready, at the flagship shape (group x 64 views, 256 -> 224).
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rlcf_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import functools

from rlcf_tpu.ops.pallas_augmix import (
    _bicubic_matrix,
    _fused_call,
    fused_views,
    patchify_planar_u8,
    sample_view_params,
)

group = int(os.environ.get("BENCH_GROUP", 4))
n_views, S, R = 64, 256, 224


def timeit(name, fn, iters=8):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"g{group} {name}: {ms:.1f} ms/group = {ms/group:.2f} ms/img", flush=True)


rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 256, (group, 3, S, S), dtype=np.uint8))
keys = jax.random.split(jax.random.PRNGKey(0), group)
jax.block_until_ready(imgs)

sample = functools.partial(sample_view_params, n_views=n_views, src_size=S,
                           resolution=R, augmix=True, severity=1.0, crop_min=0.08)
jsample = jax.jit(jax.vmap(sample))
timeit("sampler      ", lambda: jsample(keys))

params = jax.tree.map(
    lambda v: v.reshape((group * n_views,) + v.shape[2:]), dict(jsample(keys)))
basew = _bicubic_matrix(S, R)
jax.block_until_ready(params)


@jax.jit
def kern(imgs_, params_):
    return _fused_call(imgs_, params_, basew, R=R, S=S, V=n_views,
                       max_shift=8, interpret=False)


views = kern(imgs, params)
jax.block_until_ready(views)
timeit("pallas kernel", lambda: kern(imgs, params))

jp16 = jax.jit(lambda v: patchify_planar_u8(v, 16))
jp14 = jax.jit(lambda v: patchify_planar_u8(v, 14))
timeit("patchify p16 ", lambda: jp16(views))
timeit("patchify p14 ", lambda: jp14(views))

jfull = jax.jit(lambda i, k: fused_views(
    i, k, n_views=n_views, resolution=R, src_size=S, p_policy=16, p_reward=14))
timeit("full fused   ", lambda: jfull(imgs, keys))
