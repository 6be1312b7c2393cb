"""Probe: split the fused viewgen kernel's per-view cost by op class.

Arms (all p_policy=0, planar views out, g8 x 64 views, 256 -> 224):
  off        augmix=False — RRC resize + IO only (depth 0 skips every op)
  derived    severity-1 derived tap windows (the r5 default)
  uniform12  the r2-r4 uniform max_shift=12 windows
  <op-only>  chains forced to a single op class via injected parameters
             (depth 1, all three chains the same op) — isolates one op's
             cost over the 'off' baseline.

Timing discipline for this remote-TPU fabric: a bare jit call returns
before the device finishes (block_until_ready is a no-op on axon arrays)
and fetching the full [512, 3, 224, 224] output costs seconds of tunnel
transfer that swamps the kernel. So each arm runs SCAN_ITERS iterations
inside ONE ``lax.scan`` (seed-chained, like the production macro-batch
path) and the program returns a single u8 pixel — dispatch amortizes to
zero and the fetch is one byte. The op-only arms chunk images 4 at a time
exactly like ``fused_views`` (512 scalar-prefetch rows overflow the 1 MB
SMEM budget; 256 fit).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from rlcf_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

from rlcf_tpu.ops.pallas_augmix import (
    _bicubic_matrix,
    _fused_call,
    _op_shift_bounds,
    fused_views,
    sample_view_params,
)

group, n_views, S, R = 8, 64, 256, 224
CHUNK = 4  # images per pallas_call (matches fused_views' SMEM chunking)
SCAN_ITERS = 20


def scanned(views_of_keys):
    """jit(seed -> u8 pixel): SCAN_ITERS seed-chained viewgen iterations."""

    @jax.jit
    def run(imgs, seed):
        def body(s, _):
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), s), group)
            v = views_of_keys(imgs, keys)
            return s + 1, v[0, 0, 0, 0]

        _, px = jax.lax.scan(body, seed, None, length=SCAN_ITERS)
        return px[-1]

    return run


def timeit(name, fn, imgs, iters=4, base=0.0):
    np.asarray(fn(imgs, jnp.int32(0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(imgs, jnp.int32(i + 1)))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3 / SCAN_ITERS
    print(f"g{group} {name:>12s}: {ms:7.1f} ms/group = {ms/group:6.3f} ms/img"
          + (f"  (+{(ms-base)/group:6.3f} over off)" if base else ""), flush=True)
    return ms


rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 256, (group, 3, S, S), dtype=np.uint8))
np.asarray(imgs).ravel()[:1]

base_kw = dict(n_views=n_views, resolution=R, src_size=S)
t_off = timeit("off", scanned(lambda i, k: fused_views(i, k, augmix=False, **base_kw)), imgs)
t_der = timeit("derived", scanned(lambda i, k: fused_views(i, k, augmix=True, **base_kw)),
               imgs, base=t_off)
timeit("uniform12", scanned(lambda i, k: fused_views(i, k, augmix=True, max_shift=12, **base_kw)),
       imgs, base=t_off)

# single-op arms: depth 1 per chain, every step the same op
sample = functools.partial(sample_view_params, n_views=n_views, src_size=S,
                           resolution=R, augmix=True, severity=1.0, crop_min=0.08)
basew = _bicubic_matrix(S, R)
shifts = _op_shift_bounds(1.0, R)


def forced_op(op):
    mag = {0: 0.0, 1: 0.0, 2: 0.0, 3: float(np.tan(np.deg2rad(3) / 2)),
           4: 128.0, 5: 0.03, 7: 7.0}[op]
    beta = float(-np.sin(np.deg2rad(3))) if op == 3 else 0.0
    ip = 0xF0 if op == 2 else 0

    def views(i, keys):
        params = jax.tree.map(
            lambda v: v.reshape((group * n_views,) + v.shape[2:]),
            dict(jax.vmap(sample)(keys)))
        params["depth"] = jnp.where(params["depth"] > 0, 1, 0)
        params["ops"] = jnp.full_like(params["ops"], op)
        params["p0"] = jnp.full_like(params["p0"], mag)
        params["p1"] = jnp.full_like(params["p1"], beta)
        params["ip0"] = jnp.full_like(params["ip0"], ip)
        outs = []
        for s0 in range(0, group, CHUNK):
            rows = slice(s0 * n_views, (s0 + CHUNK) * n_views)
            pc = {k: v[rows] for k, v in params.items()}
            outs.append(_fused_call(i[s0:s0 + CHUNK], pc, basew, R=R, S=S,
                                    V=n_views, shifts=shifts, interpret=False))
        return jnp.concatenate(outs, axis=0).reshape(group, n_views, 3, R, R)

    return views


OPS = {"autocontrast": 0, "equalize": 1, "posterize": 2, "rotate": 3,
       "solarize": 4, "shear_x": 5, "translate_x": 7}
if "--ops" not in __import__("sys").argv:
    OPS = {}  # each op arm compiles its own scan program (~minutes on the
    # remote compile service); opt in with --ops when the breakdown is needed
for name, op in OPS.items():
    t = timeit(name, scanned(forced_op(op)), imgs, base=t_off)
    print(f"             {name} op cost: {(t - t_off)/group/3:.3f} ms/img per chain-step "
          f"(3 chains x depth 1 forced)", flush=True)
