"""Fully-fused on-device AugMix view generation (one Pallas kernel per view).

The round-2 pipeline shipped 9.6 MB of host-built views per image; this
kernel ships the 196 KB canonical source image and builds all 64 views on
device, entirely inside VMEM — one HBM read of the source per image, one
write of the finished u8 views per view, zero image-space HBM round trips in
between. Replaces the host C++ pipeline (`native/rlcf_host.cpp`) and the
round-1 XLA device pipeline (`data/augment.py`) as the preferred viewgen
backend; both remain as fallbacks.

Reference semantics: `TPT/data/datautils.py:75-128` (RandomResizedCrop +
HFlip + 3-chain AugMix, Dirichlet/Beta mixing) and `TPT/data/augmix_ops.py`
(the 9 PIL base ops). Per-view parameters are sampled OUTSIDE the kernel by
``sample_view_params`` with the exact RNG split structure of
``data.augment.generate_views``, so parameter streams are bit-identical to
the existing device path for the same key.

TPU-native design notes (vs the XLA path this supersedes):

- RandomResizedCrop is two MXU matmuls against triangle-kernel interpolation
  matrices built in-kernel from 4 scalars; the horizontal flip is FREE —
  folded into the crop by reversing the output order of the x-weight matrix.
- AugMix chain steps branch for real: ``@pl.when`` on SMEM scalars executes
  only the sampled op (the vmapped XLA path predicates ALL 9 ops every step,
  a measured 9x blowup).
- Rotation decomposes exactly into three shears
  (R(t) = ShX(tan t/2) · ShY(-sin t) · ShX(tan t/2)), so every geometric op
  is a 1-D shift-blend over contiguous ``pltpu.roll``s — no gathers.
- Equalize is bit-sliced for the MXU: with x = 16·hi + lo, the 256-bin
  histogram is a batched [16,16] contraction of hi/lo one-hots, the PIL
  cumulative-step LUT is built with 16x16 triangular matmuls, and the LUT
  gather is a second batched contraction — no scatter/gather, ~50 MFLOP of
  MXU work instead of ~100M serial VPU ops per plane.
- The AugMix mix runs in pixel space (convex weights commute with the
  normalize affine) so views emit as u8: 4x less HBM write + transfer, with
  <=0.5 gray quantization (below the towers' bf16 input precision).

Output is channel-planar u8 [N, V, 3, R, R]; ``patchify_planar_u8`` converts
to the patch-major token layout `models.clip.encode_image_tokens` consumes
(XLA-side relayout — lane-dimension-changing reshapes are not available
inside Mosaic kernels).
"""

from __future__ import annotations

import functools
import math


import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data.augment import _rrc_boxes, N_AUGMIX_OPS, N_CHAINS, MAX_CHAIN_DEPTH

DEFAULT_MAX_SHIFT = 12


def _op_shift_bounds(severity: float, R: int) -> tuple:
    """Tight static tap windows (rot_alpha, rot_beta, shear, trans) for the
    warp ops at this severity/resolution.

    The sampled level never exceeds ``severity`` (`augmix_ops.py:30-37`:
    level = 0.1 + u*(severity-0.1), u<1), which bounds every per-pixel shift:

    - rotate decomposes into ShX(alpha)·ShY(beta)·ShX(alpha) with
      |alpha| = tan(rad(floor(3s))/2), |beta| = sin(rad(floor(3s))), each
      scaled by the center offset |r+0.5-R/2| <= R/2-0.5;
    - shear: |0.03s·(coord+0.5)| <= 0.03s·(R-0.5);
    - translate: floor(s·R/30) exactly (integer shift, no fractional tap).

    A fractional shift x needs taps at floor(x) and floor(x)+1, so the
    window is floor(bound)+1 — except integer translate, where bound taps
    suffice. At severity 1 / R 224 this is (3, 6, 7, 7) versus the uniform
    12 the kernel used before: half the warp taps, bit-identical output
    (dropped taps carry zero weight). It also lifts the severity>=2 clamp
    bug: translate reaches floor(2·224/30)=14 px, which a uniform window of
    12 silently truncated.
    """
    deg = math.floor(3.0 * severity)
    half = R / 2.0 - 0.5
    rot_a = math.tan(math.radians(deg) / 2.0) * half
    rot_b = math.sin(math.radians(deg)) * half
    shear = 0.03 * severity * (R - 0.5)
    trans = math.floor(severity * (R / 3.0) / 10.0)
    frac = lambda x: int(math.floor(x)) + 1
    return (frac(rot_a), frac(rot_b), frac(shear), int(trans))


# ---------------------------------------------------------------------------
# Parameter sampling (outside the kernel; RNG tree mirrors generate_views)
# ---------------------------------------------------------------------------


def sample_view_params(rng, n_views: int, src_size: int, resolution: int,
                       augmix: bool, severity: float, crop_min: float):
    """Sample one image's per-view parameters, packed for the kernel.

    Returns a dict of arrays with leading dim ``n_views`` (row 0 = the
    un-augmented base view: depth 0, m=1). Distributions are the reference's
    (`augmix_ops.py:30-53`, `datautils.py:94-110`); the split structure is
    ``generate_views``'s, so parameter streams match it bit-for-bit.
    """
    V = n_views - 1
    k_crop, k_flip, k_chain, k_m, k_w, _k_hard = jax.random.split(rng, 6)
    top, left, h, w = _rrc_boxes(k_crop, V, src_size, src_size, (crop_min, 1.0))
    do_flip = jax.random.uniform(k_flip, (V,)) < 0.5

    k_depth, k_ops, k_lv, k_sg = jax.random.split(k_chain, 4)
    depths = jax.random.randint(k_depth, (N_CHAINS, V), 1, MAX_CHAIN_DEPTH + 1)
    op_idx = jax.random.randint(k_ops, (N_CHAINS, MAX_CHAIN_DEPTH, V), 0, N_AUGMIX_OPS)
    u_level = jax.random.uniform(k_lv, (N_CHAINS, MAX_CHAIN_DEPTH, V))
    u_sign = jax.random.uniform(k_sg, (N_CHAINS, MAX_CHAIN_DEPTH, V))
    # Dirichlet(1,..,1) as normalized exponentials (same distribution, no
    # rejection while_loop) — MUST mirror data/augment.py:generate_views so
    # the parameter streams stay bit-identical under a shared key
    e_w = jax.random.exponential(k_w, (V, N_CHAINS))
    wmix = e_w / jnp.sum(e_w, axis=-1, keepdims=True)  # [V, 3]
    m = jax.random.uniform(k_m, (V,))

    # derived per-step op parameters (`augmix_ops.py` level scalings)
    level = 0.1 + u_level * (severity - 0.1)
    sign = jnp.where(u_sign > 0.5, 1.0, -1.0)
    deg = sign * jnp.floor(level * 3.0)          # int_param(level, 30)
    theta = -jnp.deg2rad(deg)
    alpha = jnp.tan(theta / 2.0)                 # 3-shear decomposition of the
    beta = -jnp.sin(theta)                       # PIL sampling rotation
    shear = sign * level * 0.03                  # float_param(level, 0.3)
    trans = sign * jnp.floor(level * (resolution / 3.0) / 10.0)
    bits = (4 - jnp.floor(level * 0.4)).astype(jnp.int32)
    pmask = (0xFF00 >> bits) & 0xFF
    sthr = 256.0 - jnp.floor(level * 25.6)

    o = op_idx
    p0 = jnp.zeros_like(level)
    p0 = jnp.where(o == 3, alpha, p0)
    p0 = jnp.where((o == 5) | (o == 6), shear, p0)
    p0 = jnp.where((o == 7) | (o == 8), trans, p0)
    p0 = jnp.where(o == 4, sthr, p0)
    p1 = jnp.where(o == 3, beta, 0.0)
    ip0 = jnp.where(o == 2, pmask, 0)

    pad_front = lambda arr, val=0: jnp.concatenate(
        [jnp.full((1,) + arr.shape[1:], val, arr.dtype), arr], axis=0
    )
    flat9 = lambda arr: arr.reshape(N_CHAINS * MAX_CHAIN_DEPTH, V).T  # [V, 9]
    if not augmix:
        depths = jnp.zeros_like(depths)
    return {
        "rrc": pad_front(jnp.stack([top, left, h, w], axis=-1).astype(jnp.float32)),  # [Vn, 4]
        "flip": pad_front(do_flip.astype(jnp.int32)),                                  # [Vn]
        "depth": pad_front(depths.T.astype(jnp.int32)),                                # [Vn, 3]
        "ops": pad_front(flat9(o).astype(jnp.int32)),                                  # [Vn, 9]
        "p0": pad_front(flat9(p0).astype(jnp.float32)),
        "p1": pad_front(flat9(p1).astype(jnp.float32)),
        "ip0": pad_front(flat9(ip0).astype(jnp.int32)),
        "wm": pad_front(wmix.astype(jnp.float32)),                                     # [Vn, 3]
        "m": pad_front(m.astype(jnp.float32), val=1.0) if augmix
             else jnp.ones((n_views,), jnp.float32),                                   # [Vn]
    }


def _bicubic_matrix(src: int, dst: int) -> jnp.ndarray:
    """[dst, src] row-weight matrix of ``jax.image.resize(method='bicubic')``.

    resize is separable and linear, so resizing the identity along one axis
    extracts the exact (antialiased Keys a=-0.5) weight matrix; the kernel
    then applies base = W @ img @ W.T for view 0.
    """
    return jax.image.resize(jnp.eye(src, dtype=jnp.float32), (dst, src), method="bicubic")


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------


def _resize_weights(start, length, flip, R: int, S: int):
    """Triangle-kernel (antialiased bilinear) interpolation matrix [R, S]
    from box scalars; ``flip`` reverses the output order (free HFlip).

    Row terms build at [R, 1] and column terms at [1, S]; only the final
    subtract/abs/max chain touches the full [R, S] plane. Per-element values
    (and therefore outputs) are bit-identical to the all-[R, S] form, but
    the VPU does ~5 full-plane passes instead of ~10 — this runs per view
    inside the kernel, twice, so it is a few % of flagship end-to-end."""
    scale = length / R
    o = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).astype(jnp.float32)
    o = jnp.where(flip > 0, (R - 1) - o, o)
    centers = start + (o + 0.5) * scale                       # [R, 1]
    src = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1).astype(jnp.float32) + 0.5
    inv = 1.0 / jnp.maximum(scale, 1.0)
    d = (src - centers) * inv                                 # [R, S]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)


def _warp_pass(x, acc_ref, shift, axis: int, max_shift: int):
    """1-D bilinear shift-blend on [3, R, R] along H (axis=1) or W (axis=2),
    accumulated into ``acc_ref``.

    ``shift`` broadcasts against [R, R]: per-row [R, 1] for axis=2, per-col
    [1, R] for axis=1. Contiguous STATIC rolls + per-tap vector weights;
    black fill via bound masks. Taps accumulate in value chunks of 5 and
    store per chunk: one long unrolled value chain keeps every tap live
    (Mosaic does not reuse stack slots — 25 live [3,R,R] taps blew the VMEM
    limit), while a store per tap pays a full acc read-modify-write each
    tap. Dynamic roll amounts (fori_loop taps) don't lower at all.
    """
    R = x.shape[axis]
    d0 = jnp.floor(shift)
    f = (shift - d0)[None]                                   # [1, ., .]
    d = jnp.clip(d0, -max_shift, max_shift).astype(jnp.int32)[None]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1], x.shape[2]), axis)
    taps = list(range(-max_shift, max_shift + 1))
    CHUNK = 5
    for c0 in range(0, len(taps), CHUNK):
        part = None
        for t in taps[c0:c0 + CHUNK]:
            w = jnp.where(d == t, 1.0 - f, 0.0) + jnp.where(d == t - 1, f, 0.0)
            srcpos = pos + t
            w = jnp.where((srcpos >= 0) & (srcpos < R), w, 0.0)
            term = w * pltpu.roll(x, (-t) % R, axis=axis)
            part = term if part is None else part + term
        acc_ref[:] = part if c0 == 0 else acc_ref[:] + part


def _equalize_plane(x):
    """PIL ImageOps.equalize on one integer-valued [R, R] plane, bit-sliced.

    x = 16*hi + lo; hist2d[h, l] (= hist[16h+l]) comes from a batched MXU
    contraction of the hi/lo one-hots; the cumulative-step LUT is built with
    16x16 triangular matmuls; the LUT gather is a second batched contraction.
    Matches `ops/image_ops.py::equalize` (same math, MXU-shaped).

    Both batched contractions run with bf16 inputs at full MXU rate and are
    still EXACT: the one-hots are 0/1, LUT entries are integers in [0, 255]
    (all bf16-representable — 8 significand bits cover ints through 256),
    and accumulation is f32 (preferred_element_type) with row sums < 2^24.
    """
    R = x.shape[0]
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    hi = jnp.floor(x * (1.0 / 16.0))
    lo = x - hi * 16.0
    i16 = jax.lax.broadcasted_iota(jnp.int32, (R, 16, R), 1).astype(f32)
    A = (hi[:, None, :] == i16).astype(bf16)                  # [r, 16, c]
    B = (lo[:, None, :] == i16).astype(bf16)
    h3 = jax.lax.dot_general(A, B, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=f32)      # [r, 16, 16]
    hist2d = jnp.sum(h3, axis=0)                              # [16, 16]

    ih = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
    il = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
    tstrict = (ih > il).astype(f32)
    rowsum = jnp.sum(hist2d, axis=1, keepdims=True)           # [16, 1]
    cum_rows = jnp.dot(tstrict, rowsum, preferred_element_type=f32)   # [16, 1]
    cum_inrow = jnp.dot(hist2d, tstrict.T, preferred_element_type=f32)  # [16,16] exclusive within-row
    cum = cum_rows + cum_inrow                                # exclusive cumsum over 16h+l

    idxm = (16 * ih + il).astype(f32)
    nz = hist2d > 0
    last_nz = jnp.max(jnp.where(nz, idxm, -1.0))
    h_last = jnp.sum(jnp.where(idxm == last_nz, hist2d, 0.0))
    n_nonzero = jnp.sum(nz.astype(f32))
    total = jnp.sum(hist2d)
    step = jnp.floor((total - h_last) / 255.0)
    lut2d = jnp.clip(jnp.floor((jnp.floor(step / 2.0) + cum) / jnp.maximum(step, 1.0)), 0.0, 255.0)
    lut2d = jnp.where((n_nonzero <= 1) | (step == 0), idxm, lut2d)

    lutb = jnp.broadcast_to(lut2d.astype(bf16)[None], (R, 16, 16))
    C = jax.lax.dot_general(lutb, B, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=f32)       # [r, 16, c]
    return jnp.sum(A.astype(f32) * C, axis=1)                 # [R, R]


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _augmix_kernel(rrc, flip, depth, ops, p0, p1, ip0, wm, m,       # SMEM scalars
                   src_ref, basew_ref,                              # VMEM in
                   out_ref,                                         # VMEM out
                   wy_s, wx_s, srcf_s, xorig_s, xaug_s, mix_s, tmp_s,  # VMEM scratch
                   *, R: int, S: int, V: int, shifts: tuple):
    n, v = pl.program_id(0), pl.program_id(1)
    idx = n * V + v
    cxy = R / 2.0

    # ---- 1. interpolation weights: bicubic base (v==0) or RRC triangle ----
    # v==0 also converts the u8 source to f32 ONCE per image (grid steps run
    # sequentially, scratch persists across them): u8 -> i32 -> f32 over
    # [3, S, S] per view was ~11% of the kernel's vector work.
    @pl.when(v == 0)
    def _():
        wy_s[:] = basew_ref[:]
        wx_s[:] = basew_ref[:]
        srcf_s[:] = src_ref[0].astype(jnp.int32).astype(jnp.float32)

    @pl.when(v > 0)
    def _():
        wy_s[:] = _resize_weights(rrc[idx, 0], rrc[idx, 2], 0, R, S)
        wx_s[:] = _resize_weights(rrc[idx, 1], rrc[idx, 3], flip[idx], R, S)

    # ---- 2. crop+resize as MXU matmuls, per channel -----------------------
    for c in range(3):
        t = jnp.dot(wy_s[:], srcf_s[c], preferred_element_type=jnp.float32)
        xorig_s[c] = jnp.dot(t, wx_s[:].T, preferred_element_type=jnp.float32)
    xorig_s[:] = jnp.clip(jnp.round(xorig_s[:]), 0.0, 255.0)

    # ---- 3. AugMix chains (all skipped when depth==0: base / augmix-off) --
    mix_s[:] = jnp.zeros_like(mix_s)
    for chain in range(N_CHAINS):
        xaug_s[:] = xorig_s[:]
        for st in range(MAX_CHAIN_DEPTH):
            s = chain * MAX_CHAIN_DEPTH + st

            @pl.when(st < depth[idx, chain])
            def _(s=s):
                _apply_op(ops[idx, s], p0[idx, s], p1[idx, s], ip0[idx, s],
                          xaug_s, tmp_s, R, cxy, shifts)
        mix_s[:] = mix_s[:] + wm[idx, chain] * xaug_s[:]

    mv = m[idx]
    final = mv * xorig_s[:] + (1.0 - mv) * mix_s[:]
    # f32 -> u8 must route through i32 (Mosaic has no direct f32->u8 cast)
    out_ref[0, 0] = jnp.clip(jnp.round(final), 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def _apply_op(op, q0, q1, qi, xaug_s, tmp_s, R: int, cxy: float, shifts: tuple):
    """One AugMix base op on the [3, R, R] scratch, dispatched by SMEM scalar.

    Ops: 0 autocontrast, 1 equalize, 2 posterize, 3 rotate (3 shears),
    4 solarize, 5/6 shear x/y, 7/8 translate x/y (`augmix_ops.py:142-145`).
    Each op quantizes its output like PIL (round). ``shifts`` is the static
    (rot_alpha, rot_beta, shear, trans) tap-window tuple of
    :func:`_op_shift_bounds` — each warp op unrolls only its own window.
    """
    ms_ra, ms_rb, ms_sh, ms_tr = shifts
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1).astype(jnp.float32)

    @pl.when(op == 0)
    def _():
        # per-channel with SCALAR reductions: a [3,1,1] keepdims reduce
        # crashes Mosaic's layout pass (implicit-dim rank check)
        for c in range(3):
            x = xaug_s[c]
            lo = jnp.min(x)
            hi = jnp.max(x)
            out = jnp.clip(jnp.floor((x - lo) * 255.0 / jnp.maximum(hi - lo, 1.0) + 1e-3), 0.0, 255.0)
            xaug_s[c] = jnp.where(hi <= lo, x, out)

    @pl.when(op == 1)
    def _():
        for c in range(3):
            xaug_s[c] = _equalize_plane(xaug_s[c])

    @pl.when(op == 2)
    def _():
        xaug_s[:] = (xaug_s[:].astype(jnp.int32) & qi).astype(jnp.float32)

    @pl.when(op == 3)
    def _():
        # three center-anchored shear passes == the PIL sampling rotation
        _warp_pass(xaug_s[:], tmp_s, q0 * (rows + 0.5 - cxy), axis=2, max_shift=ms_ra)
        _warp_pass(tmp_s[:], xaug_s, q1 * (cols + 0.5 - cxy), axis=1, max_shift=ms_rb)
        _warp_pass(xaug_s[:], tmp_s, q0 * (rows + 0.5 - cxy), axis=2, max_shift=ms_ra)
        xaug_s[:] = jnp.round(tmp_s[:])

    @pl.when(op == 4)
    def _():
        x = xaug_s[:]
        xaug_s[:] = jnp.where(x >= q0, 255.0 - x, x)

    @pl.when(op == 5)
    def _():
        _warp_pass(xaug_s[:], tmp_s, q0 * (rows + 0.5), axis=2, max_shift=ms_sh)
        xaug_s[:] = jnp.round(tmp_s[:])

    @pl.when(op == 6)
    def _():
        _warp_pass(xaug_s[:], tmp_s, q0 * (cols + 0.5), axis=1, max_shift=ms_sh)
        xaug_s[:] = jnp.round(tmp_s[:])

    @pl.when(op == 7)
    def _():
        shift = rows * 0.0 + q0  # broadcast_to of an SMEM scalar crashes layout
        _warp_pass(xaug_s[:], tmp_s, shift, axis=2, max_shift=ms_tr)
        xaug_s[:] = jnp.round(tmp_s[:])

    @pl.when(op == 8)
    def _():
        shift = cols * 0.0 + q0
        _warp_pass(xaug_s[:], tmp_s, shift, axis=1, max_shift=ms_tr)
        xaug_s[:] = jnp.round(tmp_s[:])


# ---------------------------------------------------------------------------
# Host-facing wrappers
# ---------------------------------------------------------------------------


def _fused_call(images_planar, params, basew, *, R: int, S: int, V: int,
                max_shift: int = None, shifts: tuple = None, interpret: bool):
    """pallas_call plumbing: images [N, 3, S, S] u8 + packed params -> u8 views.

    ``params`` arrays carry leading dim N*V (see ``sample_view_params``).
    Exposed separately from the samplers so tests can inject fixed op
    parameters (single-op exactness harness). Pass either per-op tap windows
    (``shifts``, see :func:`_op_shift_bounds`) or a uniform ``max_shift``.
    """
    if shifts is None:
        shifts = (max_shift,) * 4
    N = images_planar.shape[0]
    kernel = functools.partial(_augmix_kernel, R=R, S=S, V=V, shifts=shifts)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(N, V),
        in_specs=[
            pl.BlockSpec((1, 3, S, S), lambda n, v, *s: (n, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S), lambda n, v, *s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 3, R, R), lambda n, v, *s: (n, v, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((R, S), jnp.float32),      # wy
            pltpu.VMEM((R, S), jnp.float32),      # wx
            pltpu.VMEM((3, S, S), jnp.float32),   # f32 source (built at v==0)
            pltpu.VMEM((3, R, R), jnp.float32),   # xorig
            pltpu.VMEM((3, R, R), jnp.float32),   # xaug
            pltpu.VMEM((3, R, R), jnp.float32),   # mix
            pltpu.VMEM((3, R, R), jnp.float32),   # warp accumulator
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, V, 3, R, R), jnp.uint8),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        params["rrc"], params["flip"], params["depth"], params["ops"],
        params["p0"], params["p1"], params["ip0"], params["wm"], params["m"],
        images_planar, basew,
    )


def patchify_planar_u8(views, patch_size: int):
    """[N, V, 3, R, R] u8 -> patch-major tokens [N, V, (R/p)², p²·3] u8.

    Token feature order (row, col, channel) — identical to
    `models.clip.patch_tokens_from_images` / the native C++ emitter, so the
    output feeds ``PromptTTAClassifier.adapt_tokens`` unchanged. XLA-side:
    Mosaic cannot relayout the lane dimension in-kernel.
    """
    N, V, C, R, _ = views.shape
    g, p = R // patch_size, patch_size
    x = views.reshape(N, V, C, g, p, g, p)
    x = x.transpose(0, 1, 3, 5, 4, 6, 2)
    return x.reshape(N, V, g * g, p * p * C)


@functools.partial(
    jax.jit,
    static_argnames=("n_views", "resolution", "src_size", "augmix", "severity",
                     "crop_min", "max_shift", "p_policy", "p_reward", "interpret"),
)
def fused_views(images_planar, rngs, *, n_views: int, resolution: int = 224,
                src_size: int = 256, augmix: bool = True, severity: float = 1.0,
                crop_min: float = 0.08, max_shift: int = None,
                p_policy: int = 0, p_reward: int = 0, interpret: bool = False):
    """One jitted program: u8 sources -> all views, on device.

    images_planar: [N, 3, S, S] u8 canonical squares; rngs: [N] PRNG keys.
    Returns planar u8 views [N, V, 3, R, R] when ``p_policy == 0``; otherwise
    patch-major policy tokens (and reward tokens when ``p_reward > 0``) for
    ``adapt_tokens`` — matching `data.native.generate_views_native_patch_u8`'s
    contract.

    ``max_shift=None`` (the default) derives tight per-op warp tap windows
    from (severity, resolution) — bit-identical output, ~2x fewer taps at
    severity 1, and correct above severity ~1.6 where the old uniform 12
    clamped translate. An explicit ``max_shift`` forces a uniform window.
    """
    sample = functools.partial(
        sample_view_params, n_views=n_views, src_size=src_size,
        resolution=resolution, augmix=augmix, severity=severity, crop_min=crop_min,
    )
    params = jax.vmap(sample)(rngs)
    N = images_planar.shape[0]
    basew = _bicubic_matrix(src_size, resolution)
    shifts = ((max_shift,) * 4 if max_shift is not None
              else _op_shift_bounds(severity, resolution))
    # Scalar-prefetch arrays live in SMEM (~1 MB); at N*V rows they overflow
    # past ~4 images x 64 views, so launch the kernel in image chunks (the
    # calls pipeline under async dispatch — no wall-clock cost).
    chunk = max(1, 256 // n_views)
    outs = []
    for s0 in range(0, N, chunk):
        n = min(chunk, N - s0)
        p_chunk = {
            k: v[s0:s0 + n].reshape((n * n_views,) + v.shape[2:]) for k, v in params.items()
        }
        outs.append(
            _fused_call(images_planar[s0:s0 + n], p_chunk, basew, R=resolution,
                        S=src_size, V=n_views, shifts=shifts, interpret=interpret)
        )
    views = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    if p_policy == 0:
        return views
    ptoks = patchify_planar_u8(views, p_policy)
    if p_reward == 0:
        return ptoks
    return ptoks, patchify_planar_u8(views, p_reward)


def fused_available() -> bool:
    return jax.default_backend() == "tpu"


def fused_views_sharded(images_planar, rngs, mesh, **kwargs):
    """Multi-chip fused viewgen: images/rngs shard over the mesh's dp axis,
    each chip runs the kernel on its slice (episode-DP is the framework's
    first-class axis — viewgen rides the same partition as the episodes that
    consume it, so tokens come out already dp-sharded for adapt_tokens).

    ``images_planar`` [N, 3, S, S] with N divisible by dp; kwargs as
    :func:`fused_views`.
    """
    from jax.sharding import PartitionSpec as P

    dp = mesh.shape["dp"]
    if images_planar.shape[0] % dp:
        raise ValueError(
            f"fused_views_sharded: batch {images_planar.shape[0]} must tile dp={dp}"
        )
    n_out = 2 if kwargs.get("p_reward", 0) else 1
    fn = functools.partial(fused_views, **kwargs)
    spec_in = (P("dp"), P("dp"))
    spec_out = (P("dp"),) * n_out if n_out > 1 else P("dp")
    if hasattr(jax, "shard_map"):  # jax >= 0.8
        shmapped = jax.shard_map(fn, mesh=mesh, in_specs=spec_in,
                                 out_specs=spec_out, check_vma=False)
    else:
        from jax.experimental.shard_map import shard_map

        shmapped = shard_map(fn, mesh=mesh, in_specs=spec_in,
                             out_specs=spec_out, check_rep=False)
    return shmapped(images_planar, rngs)
