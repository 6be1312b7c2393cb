"""TPU-native AugMix view generation: the 64-view augmentation stack on device.

Replaces the reference's host-side PIL pipeline (`TPT/data/datautils.py:75-128`
+ `augmix_ops.py`), which is the reference's throughput bottleneck (DataLoader
workers doing PIL ops per view). Here the host only decodes each test image to
a fixed canonical square (default 256x256 uint8); everything else — the
``RandomResizedCrop + HFlip`` pre-augment, the 3-chain AugMix with
Dirichlet/Beta mixing, and CLIP normalization — runs as one jitted program on
device, fully batched over views:

- RandomResizedCrop = two interpolation-matrix einsums (MXU), batched over
  the per-view crop boxes;
- each AugMix chain step = ONE fused Pallas shift-blend warp over the whole
  view batch (matrix selected per view; identity for pixel ops) + closed-form
  batched pixel transforms selected per view — no divergent `lax.switch`
  (whose all-branch predication measured a 9x blowup) and no HBM round trips
  inside the warp;
- every op output is uint8-quantized like each PIL op in the reference chain.

Distributional parity notes (sample-exact parity with PyTorch RNG is
impossible; the reference itself reshuffles per run):
- op parameter distributions follow `augmix_ops.py` exactly: level ~ U(0.1, s),
  int/float_parameter scalings, 50% sign flips;
- chain depth ~ uniform{1,2,3}, ops uniform over the 9-op set, weights ~
  Dirichlet(1,1,1), m ~ Beta(1,1) (`datautils.py:94-110`);
- RandomResizedCrop follows torchvision's 10-attempt area/ratio sampler with
  center-crop fallback, applied to the canonical square;
- rotations use a separable shift-blend warp exact to <=0.3 px at AugMix
  severities (planar roll+select passes; arbitrary-index gathers are 10-50x
  slower on TPU).

View 0 is the un-augmented base view (`datautils.py:125-128`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import image_ops as ops
from .transforms import CLIP_MEAN, CLIP_STD

N_AUGMIX_OPS = 9
MAX_CHAIN_DEPTH = 3
N_CHAINS = 3
WARP_MAX_SHIFT = 12


def _int_param(level, maxval):
    return jnp.floor(level * maxval / 10.0)


def _float_param(level, maxval):
    return level * maxval / 10.0


# ---------------------------------------------------------------------------
# Batched RandomResizedCrop (torchvision sampler + matmul resize)
# ---------------------------------------------------------------------------


def _rrc_boxes(rng, n: int, H: int, W: int, scale, ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """Sample [n] crop boxes (top, left, h, w) with 10 attempts + fallback."""
    k_area, k_ratio, k_top, k_left = jax.random.split(rng, 4)
    attempts = 10
    area = H * W
    ta = jax.random.uniform(k_area, (n, attempts), minval=scale[0], maxval=scale[1]) * area
    lr = jax.random.uniform(k_ratio, (n, attempts), minval=np.log(ratio[0]), maxval=np.log(ratio[1]))
    aspect = jnp.exp(lr)
    ws = jnp.floor(jnp.sqrt(ta * aspect))
    hs = jnp.floor(jnp.sqrt(ta / aspect))
    valid = (ws <= W) & (hs <= H) & (ws > 0) & (hs > 0)
    first = jnp.argmax(valid, axis=1)  # [n]
    any_valid = jnp.any(valid, axis=1)
    take = lambda arr: jnp.take_along_axis(arr, first[:, None], axis=1)[:, 0]
    w = take(ws)
    h = take(hs)
    u_top = jax.random.uniform(k_top, (n,))
    u_left = jax.random.uniform(k_left, (n,))
    top = jnp.floor(u_top * (H - h + 1))
    left = jnp.floor(u_left * (W - w + 1))
    # fallback: clamped-aspect center crop
    in_ratio = W / H
    fb_w = jnp.where(in_ratio < ratio[0], float(W), jnp.where(in_ratio > ratio[1], round(H * ratio[1]), float(W)))
    fb_h = jnp.where(in_ratio < ratio[0], round(W / ratio[0]), float(H))
    fb_top = jnp.round((H - fb_h) / 2.0)
    fb_left = jnp.round((W - fb_w) / 2.0)
    top = jnp.where(any_valid, top, fb_top)
    left = jnp.where(any_valid, left, fb_left)
    h = jnp.where(any_valid, h, fb_h)
    w = jnp.where(any_valid, w, fb_w)
    return top, left, h, w


def _batched_resize_weights(src_size: int, out_size: int, start, length, dtype):
    """[n, out, src] triangle-kernel interpolation matrices (antialiased)."""
    n = start.shape[0]
    scale = length / out_size  # [n]
    centers = start[:, None] + (jnp.arange(out_size, dtype=dtype)[None, :] + 0.5) * scale[:, None]
    src = jnp.arange(src_size, dtype=dtype)[None, None, :] + 0.5
    inv = 1.0 / jnp.maximum(scale, 1.0)
    d = (src - centers[..., None]) * inv[:, None, None]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)


def batched_random_resized_crop(imgs_or_img, rng, n: int, out_size: int, scale=(0.08, 1.0)):
    """n crops of one image (or per-view images) -> [n, out, out, 3] (NHWC)."""
    img = imgs_or_img
    planar = img.transpose(2, 0, 1) if img.ndim == 3 else img.transpose(0, 3, 1, 2)
    out = batched_random_resized_crop_planar(planar, rng, n, out_size, scale)
    return out.transpose(0, 2, 3, 1)


def batched_random_resized_crop_planar(planar, rng, n: int, out_size: int, scale=(0.08, 1.0)):
    """Planar variant: img [C, H, W] (or [n, C, H, W]) -> [n, C, out, out]."""
    H, W = planar.shape[-2], planar.shape[-1]
    top, left, h, w = _rrc_boxes(rng, n, H, W, scale)
    wy = _batched_resize_weights(H, out_size, top, h, planar.dtype)  # [n, out, H]
    wx = _batched_resize_weights(W, out_size, left, w, planar.dtype)  # [n, out, W]
    if planar.ndim == 3:
        tmp = jnp.einsum("noh,chw->ncow", wy, planar, preferred_element_type=jnp.float32)
    else:
        tmp = jnp.einsum("noh,nchw->ncow", wy, planar, preferred_element_type=jnp.float32)
    return jnp.einsum("npw,ncow->ncop", wx, tmp, preferred_element_type=jnp.float32).astype(planar.dtype)


# ---------------------------------------------------------------------------
# Batched AugMix chain step
# ---------------------------------------------------------------------------


def _batched_affine_coords(mats, H: int, W: int):
    """Per-view sampling coordinates from matrices [V, 6] (PIL half-pixel)."""
    dtype = mats.dtype
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij")
    a, b, c = mats[:, 0, None, None], mats[:, 1, None, None], mats[:, 2, None, None]
    d, e, f = mats[:, 3, None, None], mats[:, 4, None, None], mats[:, 5, None, None]
    in_x = a * (xx + 0.5)[None] + b * (yy + 0.5)[None] + c - 0.5
    in_y = d * (xx + 0.5)[None] + e * (yy + 0.5)[None] + f - 0.5
    return in_x, in_y


def _apply_op_batched(imgs, op_idx, u_level, u_sign, severity, image_size: int):
    """One AugMix chain step over the whole view batch.

    imgs [V, C, H, W] (channel-planar — C-minor layouts suffer 42x TPU tile
    padding); op_idx/u_level/u_sign [V]. One shared warp (matrix per view;
    identity for pixel ops) + batched closed-form pixel ops.
    """
    V, C, H, W = imgs.shape
    level = 0.1 + u_level * (severity - 0.1)
    sign = jnp.where(u_sign > 0.5, 1.0, -1.0)

    deg = sign * _int_param(level, 30)
    theta = -jnp.deg2rad(deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx = cy = image_size / 2.0
    shear = sign * _float_param(level, 0.3)
    trans = sign * _int_param(level, image_size / 3.0)
    zero = jnp.zeros_like(level)
    one = jnp.ones_like(level)
    eye = jnp.stack([one, zero, zero, zero, one, zero], axis=-1)  # [V, 6]
    rot = jnp.stack([cos, sin, cx - cx * cos - cy * sin, -sin, cos, cy + cx * sin - cy * cos], axis=-1)
    shx = jnp.stack([one, shear, zero, zero, one, zero], axis=-1)
    shy = jnp.stack([one, zero, zero, shear, one, zero], axis=-1)
    trx = jnp.stack([one, zero, trans, zero, one, zero], axis=-1)
    try_ = jnp.stack([one, zero, zero, zero, one, trans], axis=-1)
    mats = eye
    mats = jnp.where((op_idx == 3)[:, None], rot, mats)
    mats = jnp.where((op_idx == 5)[:, None], shx, mats)
    mats = jnp.where((op_idx == 6)[:, None], shy, mats)
    mats = jnp.where((op_idx == 7)[:, None], trx, mats)
    mats = jnp.where((op_idx == 8)[:, None], try_, mats)

    in_x, in_y = _batched_affine_coords(mats.astype(imgs.dtype), H, W)
    dx = jnp.clip(
        jnp.floor(in_x).astype(jnp.int32) - jnp.arange(W, dtype=jnp.int32)[None, None, :],
        -WARP_MAX_SHIFT, WARP_MAX_SHIFT,
    )[:, None]
    fxv = (in_x - jnp.floor(in_x))[:, None].astype(imgs.dtype)
    dy = jnp.clip(
        jnp.floor(in_y).astype(jnp.int32) - jnp.arange(H, dtype=jnp.int32)[None, :, None],
        -WARP_MAX_SHIFT, WARP_MAX_SHIFT,
    )[:, None]
    fyv = (in_y - jnp.floor(in_y))[:, None].astype(imgs.dtype)
    h = _planar_shift_blend(imgs, dx, fxv, WARP_MAX_SHIFT, axis=3)
    warped = _planar_shift_blend(h, dy, fyv, WARP_MAX_SHIFT, axis=2)
    x = jnp.round(warped)  # PIL quantizes after every op

    # pixel ops (batched closed forms, selected per view)
    sel = lambda o: (op_idx == o)[:, None, None, None]
    lo = jnp.min(x, axis=(2, 3), keepdims=True)
    hi = jnp.max(x, axis=(2, 3), keepdims=True)
    auto = jnp.clip(jnp.floor((x - lo) * 255.0 / jnp.maximum(hi - lo, 1.0) + 1e-3), 0, 255)
    auto = jnp.where(hi <= lo, x, auto)
    eq = _planar_equalize(x)
    bits = (4 - _int_param(level, 4)).astype(jnp.int32)
    mask = ((0xFF00 >> bits) & 0xFF)[:, None, None, None]
    post = (x.astype(jnp.int32) & mask).astype(x.dtype)
    sol_t = (256.0 - _int_param(level, 256))[:, None, None, None]
    sol = jnp.where(x >= sol_t, 255.0 - x, x)

    out = jnp.where(sel(0), auto, x)
    out = jnp.where(sel(1), eq, out)
    out = jnp.where(sel(2), post, out)
    out = jnp.where(sel(4), sol, out)
    return out


def _planar_shift_blend(x, delta, frac, bound: int, axis: int):
    """Shift-blend over [V, C, H, W] along H (axis=2) or W (axis=3)."""
    out = jnp.zeros_like(x)
    size = x.shape[axis]
    pos_shape = (1, 1, x.shape[2], x.shape[3])
    pos = jax.lax.broadcasted_iota(jnp.int32, pos_shape, axis)
    for d in range(-bound, bound + 1):
        w = jnp.where(delta == d, 1.0 - frac, 0.0) + jnp.where(delta == d - 1, frac, 0.0)
        src = pos + d
        w = jnp.where((src >= 0) & (src < size), w, 0.0)
        out = out + w.astype(x.dtype) * jnp.roll(x, -d, axis=axis)
    return out


def _planar_equalize(x):
    """Batched PIL equalize over [V, C, H, W] (see image_ops.equalize_luts)."""
    V, C, H, W = x.shape
    idx = jnp.clip(x, 0, 255).astype(jnp.int32).reshape(V * C, H * W)
    hist = jnp.sum(
        (idx[:, :, None] == jnp.arange(256, dtype=jnp.int32)[None, None, :]).astype(jnp.int32), axis=1
    )  # [VC, 256]
    nonzero = hist > 0
    last_nz = 255 - jnp.argmax(nonzero[:, ::-1], axis=1)
    n_nonzero = jnp.sum(nonzero, axis=1)
    total = jnp.sum(hist, axis=1)
    h_last = jnp.take_along_axis(hist, last_nz[:, None], axis=1)[:, 0]
    step = (total - h_last) // 255
    cum = jnp.concatenate([jnp.zeros((V * C, 1), jnp.int32), jnp.cumsum(hist, axis=1)[:, :-1]], axis=1)
    lut = jnp.clip((step[:, None] // 2 + cum) // jnp.maximum(step[:, None], 1), 0, 255)
    identity = jnp.arange(256, dtype=lut.dtype)[None, :]
    lut = jnp.where(((n_nonzero <= 1) | (step == 0))[:, None], identity, lut)
    # flat gather: idx offset by row
    flat_idx = (idx + jnp.arange(V * C, dtype=jnp.int32)[:, None] * 256).reshape(-1)
    out = jnp.take(lut.reshape(-1), flat_idx)
    return out.reshape(V, C, H, W).astype(x.dtype)


def _normalize(img01):
    return (img01 - CLIP_MEAN) / CLIP_STD


# ---------------------------------------------------------------------------
# Hard (BYOL-style) pre-augmentation (`datautils.py:76-91`), planar batched
# ---------------------------------------------------------------------------


def _hard_aug_batched(x, rng):
    """ColorJitter(0.4,0.4,0.2,0.1) p=0.5, grayscale p=0.2, blur(3) p=0.1.

    x [V, 3, H, W] in [0,255]. Hue shift uses the standard YIQ rotation
    (distributional, not PIL-exact — documented deviation).
    """
    V = x.shape[0]
    ks = jax.random.split(rng, 9)
    x01 = x / 255.0

    # color jitter (applied in fixed order brightness/contrast/saturation/hue)
    do_jit = (jax.random.uniform(ks[0], (V,)) < 0.5)[:, None, None, None]
    b = jax.random.uniform(ks[1], (V,), minval=0.6, maxval=1.4)[:, None, None, None]
    c = jax.random.uniform(ks[2], (V,), minval=0.6, maxval=1.4)[:, None, None, None]
    s = jax.random.uniform(ks[3], (V,), minval=0.8, maxval=1.2)[:, None, None, None]
    h = jax.random.uniform(ks[4], (V,), minval=-0.1, maxval=0.1) * 2.0 * np.pi

    j = x01 * b
    mean = jnp.mean(j, axis=(1, 2, 3), keepdims=True)
    j = (j - mean) * c + mean
    lum = (0.299 * j[:, 0] + 0.587 * j[:, 1] + 0.114 * j[:, 2])[:, None]
    j = (j - lum) * s + lum
    cos_h = jnp.cos(h)[:, None, None, None]
    sin_h = jnp.sin(h)[:, None, None, None]
    # YIQ hue rotation
    yy = 0.299 * j[:, 0] + 0.587 * j[:, 1] + 0.114 * j[:, 2]
    ii = 0.596 * j[:, 0] - 0.274 * j[:, 1] - 0.322 * j[:, 2]
    qq = 0.211 * j[:, 0] - 0.523 * j[:, 1] + 0.312 * j[:, 2]
    ii2 = ii * cos_h[:, 0] - qq * sin_h[:, 0]
    qq2 = ii * sin_h[:, 0] + qq * cos_h[:, 0]
    r = yy + 0.956 * ii2 + 0.621 * qq2
    g = yy - 0.272 * ii2 - 0.647 * qq2
    bl = yy - 1.106 * ii2 + 1.703 * qq2
    j = jnp.stack([r, g, bl], axis=1)
    x01 = jnp.where(do_jit, jnp.clip(j, 0.0, 1.0), x01)

    # grayscale p=0.2
    do_gray = (jax.random.uniform(ks[5], (V,)) < 0.2)[:, None, None, None]
    gray = (0.299 * x01[:, 0] + 0.587 * x01[:, 1] + 0.114 * x01[:, 2])[:, None]
    x01 = jnp.where(do_gray, jnp.broadcast_to(gray, x01.shape), x01)

    # gaussian blur kernel-3 p=0.1, sigma ~ U(0.1, 2.0)
    do_blur = (jax.random.uniform(ks[6], (V,)) < 0.1)[:, None, None, None]
    sigma = jax.random.uniform(ks[7], (V,), minval=0.1, maxval=2.0)
    w1 = jnp.exp(-0.5 / jnp.maximum(sigma, 1e-3) ** 2)  # [V]
    k0 = 1.0 / (1.0 + 2.0 * w1)
    k1 = (w1 * k0)[:, None, None, None]
    k0 = k0[:, None, None, None]
    blur_h = k0 * x01 + k1 * (jnp.roll(x01, 1, axis=3) + jnp.roll(x01, -1, axis=3))
    blur = k0 * blur_h + k1 * (jnp.roll(blur_h, 1, axis=2) + jnp.roll(blur_h, -1, axis=2))
    x01 = jnp.where(do_blur, blur, x01)
    return jnp.clip(jnp.round(x01 * 255.0), 0.0, 255.0)


def generate_views(
    image: jnp.ndarray,
    rng: jax.Array,
    n_views: int,
    resolution: int = 224,
    augmix: bool = True,
    severity: float = 1.0,
    crop_min: float = 0.08,
    hard_aug: bool = False,
):
    """One test image -> [n_views, R, R, 3] normalized views.

    ``image``: canonical uint8/float square [S, S, 3] (host-decoded).
    View 0 = resize-only base view; views 1.. = RandomResizedCrop + HFlip
    (``hard_aug`` adds the BYOL jitter/gray/blur recipe with crop_min=0.2,
    `datautils.py:76-91`), optionally AugMix-mixed with the Beta/Dirichlet
    recipe.
    """
    if hard_aug:
        crop_min = max(crop_min, 0.2)
    img = image.astype(jnp.float32)
    V = n_views - 1
    planar = img.transpose(2, 0, 1)  # [3, S, S] — C-minor layouts tile-pad 42x
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)[:, None, None]
    std = jnp.asarray(CLIP_STD, jnp.float32)[:, None, None]
    norm = lambda x255: (x255 / 255.0 - mean) / std

    base = jax.image.resize(planar, (3, resolution, resolution), method="bicubic")
    base = jnp.clip(base, 0.0, 255.0)

    k_crop, k_flip, k_chain, k_m, k_w, k_hard = jax.random.split(rng, 6)
    x_orig = batched_random_resized_crop_planar(planar, k_crop, V, resolution, scale=(crop_min, 1.0))
    x_orig = jnp.clip(jnp.round(x_orig), 0.0, 255.0)  # [V, 3, R, R]
    if hard_aug:
        x_orig = _hard_aug_batched(x_orig, k_hard)
    do_flip = jax.random.uniform(k_flip, (V,)) < 0.5
    x_orig = jnp.where(do_flip[:, None, None, None], x_orig[:, :, :, ::-1], x_orig)

    if not augmix:
        views = norm(x_orig)
    else:
        k_depth, k_ops, k_lv, k_sg = jax.random.split(k_chain, 4)
        depths = jax.random.randint(k_depth, (N_CHAINS, V), 1, MAX_CHAIN_DEPTH + 1)
        op_idx = jax.random.randint(k_ops, (N_CHAINS, MAX_CHAIN_DEPTH, V), 0, N_AUGMIX_OPS)
        u_level = jax.random.uniform(k_lv, (N_CHAINS, MAX_CHAIN_DEPTH, V))
        u_sign = jax.random.uniform(k_sg, (N_CHAINS, MAX_CHAIN_DEPTH, V))
        # Dirichlet(1,..,1) == normalized exponentials — identical distribution
        # to jax.random.dirichlet but no rejection-sampling while_loop (which
        # reads ~ms on VPU-weak parts); stream shared with the fused kernel
        e = jax.random.exponential(k_w, (V, N_CHAINS))
        w = e / jnp.sum(e, axis=-1, keepdims=True)  # [V, 3]
        m = jax.random.uniform(k_m, (V,))

        mix = jnp.zeros_like(x_orig)
        for chain in range(N_CHAINS):
            x_aug = x_orig
            for step in range(MAX_CHAIN_DEPTH):
                stepped = _apply_op_batched(
                    x_aug, op_idx[chain, step], u_level[chain, step], u_sign[chain, step],
                    severity, resolution,
                )
                active = (step < depths[chain])[:, None, None, None]
                x_aug = jnp.where(active, stepped, x_aug)
            mix = mix + w[:, chain][:, None, None, None] * norm(x_aug)
        views = m[:, None, None, None] * norm(x_orig) + (1.0 - m)[:, None, None, None] * mix

    out = jnp.concatenate([norm(base)[None], views], axis=0)  # [n_views, 3, R, R]
    return out.transpose(0, 2, 3, 1)  # NHWC once, at the boundary


def random_resized_crop(img, rng, out_size: int, scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """Single-image RandomResizedCrop (kept for tests/host parity checks)."""
    return batched_random_resized_crop(img, rng, 1, out_size, scale)[0]


def make_view_generator(
    n_views: int, resolution: int = 224, augmix: bool = True, severity: float = 1.0,
    crop_min: float = 0.08, hard_aug: bool = False,
):
    """Jitted batched generator: (images [N,S,S,3], rngs [N]) -> [N,B,R,R,3]."""
    gen = functools.partial(
        generate_views, n_views=n_views, resolution=resolution, augmix=augmix,
        severity=severity, crop_min=crop_min, hard_aug=hard_aug,
    )
    return jax.jit(jax.vmap(gen))
