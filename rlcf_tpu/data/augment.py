"""TPU-native AugMix view generation: the 64-view augmentation stack on device.

Replaces the reference's host-side PIL pipeline (`TPT/data/datautils.py:75-128`
+ `augmix_ops.py`), which is the reference's throughput bottleneck (DataLoader
workers doing PIL ops per view). Here the host only decodes each test image to
a fixed canonical square (default 256x256 uint8); everything else — the
``RandomResizedCrop + HFlip`` pre-augment, the 3-chain AugMix with
Dirichlet/Beta mixing, and CLIP normalization — runs as one jitted, vmapped
program on device.

Distributional parity notes (sample-exact parity with PyTorch RNG is
impossible; the reference itself reshuffles per run):
- op parameter distributions follow `augmix_ops.py` exactly: level ~ U(0.1, s),
  int/float_parameter scalings, 50% sign flips;
- chain depth ~ uniform{1,2,3}, ops uniform over the 9-op set, weights ~
  Dirichlet(1,1,1), m ~ Beta(1,1) (`datautils.py:94-110`);
- RandomResizedCrop follows torchvision's 10-attempt area/ratio sampler with
  center-crop fallback, applied to the canonical square rather than the
  original-resolution image.

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


def _int_param(level, maxval):
    return jnp.floor(level * maxval / 10.0)


def _float_param(level, maxval):
    return level * maxval / 10.0


def _apply_op(img, op_idx, u_level, u_sign, severity, image_size):
    """Apply one of the 9 AugMix ops selected by ``op_idx``.

    ``u_level``/``u_sign`` are U(0,1) draws; level = U(0.1, severity) as in
    ``sample_level`` (`augmix_ops.py:52-53`).
    """
    level = 0.1 + u_level * (severity - 0.1)
    sign = jnp.where(u_sign > 0.5, 1.0, -1.0)

    branches = [
        lambda im: ops.autocontrast(im),
        lambda im: ops.equalize(im),
        lambda im: ops.posterize(im, 4 - _int_param(level, 4).astype(jnp.int32)),
        lambda im: ops.rotate(im, sign * _int_param(level, 30)),
        lambda im: ops.solarize(im, 256.0 - _int_param(level, 256)),
        lambda im: ops.shear_x(im, sign * _float_param(level, 0.3)),
        lambda im: ops.shear_y(im, sign * _float_param(level, 0.3)),
        lambda im: ops.translate_x(im, sign * _int_param(level, image_size / 3.0)),
        lambda im: ops.translate_y(im, sign * _int_param(level, image_size / 3.0)),
    ]
    return jax.lax.switch(op_idx, branches, img)


def _augmix_chains(img, rng, severity: float, image_size: int):
    """3 chains of 1-3 random ops -> Dirichlet-weighted sum (`datautils.py:94-110`)."""
    k_w, k_depth, k_ops, k_lv, k_sg = jax.random.split(rng, 5)
    w = jax.random.dirichlet(k_w, jnp.ones((N_CHAINS,)))
    depths = jax.random.randint(k_depth, (N_CHAINS,), 1, MAX_CHAIN_DEPTH + 1)
    op_idx = jax.random.randint(k_ops, (N_CHAINS, MAX_CHAIN_DEPTH), 0, N_AUGMIX_OPS)
    u_level = jax.random.uniform(k_lv, (N_CHAINS, MAX_CHAIN_DEPTH))
    u_sign = jax.random.uniform(k_sg, (N_CHAINS, MAX_CHAIN_DEPTH))

    def one_chain(chain):
        def body(step, im):
            out = _apply_op(im, op_idx[chain, step], u_level[chain, step], u_sign[chain, step], severity, image_size)
            return jnp.where(step < depths[chain], out, im)

        return jax.lax.fori_loop(0, MAX_CHAIN_DEPTH, body, img)

    mix = jnp.zeros_like(img)
    for chain in range(N_CHAINS):
        mix = mix + w[chain] * one_chain(chain)
    return mix


def random_resized_crop(img, rng, out_size: int, scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """torchvision RandomResizedCrop: 10 area/ratio attempts, center fallback."""
    H, W = img.shape[0], img.shape[1]
    area = H * W
    k_area, k_ratio, k_top, k_left = jax.random.split(rng, 4)
    n = 10
    target_area = jax.random.uniform(k_area, (n,), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        k_ratio, (n,), minval=np.log(ratio[0]), maxval=np.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    ws = jnp.sqrt(target_area * aspect)
    hs = jnp.sqrt(target_area / aspect)
    valid = (ws <= W) & (hs <= H) & (ws > 0) & (hs > 0)
    first = jnp.argmax(valid)  # first valid attempt (or 0 if none)
    any_valid = jnp.any(valid)
    w = ws[first]
    h = hs[first]
    # integer crop geometry like torchvision
    w = jnp.floor(w)
    h = jnp.floor(h)
    u_top = jax.random.uniform(k_top)
    u_left = jax.random.uniform(k_left)
    top = jnp.floor(u_top * (H - h + 1))
    left = jnp.floor(u_left * (W - w + 1))
    # fallback: central crop at clamped aspect
    in_ratio = W / H
    fb_w = jnp.where(in_ratio < ratio[0], W, jnp.where(in_ratio > ratio[1], jnp.round(H * ratio[1]), W))
    fb_h = jnp.where(in_ratio < ratio[0], jnp.round(W / ratio[0]), jnp.where(in_ratio > ratio[1], H, H))
    fb_top = jnp.round((H - fb_h) / 2.0)
    fb_left = jnp.round((W - fb_w) / 2.0)
    top = jnp.where(any_valid, top, fb_top)
    left = jnp.where(any_valid, left, fb_left)
    h = jnp.where(any_valid, h, fb_h)
    w = jnp.where(any_valid, w, fb_w)
    return ops.crop_and_resize(img, top, left, h, w, out_size, method="bilinear")


def _normalize(img01):
    return (img01 - CLIP_MEAN) / CLIP_STD


def generate_views(
    image: jnp.ndarray,
    rng: jax.Array,
    n_views: int,
    resolution: int = 224,
    augmix: bool = True,
    severity: float = 1.0,
    crop_min: float = 0.08,
):
    """One test image -> [n_views, R, R, 3] normalized views.

    ``image``: canonical uint8/float square [S, S, 3] (host-decoded).
    View 0 = resize-only base view; views 1.. = RandomResizedCrop + HFlip,
    optionally AugMix-mixed with the Beta/Dirichlet recipe.
    """
    img = image.astype(jnp.float32)
    base = jax.image.resize(img, (resolution, resolution, 3), method="bicubic")
    base = jnp.clip(base, 0.0, 255.0)

    def one_view(key):
        k_crop, k_flip, k_mix, k_m = jax.random.split(key, 4)
        x_orig = random_resized_crop(img, k_crop, resolution, scale=(crop_min, 1.0))
        x_orig = jnp.clip(x_orig, 0.0, 255.0)
        do_flip = jax.random.uniform(k_flip) < 0.5
        x_orig = jnp.where(do_flip, ops.hflip(x_orig), x_orig)
        if not augmix:
            return _normalize(x_orig / 255.0)
        mix = _augmix_chains(x_orig, k_mix, severity, resolution)
        m = jax.random.uniform(k_m)  # Beta(1,1)
        mixed = m * x_orig + (1.0 - m) * mix
        return _normalize(mixed / 255.0)

    keys = jax.random.split(rng, n_views - 1)
    # lax.map (chunked) bounds peak memory: a full vmap over 63 views of
    # gather-heavy augmentation graphs blows past HBM at 224x224.
    views = jax.lax.map(one_view, keys, batch_size=8)
    return jnp.concatenate([_normalize(base / 255.0)[None], views], axis=0)


def make_view_generator(n_views: int, resolution: int = 224, augmix: bool = True, severity: float = 1.0, crop_min: float = 0.08):
    """Jitted batched generator: (images [N,S,S,3], rngs [N]) -> [N,B,R,R,3]."""
    gen = functools.partial(
        generate_views, n_views=n_views, resolution=resolution, augmix=augmix, severity=severity, crop_min=crop_min
    )
    return jax.jit(jax.vmap(gen))
