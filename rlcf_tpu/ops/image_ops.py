"""PIL-semantic image operations as pure JAX functions (jit/vmap-safe).

These re-implement, on device, the 9 AugMix base augmentations the reference
applies with PIL on the host (`TPT/data/augmix_ops.py:56-148`): autocontrast,
equalize, posterize, rotate, solarize, shear_x/y, translate_x/y. PIL integer
LUT semantics (truncation in autocontrast, the equalize step LUT) are
reproduced exactly on uint8-valued float arrays; geometric ops use inverse
affine maps with bilinear sampling and black fill, matching
``Image.transform(..., AFFINE, BILINEAR)`` / ``Image.rotate``.

All functions take/return float32 images in [0, 255] with shape [H, W, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.ndimage import map_coordinates


def _per_channel_lut(img, lut):
    """Apply per-channel 256-entry LUTs. img [H,W,C] float (integer-valued),
    lut [C, 256]. Gathers run channels-first over a flat spatial axis so the
    trailing dim stays large (TPU tile-padding, see affine_transform)."""
    H, W, C = img.shape
    idx = jnp.clip(img, 0, 255).astype(jnp.int32).transpose(2, 0, 1).reshape(C, H * W)
    out = jnp.take_along_axis(lut, idx, axis=1)  # [C, HW]
    return out.reshape(C, H, W).transpose(1, 2, 0).astype(img.dtype)


def autocontrast(img):
    """Per-channel min/max stretch with PIL's truncating LUT (cutoff=0)."""
    x = jnp.round(img)
    lo = jnp.min(x, axis=(0, 1))  # [C]
    hi = jnp.max(x, axis=(0, 1))
    levels = jnp.arange(256.0)[None, :]  # [1, 256]
    # (i - lo) * 255 is integer-exact in fp32; the small eps keeps exact
    # multiples from flooring down (PIL computes the LUT in doubles).
    numer = (levels - lo[:, None]) * 255.0
    denom = jnp.maximum(hi - lo, 1.0)[:, None]
    lut = jnp.floor(numer / denom + 1e-3)
    lut = jnp.clip(lut, 0, 255)
    identity = jnp.broadcast_to(jnp.arange(256.0)[None, :], lut.shape)
    lut = jnp.where((hi <= lo)[:, None], identity, lut)
    return _per_channel_lut(x, lut)


def equalize(img):
    """Per-channel histogram equalization with PIL's step LUT
    (ImageOps.equalize): lut[i] = (step//2 + cumsum_{j<i} h[j]) // step,
    step = (n_pixels - h[last nonzero bin]) // 255."""
    x = jnp.round(img)
    idx = jnp.clip(x, 0, 255).astype(jnp.int32)

    def one_channel(ch_idx):
        hist = jnp.zeros((256,), jnp.int32).at[ch_idx.reshape(-1)].add(1)
        nonzero = hist > 0
        last_nz = 255 - jnp.argmax(nonzero[::-1])
        n_nonzero = jnp.sum(nonzero)
        step = (jnp.sum(hist) - hist[last_nz]) // 255
        cum = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(hist)[:-1]])
        lut = jnp.clip((step // 2 + cum) // jnp.maximum(step, 1), 0, 255)
        identity = jnp.arange(256, dtype=lut.dtype)
        return jnp.where((n_nonzero <= 1) | (step == 0), identity, lut)

    luts = jax.vmap(one_channel, in_axes=2)(idx).astype(img.dtype)  # [C, 256]
    return _per_channel_lut(x, luts)


def posterize(img, bits):
    """Keep the top ``bits`` bits per channel (PIL ImageOps.posterize)."""
    mask = (0xFF00 >> bits) & 0xFF  # traced-ok integer ops
    return (jnp.round(img).astype(jnp.int32) & mask).astype(img.dtype)


def solarize(img, threshold):
    """Invert pixels >= threshold (PIL ImageOps.solarize)."""
    x = jnp.round(img)
    return jnp.where(x >= threshold, 255.0 - x, x).astype(img.dtype)


def affine_transform(img, matrix):
    """PIL ``Image.transform(size, AFFINE, matrix, BILINEAR)``.

    ``matrix`` = (a, b, c, d, e, f): output (x, y) samples input
    (a x + b y + c, d x + e y + f); out-of-bounds fills black.

    TPU layout note: the bilinear corners are gathered channels-first along a
    flat [H*W] axis (``take(img_cf, idx, axis=1)``). Per-channel [H, W]
    gathers (or ``map_coordinates``) leave a trailing size-1/size-3 dim that
    (8,128) tiling pads 42-128x, which OOMs when vmapped over 64-view
    augmentation batches.
    """
    H, W, C = img.shape
    a, b, c, d, e, f = matrix
    ys = jnp.arange(H, dtype=img.dtype)
    xs = jnp.arange(W, dtype=img.dtype)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    # PIL maps pixel centers: in = M @ (out + 0.5), sampled at in - 0.5.
    in_x = (a * (xx + 0.5) + b * (yy + 0.5) + c - 0.5).reshape(-1)
    in_y = (d * (xx + 0.5) + e * (yy + 0.5) + f - 0.5).reshape(-1)

    y0 = jnp.floor(in_y)
    x0 = jnp.floor(in_x)
    wy = (in_y - y0)[None, :]  # [1, HW]
    wx = (in_x - x0)[None, :]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    img_cf = img.transpose(2, 0, 1).reshape(C, H * W)  # channels-first flat

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(img_cf, flat, axis=1)  # [C, HW]
        return vals * valid[None, :].astype(img.dtype)

    top = gather(y0, x0) * (1 - wx) + gather(y0, x0 + 1) * wx
    bot = gather(y0 + 1, x0) * (1 - wx) + gather(y0 + 1, x0 + 1) * wx
    out = top * (1 - wy) + bot * wy  # [C, HW]
    return out.reshape(C, H, W).transpose(1, 2, 0)


def rotate(img, degrees):
    """PIL ``Image.rotate(degrees, BILINEAR)``: counterclockwise about the
    center, same output size, black fill."""
    H, W, _ = img.shape
    theta = -jnp.deg2rad(degrees)  # PIL's CCW convention in y-down coords
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = W / 2.0, H / 2.0
    # output (x,y) -> input coords: rotate by +theta in y-down coordinates
    a, b = cos, sin
    d, e = -sin, cos
    c = cx - cx * a - cy * b
    f = cy - cx * d - cy * e
    return affine_transform(img, (a, b, c, d, e, f))


def shear_x(img, level):
    return affine_transform(img, (1.0, level, 0.0, 0.0, 1.0, 0.0))


def shear_y(img, level):
    return affine_transform(img, (1.0, 0.0, 0.0, level, 1.0, 0.0))


def translate_x(img, pixels):
    return affine_transform(img, (1.0, 0.0, pixels, 0.0, 1.0, 0.0))


def translate_y(img, pixels):
    return affine_transform(img, (1.0, 0.0, 0.0, 0.0, 1.0, pixels))


def hflip(img):
    return img[:, ::-1, :]


def crop_and_resize(img, top, left, height, width, out_size: int, method: str = "bilinear"):
    """Crop box (possibly fractional) then resize to [out_size, out_size].

    Implemented with ``jax.image.scale_and_translate`` so the whole
    RandomResizedCrop is one fused gather — the torchvision
    ``resized_crop(..., InterpolationMode.BILINEAR)`` equivalent.
    """
    H, W, C = img.shape
    scale_y = out_size / height
    scale_x = out_size / width
    # output coord o maps to input: (o + 0.5)/scale - 0.5 + top
    # scale_and_translate: in = (o - t)/s  => t chosen to align
    ty = -(top) * scale_y
    tx = -(left) * scale_x
    return jax.image.scale_and_translate(
        img,
        (out_size, out_size, C),
        (0, 1),
        jnp.asarray([scale_y, scale_x], img.dtype),
        jnp.asarray([ty, tx], img.dtype),
        method=method,
    )
