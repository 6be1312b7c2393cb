"""Pallas TPU kernel: fused two-pass shift-blend affine warp.

The AugMix geometric ops reduce to a bilinear warp with per-pixel integer
shifts in a static ±``max_shift`` window (see
``image_ops.affine_transform_fast``). The XLA formulation round-trips HBM for
each of the ~50 roll+select+add passes; this kernel keeps the whole image in
VMEM — one HBM read of the inputs, one write of the output, all blending
on-chip.

Layout: channel-planar [C*H, W] per view; vertical rolls that cross channel
boundaries are killed by the per-channel validity masks. Grid = one program
per view.

Falls back to the XLA path automatically off-TPU (CPU tests use
``interpret=True``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(img_ref, dx_ref, fx_ref, dy_ref, fy_ref, out_ref, *, max_shift: int):
    """One (view, channel) block: img [1, 1, H, W]; dx/fx/dy/fy [1, H, W]."""
    H, W = img_ref.shape[-2], img_ref.shape[-1]
    x = img_ref[0, 0]
    dx = dx_ref[0]
    fx = fx_ref[0].astype(x.dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    # horizontal pass
    acc = jnp.zeros_like(x)
    for d in range(-max_shift, max_shift + 1):
        w = jnp.where(dx == d, 1.0 - fx, 0.0) + jnp.where(dx == d - 1, fx, 0.0)
        src = col + d
        w = jnp.where((src >= 0) & (src < W), w, 0.0)
        acc = acc + w.astype(x.dtype) * pltpu.roll(x, (-d) % W, axis=1)

    # vertical pass
    dy = dy_ref[0]
    fy = fy_ref[0].astype(x.dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    acc2 = jnp.zeros_like(acc)
    for d in range(-max_shift, max_shift + 1):
        w = jnp.where(dy == d, 1.0 - fy, 0.0) + jnp.where(dy == d - 1, fy, 0.0)
        src = row + d
        w = jnp.where((src >= 0) & (src < H), w, 0.0)
        acc2 = acc2 + w.astype(acc.dtype) * pltpu.roll(acc, (-d) % H, axis=0)
    out_ref[0, 0] = acc2


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def shift_blend_warp_planar(planar, in_x, in_y, max_shift: int = 12, interpret: bool = False):
    """Batched fused warp on channel-planar images.

    planar [B, C, H, W]; in_x/in_y [B, H, W] sampling coordinates (pixel-index
    space, PIL half-pixel convention already applied). Returns [B, C, H, W]
    with black fill. Planar layout keeps the lane dimension wide (W), dodging
    the 42x (8,128)-tile padding that C-minor layouts suffer.
    """
    B, C, H, W = planar.shape
    images = planar  # dtype source

    x0 = jnp.floor(in_x)
    fx = (in_x - x0).astype(images.dtype)
    dx = jnp.clip(
        x0.astype(jnp.int32) - jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2), -max_shift, max_shift
    )
    y0 = jnp.floor(in_y)
    fy = (in_y - y0).astype(images.dtype)
    dy = jnp.clip(
        y0.astype(jnp.int32) - jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1), -max_shift, max_shift
    )

    kernel = functools.partial(_warp_kernel, max_shift=max_shift)
    coord_spec = pl.BlockSpec((1, H, W), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, C),
        in_specs=[
            pl.BlockSpec((1, 1, H, W), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM),
            coord_spec,
            coord_spec,
            coord_spec,
            coord_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, H, W), lambda b, c: (b, c, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), images.dtype),
        interpret=interpret,
    )(planar, dx, fx, dy, fy)
    return out


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def shift_blend_warp_pallas(images, in_x, in_y, max_shift: int = 12, interpret: bool = False):
    """NHWC convenience wrapper around :func:`shift_blend_warp_planar`."""
    planar = images.transpose(0, 3, 1, 2)
    out = shift_blend_warp_planar(planar, in_x, in_y, max_shift=max_shift, interpret=interpret)
    return out.transpose(0, 2, 3, 1)


def warp_available() -> bool:
    import jax

    return jax.default_backend() == "tpu"
