"""Fast shift-blend warp vs exact warp in the AugMix severity regime."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlcf_tpu.ops import image_ops as ops

rng = np.random.default_rng(3)
IMG = jnp.asarray(rng.integers(0, 256, size=(64, 64, 3)).astype(np.float32))


@pytest.mark.parametrize(
    "matrix",
    [
        (1.0, 0.02, 0.0, 0.0, 1.0, 0.0),  # shear_x at severity-1 scale
        (1.0, 0.0, 0.0, 0.025, 1.0, 0.0),  # shear_y
        (1.0, 0.0, 5.0, 0.0, 1.0, 0.0),  # translate_x
        (1.0, 0.0, 0.0, 0.0, 1.0, -6.0),  # translate_y
    ],
)
@pytest.mark.slow
def test_fast_warp_exact_for_separable_affines(matrix):
    exact = np.asarray(ops.affine_transform(IMG, matrix))
    fast = np.asarray(ops.affine_transform_fast(IMG, matrix))
    np.testing.assert_allclose(fast, exact, atol=1e-3)


def test_fast_warp_close_for_small_rotation():
    deg = 2.0
    theta = -np.deg2rad(deg)
    c, s = np.cos(theta), np.sin(theta)
    cx = cy = 32.0
    matrix = (c, s, cx - cx * c - cy * s, -s, c, cy + cx * s - cy * c)
    exact = np.asarray(ops.affine_transform(IMG, matrix))
    fast = np.asarray(ops.affine_transform_fast(IMG, matrix))
    interior = np.abs(fast[4:-4, 4:-4] - exact[4:-4, 4:-4])
    assert np.median(interior) < 2.0


def test_fast_warp_identity():
    eye = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)
    out = np.asarray(ops.affine_transform_fast(IMG, eye))
    np.testing.assert_allclose(out, np.asarray(IMG), atol=1e-4)


@pytest.mark.slow
def test_pallas_planar_kernel_matches_xla_fallback():
    """The two _apply_op_batched warp backends (Pallas kernel vs planar
    XLA shift-blend) produce identical results."""
    from rlcf_tpu.data.augment import _planar_shift_blend, WARP_MAX_SHIFT, _batched_affine_coords
    from rlcf_tpu.ops.pallas_warp import shift_blend_warp_planar

    r = np.random.default_rng(1)
    V, C, H, W = 2, 3, 64, 64
    imgs = jnp.asarray(r.integers(0, 256, (V, C, H, W)).astype(np.float32))
    mats = jnp.asarray(
        np.stack(
            [
                [1.0, 0.02, 0.0, 0.0, 1.0, 0.0],   # shear_x
                [1.0, 0.0, 4.0, 0.015, 1.0, -3.0],  # translate+shear_y mix
            ]
        ).astype(np.float32)
    )
    in_x, in_y = _batched_affine_coords(mats, H, W)
    pallas_out = shift_blend_warp_planar(imgs, in_x, in_y, max_shift=WARP_MAX_SHIFT, interpret=True)

    dx = jnp.clip(jnp.floor(in_x).astype(jnp.int32) - jnp.arange(W, dtype=jnp.int32)[None, None, :], -WARP_MAX_SHIFT, WARP_MAX_SHIFT)[:, None]
    fx = (in_x - jnp.floor(in_x))[:, None]
    dy = jnp.clip(jnp.floor(in_y).astype(jnp.int32) - jnp.arange(H, dtype=jnp.int32)[None, :, None], -WARP_MAX_SHIFT, WARP_MAX_SHIFT)[:, None]
    fy = (in_y - jnp.floor(in_y))[:, None]
    h = _planar_shift_blend(imgs, dx, fx, WARP_MAX_SHIFT, axis=3)
    xla_out = _planar_shift_blend(h, dy, fy, WARP_MAX_SHIFT, axis=2)
    np.testing.assert_allclose(np.asarray(pallas_out), np.asarray(xla_out), atol=1e-4)
