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


