"""Fused Pallas AugMix kernel: semantics vs the reference pipelines.

Runs the kernel in interpret mode on CPU. Parity layers:
- per-op exactness vs `ops/image_ops.py` (the PIL-semantic reference
  implementations) through a fixed-parameter injection harness;
- full-pipeline parity vs `data.augment.generate_views` with the SAME PRNG
  key (the parameter streams are shared by construction): non-rotated views
  must match to u8 quantization (±0.5 + rounding), rotated views within the
  documented 3-shear tolerance;
- token layout parity vs `models.clip.patch_tokens_from_images`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # PIL-exactness suite: every test 20-80 s on 1 CPU core

from rlcf_tpu.data.augment import generate_views
from rlcf_tpu.data.transforms import CLIP_MEAN, CLIP_STD
from rlcf_tpu.models.clip import patch_tokens_from_images
from rlcf_tpu.ops import image_ops
from rlcf_tpu.ops.pallas_augmix import (
    _bicubic_matrix,
    _fused_call,
    fused_views,
    patchify_planar_u8,
    sample_view_params,
)

R = S = 64  # src==resolution -> the RRC identity box is an exact identity


def _img(seed=7, size=96):
    return jax.random.randint(
        jax.random.PRNGKey(seed), (size, size, 3), 0, 256, dtype=jnp.int32
    ).astype(jnp.uint8)


def _denorm(nhwc):
    return (np.asarray(nhwc) * np.asarray(CLIP_STD) + np.asarray(CLIP_MEAN)) * 255.0


def _run_single_op(img_hwc_u8, op: int, p0=0.0, p1=0.0, ip0=0, shifts=None):
    """Apply exactly one AugMix op through the kernel (identity crop, m=0)."""
    planar = jnp.asarray(img_hwc_u8).transpose(2, 0, 1)[None]
    V = 1
    z9f = np.zeros((V, 9), np.float32)
    z9i = np.zeros((V, 9), np.int32)
    params = {
        "rrc": jnp.asarray([[0.0, 0.0, float(S), float(S)]], jnp.float32),
        "flip": jnp.zeros((V,), jnp.int32),
        "depth": jnp.asarray([[1, 0, 0]], jnp.int32),
        "ops": jnp.asarray(z9i).at[0, 0].set(op),
        "p0": jnp.asarray(z9f).at[0, 0].set(p0),
        "p1": jnp.asarray(z9f).at[0, 0].set(p1),
        "ip0": jnp.asarray(z9i).at[0, 0].set(ip0),
        "wm": jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32),
        "m": jnp.zeros((V,), jnp.float32),
    }
    # grid runs V views per image; with V=1 the only view is index 0, which the
    # kernel treats as the base view — so shift indices by running 2 views
    V2 = 2
    params = {k: jnp.concatenate([jnp.zeros_like(v[:1]), v], axis=0) for k, v in params.items()}
    params["m"] = params["m"].at[0].set(1.0)
    basew = _bicubic_matrix(S, R)
    out = _fused_call(planar, params, basew, R=R, S=S, V=V2, max_shift=12,
                      shifts=shifts, interpret=True)
    return np.asarray(out)[0, 1].transpose(1, 2, 0).astype(np.float64)  # HWC


@pytest.fixture(scope="module")
def img64():
    return _img(size=64)


def test_autocontrast_exact(img64):
    got = _run_single_op(img64, op=0)
    want = np.asarray(image_ops.autocontrast(jnp.asarray(img64).astype(jnp.float32)))
    np.testing.assert_array_equal(got, want)


def test_equalize_exact(img64):
    got = _run_single_op(img64, op=1)
    want = np.asarray(image_ops.equalize(jnp.asarray(img64).astype(jnp.float32)))
    np.testing.assert_array_equal(got, want)


def test_posterize_exact(img64):
    for bits in (1, 2, 3, 4):
        mask = (0xFF00 >> bits) & 0xFF
        got = _run_single_op(img64, op=2, ip0=mask)
        want = np.asarray(image_ops.posterize(jnp.asarray(img64).astype(jnp.float32), bits))
        np.testing.assert_array_equal(got, want)


def test_solarize_exact(img64):
    got = _run_single_op(img64, op=4, p0=128.0)
    want = np.asarray(image_ops.solarize(jnp.asarray(img64).astype(jnp.float32), 128.0))
    np.testing.assert_array_equal(got, want)


def _smooth_img(size=64):
    """Smooth structured test image: sub-pixel sampling differences between
    interpolation formulations stay sub-gray here. (On white noise, adjacent
    pixels differ ~85 gray, so even last-bit f32 summation-order differences
    in fractional sampling offsets read as huge pixel errors.)"""
    y, x = np.mgrid[0:size, 0:size].astype(np.float64)
    img = np.stack(
        [
            127 + 90 * np.sin(2 * np.pi * x / 23) * np.cos(2 * np.pi * y / 31),
            40 + 2.5 * x + 0.8 * y,
            200 - 1.9 * y + 30 * np.sin(2 * np.pi * (x + y) / 41),
        ],
        axis=-1,
    )
    return jnp.asarray(np.clip(np.round(img), 0, 255).astype(np.uint8))


def test_shear_translate_exact():
    img = _smooth_img()
    f = jnp.asarray(img).astype(jnp.float32)
    cases = [
        # shears: same shift-blend math; tolerance covers f32 summation-order
        # differences in the fractional offset (image_ops adds x first)
        (5, 0.05, image_ops.shear_x(f, 0.05), 1.0),
        (6, -0.05, image_ops.shear_y(f, -0.05), 1.0),
        # integer translates: no fractional tap -> exact
        (7, 3.0, image_ops.translate_x(f, 3.0), 0.0),
        (8, -2.0, image_ops.translate_y(f, -2.0), 0.0),
    ]
    for op, lvl, want, tol in cases:
        got = _run_single_op(img, op=op, p0=lvl)
        d = np.abs(got - np.asarray(jnp.round(want)))
        assert d.max() <= tol, (op, d.max())


def test_rotate_three_shear_close():
    """3-shear decomposition vs direct 2-D bilinear rotate (PIL-exact path)."""
    img = _smooth_img()
    for deg in (2.0, -3.0):
        theta = -np.deg2rad(deg)
        got = _run_single_op(img, op=3, p0=float(np.tan(theta / 2)), p1=float(-np.sin(theta)))
        want = np.asarray(jnp.round(image_ops.rotate(jnp.asarray(img).astype(jnp.float32), deg)))
        # interior only: the three passes clip corners slightly differently
        d = np.abs(got - want)[4:-4, 4:-4]
        assert d.mean() < 1.0, d.mean()
        assert np.quantile(d, 0.99) <= 4, np.quantile(d, 0.99)


def test_full_pipeline_matches_device_path():
    """Same PRNG key -> same parameters; outputs match the XLA device path to
    u8 quantization except on rotation steps (3-shear approximation)."""
    rng = jax.random.PRNGKey(42)
    img = _img(size=96)
    planar = img.transpose(2, 0, 1)[None]
    views = fused_views(planar, rng[None], n_views=8, resolution=64, src_size=96,
                        augmix=True, interpret=True)
    ref = generate_views(img, rng, n_views=8, resolution=64, augmix=True)
    ref_px = _denorm(ref)
    got = np.asarray(views)[0].transpose(0, 2, 3, 1).astype(np.float64)

    p = sample_view_params(rng, 8, 96, 64, True, 1.0, 0.08)
    ops, dep = np.asarray(p["ops"]), np.asarray(p["depth"])
    for v in range(8):
        active = [ops[v, c * 3 + s] for c in range(3) for s in range(dep[v, c])]
        d = np.abs(ref_px[v] - got[v])
        if 3 in active:  # rotation somewhere in the chains
            assert d.mean() < 3.0, (v, d.mean())
        else:
            assert d.max() <= 1.0, (v, d.max())  # u8 quantization + rounding


def test_augmix_off_is_exact_rrc():
    rng = jax.random.PRNGKey(3)
    img = _img(size=96)
    views = fused_views(img.transpose(2, 0, 1)[None], rng[None], n_views=6,
                        resolution=64, src_size=96, augmix=False, interpret=True)
    ref = generate_views(img, rng, n_views=6, resolution=64, augmix=False)
    d = np.abs(_denorm(ref) - np.asarray(views)[0].transpose(0, 2, 3, 1))
    assert d.max() <= 0.5 + 1e-3


def test_patchify_matches_reference_layout():
    rng = jax.random.PRNGKey(5)
    img = _img(size=96)
    views = fused_views(img.transpose(2, 0, 1)[None], rng[None], n_views=4,
                        resolution=64, src_size=96, augmix=True, interpret=True)
    nhwc = jnp.asarray(np.asarray(views)[0].transpose(0, 2, 3, 1))
    want = np.asarray(patch_tokens_from_images(nhwc, 16))
    got = np.asarray(patchify_planar_u8(views, 16))[0]
    np.testing.assert_array_equal(want, got)


def test_token_outputs_consistent():
    """p_policy/p_reward outputs are patchifications of the same views."""
    rng = jax.random.PRNGKey(9)
    img = _img(size=96)
    planar = img.transpose(2, 0, 1)[None]
    kw = dict(n_views=4, resolution=64, src_size=96, augmix=True, interpret=True)
    views = fused_views(planar, rng[None], **kw)
    ptoks, rtoks = fused_views(planar, rng[None], p_policy=16, p_reward=8, **kw)
    np.testing.assert_array_equal(np.asarray(patchify_planar_u8(views, 16)), np.asarray(ptoks))
    np.testing.assert_array_equal(np.asarray(patchify_planar_u8(views, 8)), np.asarray(rtoks))


def test_derived_tap_windows_bit_identical_to_uniform():
    """Default (severity-derived per-op tap windows) == explicit uniform
    max_shift=12: the dropped taps carry zero weight, so the r5 fast path
    must be bit-identical to the r2-r4 kernel on the same key."""
    rng = jax.random.PRNGKey(21)
    img = _img(size=96)
    planar = img.transpose(2, 0, 1)[None]
    kw = dict(n_views=8, resolution=64, src_size=96, augmix=True, interpret=True)
    fast = fused_views(planar, rng[None], **kw)
    uniform = fused_views(planar, rng[None], max_shift=12, **kw)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(uniform))


def test_shift_bounds_cover_severity_2():
    """severity>=2 translate reaches floor(2*224/30)=14 px; the old uniform
    window of 12 silently clamped it. The derived windows must cover every
    op's true maximum shift (`augmix_ops.py:30-53` level scalings)."""
    from rlcf_tpu.ops.pallas_augmix import _op_shift_bounds

    ra, rb, sh, tr = _op_shift_bounds(2.0, 224)
    assert tr >= 14, tr                      # translate: floor(2*224/30)
    assert sh >= 0.03 * 2.0 * 223.5, sh      # shear shift at the last row
    assert rb >= np.sin(np.deg2rad(6)) * 111.5, rb
    assert ra >= np.tan(np.deg2rad(6) / 2) * 111.5, ra

    # max-magnitude translate through the derived (tight) window is exact
    img = _smooth_img()
    f = jnp.asarray(img).astype(jnp.float32)
    s2_64 = _op_shift_bounds(2.0, 64)
    got = _run_single_op(img, op=7, p0=float(s2_64[3]), shifts=s2_64)
    want = np.asarray(jnp.round(image_ops.translate_x(f, float(s2_64[3]))))
    np.testing.assert_array_equal(got, want)


def test_fused_views_sharded_matches_unsharded():
    """shard_map'd fused viewgen (dp over images) == single-device output."""
    from rlcf_tpu.ops.pallas_augmix import fused_views_sharded
    from rlcf_tpu.parallel.mesh import make_mesh

    rngs = jax.random.split(jax.random.PRNGKey(11), 8)
    imgs = jax.random.randint(
        jax.random.PRNGKey(12), (8, 3, 96, 96), 0, 256, dtype=jnp.int32
    ).astype(jnp.uint8)
    kw = dict(n_views=4, resolution=64, src_size=96, augmix=True, interpret=True)
    mesh = make_mesh(8, tp=1)
    base = fused_views(imgs, rngs, **kw)
    shd = fused_views_sharded(imgs, rngs, mesh, **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(shd))

    import pytest

    with pytest.raises(ValueError, match="must tile dp"):
        fused_views_sharded(imgs[:3], rngs[:3], mesh, **kw)
