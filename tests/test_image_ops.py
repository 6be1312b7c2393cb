"""PIL parity for device image ops + AugMix view pipeline behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageOps

from rlcf_tpu.ops import image_ops as ops
from rlcf_tpu.data.augment import generate_views, make_view_generator, random_resized_crop

rng = np.random.default_rng(42)
IMG = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
PIL_IMG = Image.fromarray(IMG)


def as_float(img):
    return jnp.asarray(img.astype(np.float32))


def test_posterize_matches_pil():
    for bits in (1, 2, 4, 7):
        ref = np.asarray(ImageOps.posterize(PIL_IMG, bits))
        mine = np.asarray(ops.posterize(as_float(IMG), bits))
        np.testing.assert_array_equal(mine, ref.astype(np.float32))


def test_solarize_matches_pil():
    for t in (0, 64, 128, 231, 256):
        ref = np.asarray(ImageOps.solarize(PIL_IMG, t))
        mine = np.asarray(ops.solarize(as_float(IMG), t))
        np.testing.assert_array_equal(mine, ref.astype(np.float32))


def test_autocontrast_matches_pil():
    # use an image with non-trivial range per channel
    img = (IMG // 2 + 30).astype(np.uint8)
    ref = np.asarray(ImageOps.autocontrast(Image.fromarray(img)))
    mine = np.asarray(ops.autocontrast(as_float(img)))
    np.testing.assert_array_equal(mine, ref.astype(np.float32))


def test_equalize_matches_pil():
    ref = np.asarray(ImageOps.equalize(PIL_IMG))
    mine = np.asarray(ops.equalize(as_float(IMG)))
    np.testing.assert_array_equal(mine, ref.astype(np.float32))


def test_translate_matches_pil():
    for px in (5, -9):
        ref = np.asarray(
            PIL_IMG.transform((64, 64), Image.AFFINE, (1, 0, px, 0, 1, 0), resample=Image.BILINEAR)
        )
        mine = np.asarray(ops.translate_x(as_float(IMG), px))
        np.testing.assert_allclose(mine, ref.astype(np.float32), atol=1.0)


def test_shear_roughly_matches_pil():
    level = 0.2
    ref = np.asarray(
        PIL_IMG.transform((64, 64), Image.AFFINE, (1, level, 0, 0, 1, 0), resample=Image.BILINEAR)
    ).astype(np.float32)
    mine = np.asarray(ops.shear_x(as_float(IMG), level))
    # interior agreement (PIL rounds coordinates slightly differently at edges)
    diff = np.abs(mine[4:-4, 4:-4] - ref[4:-4, 4:-4])
    assert np.median(diff) <= 1.0
    assert (diff < 16).mean() > 0.95


def test_rotate_roughly_matches_pil():
    deg = 10.0
    ref = np.asarray(PIL_IMG.rotate(deg, resample=Image.BILINEAR)).astype(np.float32)
    mine = np.asarray(ops.rotate(as_float(IMG), deg))
    diff = np.abs(mine[8:-8, 8:-8] - ref[8:-8, 8:-8])
    assert np.median(diff) <= 2.0


def test_crop_and_resize_matches_pil():
    # PIL's box-resize is the underlying op of torchvision's RandomResizedCrop
    # on PIL inputs (antialiased bilinear).
    ref = np.asarray(
        PIL_IMG.resize((32, 32), Image.BILINEAR, box=(4, 8, 4 + 48, 8 + 40))
    ).astype(np.float32)
    mine = np.asarray(ops.crop_and_resize(as_float(IMG), 8, 4, 40, 48, 32))
    np.testing.assert_allclose(mine, ref, atol=1.5)


def test_hflip():
    np.testing.assert_array_equal(np.asarray(ops.hflip(as_float(IMG))), IMG[:, ::-1].astype(np.float32))


# ---------------------------------------------------------------------------
# view pipeline
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_generate_views_shapes_and_base_view():
    key = jax.random.PRNGKey(0)
    views = generate_views(jnp.asarray(IMG), key, n_views=8, resolution=32)
    assert views.shape == (8, 32, 32, 3)
    # view 0 equals plain bicubic resize + normalize
    from rlcf_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    base = jax.image.resize(as_float(IMG), (32, 32, 3), method="bicubic")
    base = np.clip(np.asarray(base), 0, 255) / 255.0
    expected = (base - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(np.asarray(views[0]), expected, atol=1e-5)
    # augmented views differ from each other
    assert np.abs(np.asarray(views[1]) - np.asarray(views[2])).max() > 1e-3


@pytest.mark.slow
def test_generate_views_deterministic_per_key():
    v1 = generate_views(jnp.asarray(IMG), jax.random.PRNGKey(7), n_views=4, resolution=32)
    v2 = generate_views(jnp.asarray(IMG), jax.random.PRNGKey(7), n_views=4, resolution=32)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    v3 = generate_views(jnp.asarray(IMG), jax.random.PRNGKey(8), n_views=4, resolution=32)
    assert np.abs(np.asarray(v1[1]) - np.asarray(v3[1])).max() > 1e-3


def test_generate_views_no_augmix():
    views = generate_views(jnp.asarray(IMG), jax.random.PRNGKey(0), n_views=4, resolution=32, augmix=False)
    assert views.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(views)).all()


@pytest.mark.slow
def test_batched_generator():
    gen = make_view_generator(n_views=4, resolution=32)
    imgs = jnp.asarray(np.stack([IMG, IMG[::-1].copy()]))
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    out = gen(imgs, keys)
    assert out.shape == (2, 4, 32, 32, 3)


def test_random_resized_crop_distribution():
    """Crops should cover a range of areas/positions (not degenerate)."""
    outs = []
    for i in range(16):
        out = random_resized_crop(as_float(IMG), jax.random.PRNGKey(i), 32)
        outs.append(np.asarray(out).mean())
    assert np.std(outs) > 0.5  # different crops -> different means


def test_views_in_valid_normalized_range():
    views = np.asarray(generate_views(jnp.asarray(IMG), jax.random.PRNGKey(0), n_views=8, resolution=32))
    from rlcf_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    lo = (0.0 - CLIP_MEAN) / CLIP_STD
    hi = (1.0 - CLIP_MEAN) / CLIP_STD
    assert views.min() >= lo.min() - 1e-4
    assert views.max() <= hi.max() + 1e-4


@pytest.mark.slow
def test_generate_views_hard_aug():
    key = jax.random.PRNGKey(0)
    views = generate_views(jnp.asarray(IMG), key, n_views=6, resolution=32, hard_aug=True)
    assert views.shape == (6, 32, 32, 3)
    assert np.isfinite(np.asarray(views)).all()
    v2 = generate_views(jnp.asarray(IMG), key, n_views=6, resolution=32, hard_aug=True)
    np.testing.assert_array_equal(np.asarray(views), np.asarray(v2))


@pytest.mark.slow
def test_augmix_views_statistics():
    """Augmented views stay in the valid normalized range and differ from the
    base view with non-degenerate spread."""
    views = np.asarray(generate_views(jnp.asarray(IMG), jax.random.PRNGKey(1), n_views=16, resolution=32))
    base = views[0]
    diffs = [np.abs(views[i] - base).mean() for i in range(1, 16)]
    assert min(diffs) > 0.01  # every view is actually augmented
    assert np.std(diffs) > 0.005  # and they differ from each other


def test_resize_align_corners_matches_torch():
    """Reward-path resize == torch interpolate(bicubic, align_corners=True)."""
    import torch

    x = np.random.default_rng(5).normal(size=(2, 32, 32, 3)).astype(np.float32)
    for size in (48, 24):
        ref = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), size=size, mode="bicubic", align_corners=True
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        mine = np.asarray(ops.resize_bicubic_align_corners(jnp.asarray(x), size))
        np.testing.assert_allclose(mine, ref, atol=1e-4)
