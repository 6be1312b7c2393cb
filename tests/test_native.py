"""Native C++ host pipeline: build, PIL parity, view generation."""

import numpy as np
import pytest

from rlcf_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_preprocess_matches_pil():
    from rlcf_tpu.data.transforms import preprocess_pil

    y, x = np.mgrid[0:256, 0:256]
    img = np.stack([x, y, (x + y) / 2], -1).astype(np.uint8)
    ref = preprocess_pil(img, 224)
    out = native.preprocess_native(img[None], 224)[0]
    assert np.abs(out - ref).mean() < 0.01  # < 1 gray level


def test_generate_views_shapes_and_determinism():
    imgs = np.random.default_rng(0).integers(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    v1 = native.generate_views_native(imgs, n_views=6, resolution=64, seed=7)
    v2 = native.generate_views_native(imgs, n_views=6, resolution=64, seed=7)
    assert v1.shape == (2, 6, 64, 64, 3)
    np.testing.assert_array_equal(v1, v2)
    v3 = native.generate_views_native(imgs, n_views=6, resolution=64, seed=8)
    assert np.abs(v1[:, 1:] - v3[:, 1:]).max() > 1e-3
    # base view is seed-independent
    np.testing.assert_allclose(v1[:, 0], v3[:, 0])


def test_u8_views_match_f32_after_normalize():
    """u8 API shares the f32 API's RNG stream; normalized u8 views differ only
    by the mix quantization (<= half gray level / std)."""
    from rlcf_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    imgs = np.random.default_rng(3).integers(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    f = native.generate_views_native(imgs, n_views=6, resolution=64, seed=5)
    u = native.generate_views_native_u8(imgs, n_views=6, resolution=64, seed=5)
    un = (u.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    assert np.abs(f - un).max() <= 0.5 / 255 / CLIP_STD.min() + 1e-4


def test_u8_views_adapt_via_device_normalize():
    """PromptTTAClassifier accepts raw uint8 views (device-side normalize)."""
    import jax
    import jax.numpy as jnp

    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.tasks.classification import PromptTTAClassifier

    cfg = C.ClipConfig("p", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), cfg), cfg, RewardConfig(sample_k=2))
    clf = PromptTTAClassifier(params, cfg, reward, EpisodeConfig(tta_steps=1, selection_p=0.25, sample_k=2)).setup(
        ["cat", "dog"]
    )
    u8 = np.random.default_rng(0).integers(0, 256, (2, 8, 32, 32, 3), dtype=np.uint8)
    from rlcf_tpu.tasks.classification import maybe_normalize_u8

    logits_u8, _ = clf.adapt(jnp.asarray(u8))
    logits_f32, _ = clf.adapt(np.asarray(maybe_normalize_u8(jnp.asarray(u8))))
    np.testing.assert_allclose(np.asarray(logits_u8), np.asarray(logits_f32), atol=1e-4)


def test_views_finite_and_in_range():
    from rlcf_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    imgs = np.random.default_rng(1).integers(0, 256, (1, 96, 96, 3), dtype=np.uint8)
    v = native.generate_views_native(imgs, n_views=8, resolution=64)
    assert np.isfinite(v).all()
    lo = ((0.0 - CLIP_MEAN) / CLIP_STD).min() - 1e-4
    hi = ((1.0 - CLIP_MEAN) / CLIP_STD).max() + 1e-4
    assert v.min() >= lo and v.max() <= hi


def test_patch_major_matches_u8_views():
    """Patch-major emitter == patchified NHWC u8 views (same RNG stream)."""
    native = pytest.importorskip("rlcf_tpu.data.native")
    if not native.available():
        pytest.skip("no native toolchain")
    import numpy as np
    from rlcf_tpu.models.clip import patch_tokens_from_images

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    u8 = native.generate_views_native_u8(imgs, n_views=5, resolution=32, seed=7)
    p1, p2 = native.generate_views_native_patch_u8(imgs, n_views=5, p_policy=16, p_reward=8, resolution=32, seed=7)
    assert p1.shape == (2, 5, 4, 768) and p2.shape == (2, 5, 16, 192)
    for i in range(2):
        np.testing.assert_array_equal(p1[i], patch_tokens_from_images(u8[i], 16))
        np.testing.assert_array_equal(p2[i], patch_tokens_from_images(u8[i], 8))
