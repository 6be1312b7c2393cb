"""AOT serving export: StableHLO round trip of the fused TTA episode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlcf_tpu.core.episode import EpisodeConfig
from rlcf_tpu.core.reward import ClipReward, RewardConfig
from rlcf_tpu.models import clip as C
from rlcf_tpu.tasks.classification import PromptTTAClassifier
from rlcf_tpu.utils.export import deserialize_call, export_serving, load_exported, save_exported


def _tiny_clf():
    cfg = C.ClipConfig("p", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), cfg), cfg, RewardConfig(sample_k=2))
    return PromptTTAClassifier(params, cfg, reward, EpisodeConfig(tta_steps=2, selection_p=0.25, sample_k=2)).setup(
        ["cat", "dog", "bird"]
    )


@pytest.mark.slow
def test_serving_export_roundtrip(tmp_path):
    clf = _tiny_clf()
    views = np.random.default_rng(0).normal(size=(2, 8, 32, 32, 3)).astype(np.float32)

    blob = export_serving(clf.serving_fn(), clf.serving_example_args(views.shape))
    assert len(blob) > 100

    path = str(tmp_path / "episode.rlcfx")
    save_exported(path, blob)
    call = load_exported(path)

    served = np.asarray(call(*clf.serving_example_args(views.shape)[:-1], jnp.asarray(views)))
    direct, _ = clf.adapt(views)
    np.testing.assert_allclose(served, np.asarray(direct), atol=1e-5)


def test_serving_export_is_weight_agnostic():
    """An artifact exported from checkpoint A must serve checkpoint B exactly:
    every weight-derived value (params, prompt init, template embeddings,
    logit scale, text features) is a call argument, never a baked constant."""
    cfg = C.ClipConfig("p", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)

    def make(seed):
        params = C.init_clip_params(jax.random.PRNGKey(seed), cfg)
        reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(seed + 100), cfg), cfg, RewardConfig(sample_k=2))
        return PromptTTAClassifier(
            params, cfg, reward, EpisodeConfig(tta_steps=2, selection_p=0.25, sample_k=2)
        ).setup(["cat", "dog", "bird"])

    A, B = make(0), make(7)
    views = np.random.default_rng(0).normal(size=(2, 8, 32, 32, 3)).astype(np.float32)
    call = deserialize_call(export_serving(A.serving_fn(), A.serving_example_args(views.shape)))
    served_b = np.asarray(call(*B.serving_example_args(views.shape)[:-1], jnp.asarray(views)))
    direct_b, _ = B.adapt(views)
    np.testing.assert_allclose(served_b, np.asarray(direct_b), atol=1e-6)


def test_export_rejects_garbage(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="magic"):
        deserialize_call(b"not an artifact")


def test_export_shape_mismatch_fails():
    import pytest

    clf = _tiny_clf()
    blob = export_serving(clf.serving_fn(), clf.serving_example_args((2, 8, 32, 32, 3)))
    call = deserialize_call(blob)
    wrong_views = jnp.zeros((3, 8, 32, 32, 3), jnp.float32)  # N=3 != exported N=2
    with pytest.raises(Exception):
        np.asarray(call(*clf.serving_example_args((2, 8, 32, 32, 3))[:-1], wrong_views))


@pytest.mark.slow
def test_serving_export_tokens_roundtrip(tmp_path):
    """Token-input serving artifact == adapt_tokens on the same u8 views."""
    from rlcf_tpu.models.clip import patch_tokens_from_images

    clf = _tiny_clf()
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, size=(2, 8, 32, 32, 3), dtype=np.uint8)
    ptoks = np.stack([patch_tokens_from_images(v, 16) for v in u8])

    blob = export_serving(clf.serving_fn_tokens(), clf.serving_example_args_tokens(ptoks.shape))
    path = str(tmp_path / "episode_tokens.rlcfx")
    save_exported(path, blob)
    call = load_exported(path)

    served = np.asarray(call(*clf.serving_example_args_tokens(ptoks.shape)[:-1], jnp.asarray(ptoks)))
    direct, _ = clf.adapt_tokens(ptoks)
    np.testing.assert_allclose(served, np.asarray(direct), atol=1e-5)
