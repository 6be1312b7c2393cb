"""End-to-end prompt-TTA episodes with real (tiny) CLIP policy + reward towers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlcf_tpu.core.episode import EpisodeConfig
from rlcf_tpu.core.reward import ClipReward, RewardConfig
from rlcf_tpu.models import clip as C
from rlcf_tpu.tasks.classification import PromptTTAClassifier

CLASSNAMES = ["goldfish", "tiger cat", "airliner", "acoustic guitar"]


def tiny_cfg(name, res=32, patch=16):
    return C.ClipConfig(name, 16, res, 1, 32, patch, 32, 1, vision_heads_override=2, text_heads_override=2)


@pytest.fixture(scope="module")
def setup():
    policy_cfg = tiny_cfg("tiny-policy")
    reward_cfg = tiny_cfg("tiny-reward", res=32)
    policy_params = C.init_clip_params(jax.random.PRNGKey(0), policy_cfg)
    reward_params = C.init_clip_params(jax.random.PRNGKey(1), reward_cfg)
    reward = ClipReward(reward_params, reward_cfg, RewardConfig(sample_k=2))
    return policy_params, policy_cfg, reward


def make_views(n_samples=2, n_views=8, res=32, seed=0):
    r = np.random.default_rng(seed)
    return r.normal(size=(n_samples, n_views, res, res, 3)).astype(np.float32)


def test_prompt_tta_end_to_end(setup):
    policy_params, policy_cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.25, lr=5e-3, sample_k=2)
    clf = PromptTTAClassifier(policy_params, policy_cfg, reward, ecfg).setup(CLASSNAMES)
    views = make_views()
    logits, aux = clf.adapt(views)
    assert logits.shape == (2, len(CLASSNAMES))
    assert np.isfinite(np.asarray(logits)).all()
    assert aux["losses"].shape == (2, 2)
    # deterministic reruns (functional reset semantics)
    logits2, _ = clf.adapt(views)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))


def test_prompt_tta_adapts_prediction(setup):
    """tta_steps>0 must change the logits vs zero-shot (gradients flow)."""
    policy_params, policy_cfg, reward = setup
    views = make_views()
    base = PromptTTAClassifier(
        policy_params, policy_cfg, reward, EpisodeConfig(tta_steps=0, selection_p=0.25, sample_k=2)
    ).setup(CLASSNAMES)
    tuned = PromptTTAClassifier(
        policy_params, policy_cfg, reward, EpisodeConfig(tta_steps=3, selection_p=0.25, lr=0.05, sample_k=2)
    ).setup(CLASSNAMES)
    logits0, _ = base.adapt(views)
    logits3, _ = tuned.adapt(views)
    assert np.abs(np.asarray(logits0) - np.asarray(logits3)).max() > 1e-4


def test_prompt_tta_reset_classnames(setup):
    """Re-setup with a different class set reshapes everything (reset_classnames)."""
    policy_params, policy_cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=1, selection_p=0.25, sample_k=2)
    clf = PromptTTAClassifier(policy_params, policy_cfg, reward, ecfg).setup(CLASSNAMES)
    logits_a, _ = clf.adapt(make_views())
    clf.setup(["daisy", "rose"])
    logits_b, _ = clf.adapt(make_views())
    assert logits_a.shape[-1] == 4 and logits_b.shape[-1] == 2


def test_prompt_tta_tpt_loss_variant(setup):
    policy_params, policy_cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.25, loss="tpt")
    clf = PromptTTAClassifier(policy_params, policy_cfg, reward, ecfg).setup(CLASSNAMES)
    logits, aux = clf.adapt(make_views())
    assert np.isfinite(np.asarray(aux["losses"])).all()


def test_reward_resolution_mismatch(setup):
    """Reward tower at a different resolution resizes inputs (bicubic)."""
    policy_params, policy_cfg, _ = setup
    rcfg64 = tiny_cfg("tiny-reward-64", res=64, patch=16)
    reward64 = ClipReward(C.init_clip_params(jax.random.PRNGKey(2), rcfg64), rcfg64, RewardConfig(sample_k=2))
    ecfg = EpisodeConfig(tta_steps=1, selection_p=0.25, sample_k=2)
    clf = PromptTTAClassifier(policy_params, policy_cfg, reward64, ecfg).setup(CLASSNAMES)
    logits, _ = clf.adapt(make_views())
    assert np.isfinite(np.asarray(logits)).all()
