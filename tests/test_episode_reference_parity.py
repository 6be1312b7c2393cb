"""END-TO-END parity: my jitted episode vs the reference's test_time_tuning.

The fixture was produced by running the actual upstream inner loop
(`TPT/tpt_cls_rl.py::test_time_tuning`, fp32, 3 AdamW steps, selection_p=0.25,
sample_k=2) on tiny full-vocab CLIP policy/reward towers. This test converts
the same torch weights, runs the rlcf_tpu episode on the same views, and
compares the adapted context and final logits — covering the composition of
prompt splicing, text/image towers, confidence selection, top-k sampling,
CLIPScore rewards, baseline subtraction, REINFORCE CE, and AdamW.
"""

import os

import numpy as np
import pytest

from rlcf_tpu.core.episode import EpisodeConfig
from rlcf_tpu.core.reward import ClipReward, RewardConfig
from rlcf_tpu.models.convert import convert_clip_state_dict
from rlcf_tpu.tasks.classification import PromptTTAClassifier

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_episode.npz")


def _load_or_skip(path):
    import pytest

    if not os.path.exists(path):
        pytest.skip(f"golden fixture missing (regenerate: see tests/conftest.py): {os.path.basename(path)}")
    return np.load(path, allow_pickle=True)




@pytest.fixture(scope="module")
def golden():
    data = _load_or_skip(FIXTURE)
    policy_sd = {k[len("policy::"):]: data[k] for k in data.files if k.startswith("policy::")}
    reward_sd = {k[len("reward::"):]: data[k] for k in data.files if k.startswith("reward::")}
    return data, policy_sd, reward_sd


def test_episode_matches_reference_inner_loop(golden):
    data, policy_sd, reward_sd = golden
    policy_params, policy_cfg = convert_clip_state_dict(policy_sd)
    reward_params, reward_cfg = convert_clip_state_dict(reward_sd)
    reward = ClipReward(reward_params, reward_cfg, RewardConfig(sample_k=2))

    ecfg = EpisodeConfig(tta_steps=3, selection_p=0.25, lr=5e-3, weight_decay=5e-4, sample_k=2)
    classnames = [str(c) for c in data["classnames"]]
    clf = PromptTTAClassifier(policy_params, policy_cfg, reward, ecfg, ctx_init="a photo of a").setup(classnames)

    # context init must equal the reference PromptLearner's word-init ctx
    np.testing.assert_allclose(np.asarray(clf.prompt_state.ctx0), data["ctx0"], rtol=1e-5, atol=1e-6)

    views = np.transpose(data["views"], (0, 2, 3, 1))[None]  # NCHW -> [1, B, H, W, C]
    logits, aux = clf.adapt(views)

    np.testing.assert_allclose(np.asarray(logits[0]), data["final_logits"][0], rtol=2e-3, atol=2e-4)


def test_adapted_context_close_to_reference(golden):
    """The adapted ctx after 3 AdamW steps matches the torch trajectory."""
    data, policy_sd, reward_sd = golden
    policy_params, policy_cfg = convert_clip_state_dict(policy_sd)
    reward_params, reward_cfg = convert_clip_state_dict(reward_sd)
    reward = ClipReward(reward_params, reward_cfg, RewardConfig(sample_k=2))
    ecfg = EpisodeConfig(tta_steps=3, selection_p=0.25, lr=5e-3, weight_decay=5e-4, sample_k=2)
    classnames = [str(c) for c in data["classnames"]]
    clf = PromptTTAClassifier(policy_params, policy_cfg, reward, ecfg, ctx_init="a photo of a").setup(classnames)

    # reach inside: rebuild the episode pieces to extract adapted ctx
    import jax
    import jax.numpy as jnp

    img_feats, sel, r_sim = clf._prepare(
        clf.clip_params, clf._reward_params_arg, clf._tf0, clf._reward_feats_arg,
        jnp.asarray(np.transpose(data["views"], (0, 2, 3, 1))[None]),
    )
    # run the same scan manually via the episodes fn and compare final logits
    # (ctx itself isn't returned; final logits already pin the trajectory).
    logits, _ = clf._episodes(
        clf.clip_params, clf._trainable0, clf._pt_args, clf._tf0, img_feats, sel, r_sim
    )
    np.testing.assert_allclose(np.asarray(logits[0]), data["final_logits"][0], rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_encoder_episode_matches_reference():
    """Encoder-TTA (CLIPCLS_TTA) end-to-end vs the reference inner loop."""
    from rlcf_tpu.tasks.classification import EncoderTTAClassifier

    path = os.path.join(os.path.dirname(__file__), "fixtures", "golden_episode_encoder.npz")
    data = _load_or_skip(path)
    policy_sd = {k[len("policy::"):]: data[k] for k in data.files if k.startswith("policy::")}
    reward_sd = {k[len("reward::"):]: data[k] for k in data.files if k.startswith("reward::")}
    policy_params, policy_cfg = convert_clip_state_dict(policy_sd)
    reward_params, reward_cfg = convert_clip_state_dict(reward_sd)
    reward = ClipReward(reward_params, reward_cfg, RewardConfig(sample_k=2))

    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.25, lr=1e-4, weight_decay=5e-4, sample_k=2)
    classnames = [str(c) for c in data["classnames"]]
    clf = EncoderTTAClassifier(policy_params, policy_cfg, reward, ecfg).setup(classnames)

    # class features must match the reference's cached ones
    np.testing.assert_allclose(
        np.asarray(clf.class_features), data["class_features"], rtol=1e-4, atol=1e-5
    )
    views = np.transpose(data["views"], (0, 2, 3, 1))[None]
    logits, _ = clf.adapt(views)
    np.testing.assert_allclose(np.asarray(logits[0]), data["final_logits"][0], rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_encoder_momentum_stream_matches_reference():
    """Momentum-EMA encoder TTA over a sample stream vs the reference flow.

    The fixture replays `tune_cls_rl.py:219-240` + `custom_clip.py:458-475`
    with momentum_update=True (momentum 0.9, update_freq 2, update_w 0.5):
    3 sequential samples, each reset-to-anchor -> tune -> predict ->
    EMA-fold; the re-anchor triggers after sample 2, so sample 3's logits pin
    the full MomentumState mechanics (ema fold, counter, re-anchor mix).
    """
    from rlcf_tpu.tasks.classification import EncoderTTAClassifier

    path = os.path.join(os.path.dirname(__file__), "fixtures", "golden_episode_encoder_momentum.npz")
    data = _load_or_skip(path)
    policy_sd = {k[len("policy::"):]: data[k] for k in data.files if k.startswith("policy::")}
    reward_sd = {k[len("reward::"):]: data[k] for k in data.files if k.startswith("reward::")}
    policy_params, policy_cfg = convert_clip_state_dict(policy_sd)
    reward_params, reward_cfg = convert_clip_state_dict(reward_sd)
    reward = ClipReward(reward_params, reward_cfg, RewardConfig(sample_k=2))

    ecfg = EpisodeConfig(
        tta_steps=int(data["tta_steps"]), selection_p=0.25, lr=float(data["lr"]),
        weight_decay=5e-4, sample_k=2,
    )
    classnames = [str(c) for c in data["classnames"]]
    clf = EncoderTTAClassifier(
        policy_params, policy_cfg, reward, ecfg,
        momentum_update=True, update_freq=int(data["update_freq"]),
        update_w=float(data["update_w"]), momentum=float(data["momentum"]),
    ).setup(classnames)

    sample_views = np.transpose(data["sample_views"], (0, 1, 3, 4, 2))  # [S, B, H, W, 3]
    for i in range(sample_views.shape[0]):
        logits, _ = clf.adapt(sample_views[i][None])  # N=1: exact sequential parity
        np.testing.assert_allclose(
            np.asarray(logits[0]), data["final_logits"][i], rtol=2e-3, atol=2e-4,
            err_msg=f"sample {i} diverged (momentum anchor state wrong)",
        )
