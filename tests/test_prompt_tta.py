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


def test_adapt_u8_flat_transfer_matches_float(setup):
    """uint8 views via the flat-transfer fast path == the same views as f32.

    (Flat u8 + on-device reshape rides a 34x faster host->device path; the
    math must be unchanged up to the u8 quantization itself.)
    """
    policy_params, policy_cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=1, selection_p=0.25, lr=5e-3, sample_k=2)
    clf = PromptTTAClassifier(policy_params, policy_cfg, reward, ecfg).setup(CLASSNAMES)
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, size=(2, 8, 32, 32, 3), dtype=np.uint8)
    from rlcf_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    f32 = ((u8.astype(np.float32) / 255.0) - CLIP_MEAN) / CLIP_STD
    lg_u8, _ = clf.adapt(u8)
    lg_f32, _ = clf.adapt(f32.astype(np.float32))
    np.testing.assert_allclose(np.asarray(lg_u8), np.asarray(lg_f32), rtol=2e-4, atol=2e-4)


def test_adapt_tokens_matches_image_path(setup):
    """Patch-major token path == NHWC image path on identical u8 views."""
    policy_params, policy_cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.25, lr=5e-3, sample_k=2)
    clf = PromptTTAClassifier(policy_params, policy_cfg, reward, ecfg).setup(CLASSNAMES)
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, size=(2, 8, 32, 32, 3), dtype=np.uint8)

    from rlcf_tpu.models.clip import patch_tokens_from_images

    p = policy_cfg.vision_patch_size
    q = reward.cfg.vision_patch_size
    ptoks = np.stack([patch_tokens_from_images(v, p) for v in u8])
    rtoks = np.stack([patch_tokens_from_images(v, q) for v in u8])

    lg_img, aux_img = clf.adapt(u8)
    lg_tok, aux_tok = clf.adapt_tokens(ptoks, rtoks)
    np.testing.assert_array_equal(np.asarray(aux_img["selected"]), np.asarray(aux_tok["selected"]))
    np.testing.assert_allclose(np.asarray(lg_tok), np.asarray(lg_img), rtol=2e-4, atol=2e-4)


def test_adapt_sources_single_dispatch_matches_token_path(setup):
    """adapt_sources_fn (one jitted program: viewgen+prepare+episodes, seed
    derived in-graph) == fused_views + adapt_tokens with the same keys."""
    policy_params, policy_cfg, reward = setup
    from rlcf_tpu.ops.pallas_augmix import fused_views

    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.25, lr=5e-3, sample_k=2)
    clf = PromptTTAClassifier(policy_params, policy_cfg, reward, ecfg).setup(CLASSNAMES)
    rng = np.random.default_rng(13)
    srcs = rng.integers(0, 256, size=(2, 3, 48, 48), dtype=np.uint8)  # planar u8

    run = clf.adapt_sources_fn(n_views=8, src_size=48, resolution=32, interpret=True)
    lg_one, losses_one, seed1 = run(jnp.asarray(srcs), 0)
    assert int(seed1) == 1

    keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), 0), 2)
    ptoks, rtoks = fused_views(
        jnp.asarray(srcs), keys, n_views=8, src_size=48, resolution=32,
        p_policy=policy_cfg.vision_patch_size, p_reward=reward.cfg.vision_patch_size,
        interpret=True,
    )
    lg_tok, _ = clf.adapt_tokens(ptoks, rtoks)
    np.testing.assert_allclose(np.asarray(lg_one), np.asarray(lg_tok), rtol=2e-4, atol=2e-4)

    # carried seed advances the RNG stream: different views for the next
    # group. Assert on the TPT entropy loss (the RLCF loss can be exactly 0
    # on tiny random towers — clipped rewards — and the final prediction
    # rides view 0, the deterministic center crop, hiding seed changes).
    tpt = PromptTTAClassifier(
        policy_params, policy_cfg, reward,
        EpisodeConfig(tta_steps=2, selection_p=0.25, lr=5e-2, sample_k=2, loss="tpt"),
    ).setup(CLASSNAMES)
    run_tpt = tpt.adapt_sources_fn(n_views=8, src_size=48, resolution=32, interpret=True)
    lg_a, losses_a, seed_a = run_tpt(jnp.asarray(srcs), 0)
    lg_b, losses_b, seed_b = run_tpt(jnp.asarray(srcs), seed_a)
    assert (int(seed_a), int(seed_b)) == (1, 2)
    assert not np.allclose(np.asarray(losses_b), np.asarray(losses_a))
    assert not np.allclose(np.asarray(lg_b), np.asarray(lg_a))


def test_adapt_sources_scan_matches_chained_singles(setup):
    """adapt_sources_scan_fn over G groups == G chained adapt_sources_fn calls
    (identical per-group RNG stream: group g uses seed+g)."""
    policy_params, policy_cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.25, lr=5e-3, sample_k=2)
    clf = PromptTTAClassifier(policy_params, policy_cfg, reward, ecfg).setup(CLASSNAMES)
    rng = np.random.default_rng(7)
    srcs = rng.integers(0, 256, size=(3, 2, 3, 48, 48), dtype=np.uint8)  # [G=3, N=2]

    run_scan = clf.adapt_sources_scan_fn(n_views=8, src_size=48, resolution=32, interpret=True)
    lg_scan, losses_scan, seed_end = run_scan(jnp.asarray(srcs), 0)
    assert int(seed_end) == 3
    assert lg_scan.shape[:2] == (3, 2)

    run_one = clf.adapt_sources_fn(n_views=8, src_size=48, resolution=32, interpret=True)
    seed = 0
    for g in range(3):
        lg_g, losses_g, seed = run_one(jnp.asarray(srcs[g]), seed)
        np.testing.assert_allclose(np.asarray(lg_scan[g]), np.asarray(lg_g), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(losses_scan[g]), np.asarray(losses_g), rtol=2e-4, atol=2e-4
        )
    assert int(seed) == 3


def test_adapt_tokens_depatchify_reward_matches(setup):
    """Single-buffer token mode (reward via on-device depatchify) == image path."""
    policy_params, policy_cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.25, lr=5e-3, sample_k=2)
    clf = PromptTTAClassifier(policy_params, policy_cfg, reward, ecfg).setup(CLASSNAMES)
    rng = np.random.default_rng(11)
    u8 = rng.integers(0, 256, size=(2, 8, 32, 32, 3), dtype=np.uint8)
    from rlcf_tpu.models.clip import patch_tokens_from_images

    ptoks = np.stack([patch_tokens_from_images(v, policy_cfg.vision_patch_size) for v in u8])
    lg_img, _ = clf.adapt(u8)
    lg_tok, _ = clf.adapt_tokens(ptoks)
    np.testing.assert_allclose(np.asarray(lg_tok), np.asarray(lg_img), rtol=2e-4, atol=2e-4)
