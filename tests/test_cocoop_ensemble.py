"""CoCoOp classifier + multi-model reward ensembles end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlcf_tpu.core.episode import EpisodeConfig
from rlcf_tpu.core.reward import ClipReward, ClipRewardEnsemble, RewardConfig, CONFIDENCE_WEIGHTS
from rlcf_tpu.models import clip as C
from rlcf_tpu.tasks.classification import (
    CoCoOpTTAClassifier,
    PromptTTAClassifier,
    convert_cocoop_checkpoint,
    init_meta_net,
)

CLASSNAMES = ["goldfish", "tiger cat", "airliner"]


def tiny_cfg(name, res=32):
    return C.ClipConfig(name, 16, res, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)


def make_views(n=2, b=8, res=32, seed=0):
    return np.random.default_rng(seed).normal(size=(n, b, res, res, 3)).astype(np.float32)


@pytest.mark.slow
def test_cocoop_end_to_end():
    cfg = tiny_cfg("cocoop-policy")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    clf = CoCoOpTTAClassifier(params, cfg, EpisodeConfig(tta_steps=2, selection_p=0.25, loss="tpt")).setup(CLASSNAMES)
    logits, aux = clf.adapt(make_views())
    assert logits.shape == (2, 3)
    assert np.isfinite(np.asarray(logits)).all()
    # image-conditioned: different images produce different initial ctx ->
    # different logits even at tta_steps=0
    clf0 = CoCoOpTTAClassifier(params, cfg, EpisodeConfig(tta_steps=0, selection_p=0.25, loss="tpt")).setup(CLASSNAMES)
    v = make_views()
    l0, _ = clf0.adapt(v)
    l1, _ = clf0.adapt(v * 0.5)
    assert np.abs(np.asarray(l0) - np.asarray(l1)).max() > 1e-5


def test_cocoop_checkpoint_converter():
    sd = {
        "prompt_generator.ctx": np.random.default_rng(0).normal(size=(4, 32)).astype(np.float32),
        "prompt_generator.meta_net.linear1.weight": np.zeros((2, 16), np.float32),
        "prompt_generator.meta_net.linear1.bias": np.zeros((2,), np.float32),
        "prompt_generator.meta_net.linear2.weight": np.zeros((32, 2), np.float32),
        "prompt_generator.meta_net.linear2.bias": np.zeros((32,), np.float32),
    }
    ctx, meta = convert_cocoop_checkpoint(sd)
    assert ctx.shape == (4, 32)
    assert meta["w1"].shape == (16, 2) and meta["w2"].shape == (2, 32)


def test_reward_ensemble_weights_and_scoring():
    rcfg = RewardConfig(sample_k=2)
    members = []
    for i, name in enumerate(["ViT-L/14", "ViT-B/16"]):
        cfg = tiny_cfg(name)
        members.append(ClipReward(C.init_clip_params(jax.random.PRNGKey(i), cfg), cfg, rcfg))
    ens = ClipRewardEnsemble(members, rcfg)
    total = CONFIDENCE_WEIGHTS["ViT-L/14"] + CONFIDENCE_WEIGHTS["ViT-B/16"]
    assert ens.weights == [round(5 / total, 2), round(1 / total, 2)]
    sims = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 1, size=(2, 4, 3)).astype(np.float32))
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 3, size=(4, 2)).astype(np.int32))
    out = ens.score_samples(sims, idx)
    assert out.shape == (8,)
    # per-view baseline subtraction -> zero-mean rows
    np.testing.assert_allclose(np.asarray(out).reshape(4, 2).sum(-1), 0.0, atol=1e-5)


def test_prompt_tta_with_ensemble_reward():
    cfg = tiny_cfg("policy")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    rcfg = RewardConfig(sample_k=2)
    members = [
        ClipReward(C.init_clip_params(jax.random.PRNGKey(i + 1), tiny_cfg(f"r{i}", res=32 if i == 0 else 64)),
                   tiny_cfg(f"r{i}", res=32 if i == 0 else 64), rcfg)
        for i in range(2)
    ]
    ens = ClipRewardEnsemble(members, rcfg)
    clf = PromptTTAClassifier(params, cfg, ens, EpisodeConfig(tta_steps=2, selection_p=0.25, sample_k=2)).setup(CLASSNAMES)
    logits, _ = clf.adapt(make_views())
    assert logits.shape == (2, 3)
    assert np.isfinite(np.asarray(logits)).all()
