"""Encoder TTA (CLIPCLS_TTA parity): partitioning, momentum EMA, episodes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlcf_tpu.core import policy as Po
from rlcf_tpu.core.episode import EpisodeConfig
from rlcf_tpu.core.reward import ClipReward, RewardConfig
from rlcf_tpu.models import clip as C
from rlcf_tpu.tasks.classification import EncoderTTAClassifier

CLASSNAMES = ["goldfish", "tiger cat", "airliner"]


def tiny_cfg(name, vit=True):
    if vit:
        return C.ClipConfig(name, 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    return C.ClipConfig(name, 32, 32, (1, 1, 1, 1), 8, None, 32, 1, vision_heads_override=2, text_heads_override=2)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg("tiny-policy")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    rcfg = tiny_cfg("tiny-reward")
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), rcfg), rcfg, RewardConfig(sample_k=2))
    return params, cfg, reward


def make_views(n_samples=2, n_views=8, res=32, seed=0):
    r = np.random.default_rng(seed)
    return r.normal(size=(n_samples, n_views, res, res, 3)).astype(np.float32)


def test_partition_norm_only():
    cfg = tiny_cfg("t")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    sel, rest = Po.partition(params["visual"], Po.norm_only_filter)
    sel_leaves = [x for x in jax.tree_util.tree_leaves(sel) if x is not None]
    assert len(sel_leaves) > 0
    merged = Po.merge(sel, rest)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), merged, params["visual"]
    )
    # only norm affine leaves selected (stacked blocks make them [L, D])
    flat = jax.tree_util.tree_flatten_with_path(sel)[0]
    for path, leaf in flat:
        if leaf is not None:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            assert "ln" in name or "bn" in name, name
            assert not any(s in name for s in ("qkv", "conv", "proj", "fc", "out_w", "out_b")), name


def test_momentum_state_update():
    params = {"w": jnp.ones((2,))}
    st = Po.MomentumState.create(params)
    adapted = {"w": jnp.zeros((2,))}
    st = Po.momentum_update(st, adapted, momentum=0.5, update_freq=2, update_w=1.0)
    np.testing.assert_allclose(np.asarray(st.ema_params["w"]), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(st.reset_params["w"]), [1.0, 1.0])  # not yet anchored
    st = Po.momentum_update(st, adapted, momentum=0.5, update_freq=2, update_w=1.0)
    np.testing.assert_allclose(np.asarray(st.ema_params["w"]), [0.25, 0.25])
    np.testing.assert_allclose(np.asarray(st.reset_params["w"]), [0.25, 0.25])  # anchored to ema
    assert st.counter == 0


@pytest.mark.slow
def test_encoder_tta_end_to_end(setup):
    params, cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.25, lr=1e-4, sample_k=2)
    clf = EncoderTTAClassifier(params, cfg, reward, ecfg).setup(CLASSNAMES)
    views = make_views()
    logits, aux = clf.adapt(views)
    assert logits.shape == (2, 3)
    assert np.isfinite(np.asarray(logits)).all()
    # purity: rerun identical
    logits2, _ = clf.adapt(views)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))


def test_encoder_tta_only_norm(setup):
    params, cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=1, selection_p=0.25, lr=1e-3, sample_k=2)
    clf = EncoderTTAClassifier(params, cfg, reward, ecfg, only_norm=True).setup(CLASSNAMES)
    logits, _ = clf.adapt(make_views())
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_encoder_tta_momentum_changes_anchor(setup):
    params, cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=1, selection_p=0.25, lr=1e-2, sample_k=2)
    clf = EncoderTTAClassifier(
        params, cfg, reward, ecfg, momentum_update=True, update_freq=2, momentum=0.5
    ).setup(CLASSNAMES)
    views = make_views()
    l1, _ = clf.adapt(views)  # 2 episodes -> update_freq reached -> anchor moves
    assert clf.momentum_state.counter == 0
    # anchored reset params differ from originals
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), clf.momentum_state.reset_params, clf.trainable0
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    # subsequent adapt uses new anchor -> logits change for same views
    l2, _ = clf.adapt(views)
    assert np.abs(np.asarray(l1) - np.asarray(l2)).max() > 1e-6


@pytest.mark.slow
def test_encoder_tta_resnet_bn_prior():
    cfg = tiny_cfg("tiny-rn", vit=False)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    rcfg = tiny_cfg("tiny-reward")
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), rcfg), rcfg, RewardConfig(sample_k=2))
    ecfg = EpisodeConfig(tta_steps=1, selection_p=0.25, lr=1e-4, sample_k=2)
    clf = EncoderTTAClassifier(params, cfg, reward, ecfg, bn_prior=0.94).setup(CLASSNAMES)
    logits, _ = clf.adapt(make_views())
    assert np.isfinite(np.asarray(logits)).all()
