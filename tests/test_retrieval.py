"""Retrieval TTA: metrics parity, gallery caching, i2t/t2i episodes."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlcf_tpu.core.episode import EpisodeConfig
from rlcf_tpu.core.reward import ClipReward, RewardConfig
from rlcf_tpu.metrics.retrieval import retrieval_metrics
from rlcf_tpu.models import clip as C
from rlcf_tpu.tasks.retrieval import (
    RetrievalTTA,
    encode_image_gallery,
    encode_text_gallery,
    load_karpathy_annotations,
    zero_shot_scores,
)

TEXTS = [
    "a man riding a wave on a surfboard",
    "two dogs playing in the snow",
    "a kitchen with a stove and sink",
    "a group of people at a market",
    "a plane flying over mountains",
    "a cat sleeping on a couch",
]


def tiny_cfg(name):
    return C.ClipConfig(name, 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg("tiny-ret")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    rcfg = tiny_cfg("tiny-ret-reward")
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), rcfg), rcfg, RewardConfig(sample_k=3))
    return params, cfg, reward


def test_retrieval_metrics_reference_semantics():
    # 2 images x 4 texts; img0's captions are texts {0,1}; img1's are {2,3}
    scores_i2t = np.array([[0.9, 0.1, 0.5, 0.2], [0.1, 0.8, 0.2, 0.9]])
    scores_t2i = np.array([[0.9, 0.1], [0.2, 0.3], [0.6, 0.4], [0.1, 0.7]])
    img2txt = {0: [0, 1], 1: [2, 3]}
    txt2img = {0: 0, 1: 0, 2: 1, 3: 1}
    m = retrieval_metrics(scores_i2t, scores_t2i, txt2img, img2txt)
    # img0: best GT caption 0 at rank 0 -> hit@1. img1: caption 3 at rank 0.
    assert m["txt_r1"] == 100.0
    # t2i: text0->img0 rank0 ok; text1->img0 rank1; text2->img1 rank1; text3->img1 rank0
    assert m["img_r1"] == 50.0
    assert m["img_r5"] == 100.0
    assert abs(m["r_mean"] - (m["txt_r_mean"] + m["img_r_mean"]) / 2) < 1e-9


def test_load_karpathy_annotations(tmp_path):
    ann = [
        {"image": "a.jpg", "caption": ["cap one", "cap two"]},
        {"image": "b.jpg", "caption": ["cap three"]},
    ]
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    g = load_karpathy_annotations(str(p), vis_root="/imgs")
    assert g.image_paths == ["/imgs/a.jpg", "/imgs/b.jpg"]
    assert g.texts == ["cap one", "cap two", "cap three"]
    assert g.img2txt == {0: [0, 1], 1: [2]}
    assert g.txt2img == {0: 0, 1: 0, 2: 1}


def test_text_gallery_normalized(setup):
    params, cfg, _ = setup
    feats, tokens = encode_text_gallery(params, cfg, TEXTS, batch_size=4)
    assert feats.shape == (6, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, rtol=1e-5)


def _images(n, res=32, seed=0):
    return np.random.default_rng(seed).normal(size=(n, res, res, 3)).astype(np.float32)


def test_i2t_tta_end_to_end(setup):
    params, cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=2, lr=1e-5, sample_k=3, adam_eps=1e-6, weight_decay=5e-4)
    tta = RetrievalTTA(params, cfg, reward, ecfg, direction="i2t").set_text_gallery(TEXTS)
    imgs = _images(3)
    scores = tta.run(iter(imgs), total=3, gallery_size=6, group_size=2)
    assert scores.shape == (3, 6)
    assert np.isfinite(scores).all()
    assert (scores > -100).all()  # every row filled


def test_t2i_tta_end_to_end(setup):
    params, cfg, reward = setup
    from rlcf_tpu.tokenizer import tokenize

    ecfg = EpisodeConfig(tta_steps=2, lr=1e-5, sample_k=2, adam_eps=1e-6)
    tta = RetrievalTTA(params, cfg, reward, ecfg, direction="t2i")
    gallery_imgs = _images(4, seed=1)
    tta.set_image_gallery([gallery_imgs], [gallery_imgs])
    tokens = tokenize(TEXTS[:3])
    scores = tta.run(iter(tokens), total=3, gallery_size=4, group_size=2)
    assert scores.shape == (3, 4)
    assert np.isfinite(scores).all()


def test_t2i_factored_matches_full(setup):
    """The factored-embedding trainable (gathered query rows + first-occurrence
    one-hot; Adam state only for touched rows) must be output-identical to
    training the full text tower incl. the whole token embedding: untouched
    rows only ever receive pure weight decay, which the final forward never
    reads, and duplicate-position grads accumulate onto the first-occurrence
    row exactly like torch's embedding scatter-add."""
    params, cfg, reward = setup
    from rlcf_tpu.tokenizer import tokenize

    # lr large enough that the adapted embedding rows actually matter
    ecfg = EpisodeConfig(tta_steps=3, lr=5e-3, sample_k=2, adam_eps=1e-6, weight_decay=5e-4)
    gallery_imgs = _images(4, seed=1)
    scores = {}
    for factored in (False, True):
        tta = RetrievalTTA(params, cfg, reward, ecfg, direction="t2i", factor_embedding=factored)
        tta.set_image_gallery([gallery_imgs], [gallery_imgs])
        assert tta.factor_embedding is factored
        # duplicate real tokens in-query ("dogs ... dogs") to exercise the
        # duplicate-row grad accumulation, plus the usual run of pad zeros
        tokens = tokenize(["two dogs chasing three dogs in deep snow", TEXTS[2]])
        scores[factored] = tta.adapt_queries(np.asarray(tokens))
    np.testing.assert_allclose(scores[True], scores[False], rtol=2e-5, atol=2e-5)
    # and the factored trainable is actually small: no vocab-sized leaf
    tta_f = RetrievalTTA(params, cfg, reward, ecfg, direction="t2i")
    assert all(l.shape[0] != cfg.vocab_size for l in jax.tree.leaves(tta_f.trainable0))
    assert tta_f.trainable_bytes() < 0.5 * sum(
        l.size * l.dtype.itemsize for l in jax.tree.leaves(params["text"])
    )


def test_hbm_group_cap(setup):
    params, cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=1, lr=1e-5, sample_k=2)
    tta = RetrievalTTA(params, cfg, reward, ecfg, direction="i2t").set_text_gallery(TEXTS)
    assert tta.hbm_group_cap(hbm_limit_bytes=None) in (None, tta.hbm_group_cap())  # CPU: stats-free
    # explicit budget: fixed footprint ~1G slack dominates tiny params; a
    # 100G budget allows a huge group, a tiny budget clamps to 1
    assert tta.hbm_group_cap(hbm_limit_bytes=int(100e9)) > 1000
    assert tta.hbm_group_cap(hbm_limit_bytes=int(1e9)) == 1


def test_i2t_adapts_scores(setup):
    params, cfg, reward = setup
    imgs = _images(2)
    base = RetrievalTTA(params, cfg, reward, EpisodeConfig(tta_steps=0, sample_k=3)).set_text_gallery(TEXTS)
    tuned = RetrievalTTA(params, cfg, reward, EpisodeConfig(tta_steps=3, lr=1e-3, sample_k=3)).set_text_gallery(TEXTS)
    s0 = base.adapt_queries(imgs)
    s3 = tuned.adapt_queries(imgs)
    assert np.abs(s0 - s3).max() > 1e-5


def test_zero_shot_scores(setup):
    params, cfg, _ = setup
    img_feats = jnp.asarray(np.random.default_rng(0).normal(size=(3, cfg.embed_dim)).astype(np.float32))
    txt_feats = jnp.asarray(np.random.default_rng(1).normal(size=(5, cfg.embed_dim)).astype(np.float32))
    i2t, t2i = zero_shot_scores(params, cfg, img_feats, txt_feats)
    assert i2t.shape == (3, 5) and t2i.shape == (5, 3)
    np.testing.assert_allclose(i2t.T, t2i)


def test_momentum_retrieval(setup):
    params, cfg, reward = setup
    ecfg = EpisodeConfig(tta_steps=1, lr=1e-3, sample_k=2)
    tta = RetrievalTTA(
        params, cfg, reward, ecfg, direction="i2t", momentum_update=True, update_freq=2, momentum=0.5
    ).set_text_gallery(TEXTS)
    imgs = _images(2)
    tta.adapt_queries(imgs)
    assert tta.momentum_state.counter == 0  # anchored after 2 episodes
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), tta.momentum_state.reset_params, tta.trainable0
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_blip_caption_process():
    from rlcf_tpu.tasks.retrieval import blip_caption_process

    assert blip_caption_process('A Man "Rides"! a wave.') == "a man rides a wave"
    long = " ".join(["word"] * 60)
    assert len(blip_caption_process(long).split()) == 50
    assert blip_caption_process("hi", prompt="a photo of ") == "a photo of hi"
