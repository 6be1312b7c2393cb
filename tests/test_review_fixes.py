"""Regression tests for code-review findings (round 1).

Each test pins one of the review-driven fixes:
- runner.build_optimizer must be decoupled AdamW (decay after Adam), not Adam+L2
- CaptionTTA default token_pad_len must cover max_new_tokens (no silent truncation)
- CaptionTTA / make_caption_trainer use eps=1e-6 (`caption/train.py:96`, `capdec_tta.py:189`)
- build_prompt_state derives n_ctx from a provided ctx0 when ctx_init is falsy
- learned_cls with a non-'end' ctx_position raises instead of silently dropping cls
- ensemble rewards are rejected by paths that need a single teacher
- select_confident floors (reference `int(B * p)` semantics)
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rlcf_tpu.core.episode import EpisodeConfig
from rlcf_tpu.core.losses import select_confident
from rlcf_tpu.core.prompt import build_prompt_state
from rlcf_tpu.core.reward import ClipReward, ClipRewardEnsemble, RewardConfig
from rlcf_tpu.core.runner import RunnerConfig, build_optimizer
from rlcf_tpu.models import clip as C


def tiny_cfg(name, res=32):
    return C.ClipConfig(name, 16, res, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)


def _tiny_ensemble(seed=0):
    rcfg = RewardConfig(sample_k=2)
    members = [
        ClipReward(C.init_clip_params(jax.random.PRNGKey(seed + i), tiny_cfg(f"r{i}")), tiny_cfg(f"r{i}"), rcfg)
        for i in range(2)
    ]
    return ClipRewardEnsemble(members, rcfg)


def test_build_optimizer_is_decoupled_adamw():
    """One step of build_optimizer must equal optax.adamw (decoupled decay),
    which differs from the old Adam+L2 ordering for any nonzero gradient."""
    cfg = RunnerConfig(init_lr=0.1, warmup_steps=0, weight_decay=0.5, max_epoch=1, steps_per_epoch=10)
    params = {"w": jnp.asarray([[1.0, -2.0], [0.5, 3.0]]), "b": jnp.asarray([0.3, -0.1])}
    grads = {"w": jnp.asarray([[0.2, -0.4], [1.0, 0.0]]), "b": jnp.asarray([0.5, -0.5])}

    from rlcf_tpu.core.runner import build_lr_schedule

    mine = build_optimizer(cfg, params)
    ref = optax.adamw(
        build_lr_schedule(cfg), weight_decay=0.5,
        mask={"w": True, "b": False},
    )
    s1, s2 = mine.init(params), ref.init(params)
    for _ in range(3):
        u1, s1 = mine.update(grads, s1, params)
        u2, s2 = ref.update(grads, s2, params)
        p1 = optax.apply_updates(params, u1)
        p2 = optax.apply_updates(params, u2)
        np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(p1["b"]), np.asarray(p2["b"]), atol=1e-7)


def test_caption_tta_default_pad_covers_generation():
    from rlcf_tpu.models import mappers as M
    from rlcf_tpu.models import opt as O
    from rlcf_tpu.tasks import caption as Cap

    ocfg = O.OPT_CONFIGS["test-tiny-opt"]
    mcfg = M.MapperConfig("transformer", clip_dim=16, llm_dim=32, prefix_length=4,
                          clip_length=2, num_layers=1, n_heads=2)
    ccfg = Cap.CaptionModelConfig(mapper=mcfg, opt=ocfg)
    params = Cap.init_caption_params(jax.random.PRNGKey(0), ccfg)
    rcfg = tiny_cfg("tiny-reward")
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), rcfg), rcfg, RewardConfig(sample_k=3))

    class _Tok:  # never called — only construction is under test
        pass

    tta = Cap.CaptionTTA(params, ccfg, reward, _Tok(), max_new_tokens=50)
    assert tta.token_pad_len >= 50 + 1  # room for every generated token + BOS
    tta2 = Cap.CaptionTTA(params, ccfg, reward, _Tok(), max_new_tokens=6, token_pad_len=10)
    assert tta2.token_pad_len == 10  # explicit override respected


def test_prompt_state_n_ctx_from_ctx0_without_ctx_init():
    cfg = tiny_cfg("p")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    ctx0 = jnp.zeros((6, 16), jnp.float32)
    st = build_prompt_state(params, ["cat", "dog"], ctx_init=None, n_ctx=4, ctx0=ctx0)
    assert st.n_ctx == 6
    assert int(np.asarray(st.ctx_map).max()) == 5  # all six slots mapped


def test_learned_cls_requires_end_position():
    cfg = tiny_cfg("p")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="learned_cls"):
        build_prompt_state(params, ["cat"], ctx_init=None, learned_cls=True, ctx_position="front")


def test_ensemble_rejected_where_single_teacher_needed():
    from rlcf_tpu.tasks.classification import EncoderTTAClassifier, PromptTTAClassifier
    from rlcf_tpu.tasks.retrieval import RetrievalTTA

    cfg = tiny_cfg("policy")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    ens = _tiny_ensemble()
    with pytest.raises(ValueError, match="single"):
        EncoderTTAClassifier(params, cfg, ens, EpisodeConfig(tta_steps=1))
    with pytest.raises(ValueError, match="single"):
        RetrievalTTA(params, cfg, ens, EpisodeConfig(tta_steps=1))
    with pytest.raises(ValueError, match="rlcf"):
        PromptTTAClassifier(params, cfg, ens, EpisodeConfig(tta_steps=1, loss="kd")).setup(["cat", "dog"])


def test_select_confident_floors():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(10, 4)).astype(np.float32))
    assert select_confident(logits, 0.25).shape == (2,)  # floor(2.5)
    assert select_confident(logits, 0.05).shape == (1,)  # min 1
