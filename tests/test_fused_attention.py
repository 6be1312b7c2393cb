"""VMEM-fused attention kernel vs the dense path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import rlcf_tpu.ops.pallas_attention as PA
from rlcf_tpu.models import layers as L
from rlcf_tpu.ops.pallas_attention import _dense_reference, fused_attention
import pytest


def test_fused_attention_matches_dense():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(3, 17, 3 * 32)).astype(np.float32))
    got = fused_attention(qkv, None, n_heads=4, scale=0.3535, interpret=True)
    want = _dense_reference(qkv, n_heads=4, scale=0.3535)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_attention_masked_matches_dense():
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.normal(size=(2, 13, 3 * 32)).astype(np.float32))
    mask = L.causal_mask(13)
    got = fused_attention(qkv, mask, n_heads=4, scale=0.25, interpret=True)
    want = _dense_reference(qkv, n_heads=4, scale=0.25, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_attention_grad_matches_dense():
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.normal(size=(2, 9, 3 * 16)).astype(np.float32))

    g_fused = jax.grad(lambda t: jnp.sum(fused_attention(t, None, 2, 0.25, True) ** 2))(qkv)
    g_dense = jax.grad(lambda t: jnp.sum(_dense_reference(t, 2, 0.25) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_dense), rtol=1e-4, atol=1e-4)


def test_fused_attention_masked_grad_matches_dense():
    """The flash-style fused backward == autodiff of the dense path (causal)."""
    rng = np.random.default_rng(4)
    qkv = jnp.asarray(rng.normal(size=(2, 11, 3 * 16)).astype(np.float32))
    mask = L.causal_mask(11)

    g_fused = jax.grad(lambda t: jnp.sum(fused_attention(t, mask, 2, 0.25, True) ** 2))(qkv)
    g_dense = jax.grad(lambda t: jnp.sum(_dense_reference(t, 2, 0.25, mask=mask) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_dense), rtol=1e-4, atol=1e-4)


def test_multi_head_attention_fused_routing(monkeypatch):
    """layers.multi_head_attention(attn='fused') == dense, unmasked and
    masked (the kernel carries the additive causal mask)."""
    orig = PA.fused_attention
    monkeypatch.setattr(  # no TPU in tests: route the kernel through interpret
        PA, "fused_attention", lambda qkv, m, h, s, interpret=False: orig(qkv, m, h, s, True)
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 32)).astype(np.float32))
    qkv_w = jnp.asarray(rng.normal(size=(32, 96)).astype(np.float32)) * 0.1
    out_w = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32)) * 0.1
    args = (x, qkv_w, jnp.zeros((96,)), out_w, jnp.zeros((32,)), 4)

    dense = L.multi_head_attention(*args)
    fused = L.multi_head_attention(*args, attn="fused")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense), rtol=1e-5, atol=1e-5)

    mask = L.causal_mask(8)
    np.testing.assert_allclose(
        np.asarray(L.multi_head_attention(*args, mask=mask, attn="fused")),
        np.asarray(L.multi_head_attention(*args, mask=mask)),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.slow
def test_full_prompt_episode_fused_matches_dense(monkeypatch):
    """A complete tiny prompt-TTA run with EVERY tower forced through the
    fused attention kernel (interpret mode) == the dense run — integration
    pin for the rollout (CPU CI otherwise only exercises the kernel units)."""
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.tasks.classification import PromptTTAClassifier

    cfg = C.ClipConfig("fused-int", 16, 32, 1, 32, 16, 32, 1,
                       vision_heads_override=2, text_heads_override=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), cfg), cfg, RewardConfig(sample_k=2))
    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.5, lr=5e-3, sample_k=2)
    names = ["cat", "dog", "owl", "car"]
    views = np.random.default_rng(0).normal(size=(2, 4, 32, 32, 3)).astype(np.float32)

    dense_clf = PromptTTAClassifier(params, cfg, reward, ecfg, ctx_init="a photo of a")
    dense_clf.setup(names)
    lg_dense, _ = dense_clf.adapt(views)

    orig = PA.fused_attention
    monkeypatch.setattr(
        PA, "fused_attention", lambda qkv, m, h, s, interpret=False: orig(qkv, m, h, s, True)
    )
    monkeypatch.setattr(C, "best_attn", lambda cfg=None, sharded=False: "fused")
    fused_clf = PromptTTAClassifier(params, cfg, reward, ecfg, ctx_init="a photo of a")
    fused_clf.setup(names)
    lg_fused, _ = fused_clf.adapt(views)
    np.testing.assert_allclose(np.asarray(lg_fused), np.asarray(lg_dense), rtol=2e-4, atol=2e-4)
