"""Core TTA math: losses, reward processing, prompt splicing, episode engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from rlcf_tpu.core import losses as Lo
from rlcf_tpu.core import prompt as P
from rlcf_tpu.core.episode import EpisodeConfig, make_optimizer, make_tta_episode
from rlcf_tpu.core.reward import ClipReward, RewardConfig
from rlcf_tpu.models import clip as C

rng = np.random.default_rng(0)


# ---------------------------------------------------------------------------
# losses vs torch reference formulas
# ---------------------------------------------------------------------------


def test_select_confident_matches_reference():
    logits = rng.normal(size=(64, 10)).astype(np.float32)
    t = torch.from_numpy(logits)
    batch_entropy = -(t.softmax(1) * t.log_softmax(1)).sum(1)
    ref_idx = torch.argsort(batch_entropy, descending=False)[: int(64 * 0.1)].numpy()
    mine = np.asarray(Lo.select_confident(jnp.asarray(logits), 0.1))
    assert set(mine.tolist()) == set(ref_idx.tolist())


def test_avg_entropy_matches_reference():
    logits = rng.normal(size=(6, 40)).astype(np.float32)
    t = torch.from_numpy(logits)
    lp = t - t.logsumexp(dim=-1, keepdim=True)
    avg = lp.logsumexp(dim=0) - np.log(lp.shape[0])
    ref = -(avg * avg.exp()).sum(-1).item()
    mine = float(Lo.avg_entropy(jnp.asarray(logits)))
    assert abs(mine - ref) < 1e-5


def test_reinforce_loss_matches_reference():
    B, C_, K = 6, 40, 3
    logits = rng.normal(size=(B, C_)).astype(np.float32)
    idx = rng.integers(0, C_, size=(B, K)).astype(np.int64)
    rewards = rng.normal(size=(B * K,)).astype(np.float32)
    t_logits = torch.from_numpy(logits)
    rep = torch.repeat_interleave(t_logits, K, dim=0)
    all_loss = F.cross_entropy(rep, torch.from_numpy(idx.flatten()), reduction="none")
    ref = torch.mean(torch.from_numpy(rewards) * all_loss).item()
    mine = float(Lo.reinforce_loss(jnp.asarray(logits), jnp.asarray(idx.astype(np.int32)), jnp.asarray(rewards)))
    assert abs(mine - ref) < 1e-5


def test_rewards_post_process_properties():
    scores = jnp.asarray(rng.uniform(0, 2.5, size=(6, 3)).astype(np.float32))
    out = Lo.rewards_post_process(scores, reward_process=True, amplify=False)
    assert out.shape == (18,)
    np.testing.assert_allclose(np.asarray(out).reshape(6, 3).sum(-1), 0.0, atol=1e-5)
    # amplify divides by Bessel-corrected std like torch.std
    amp = Lo.rewards_post_process(scores, reward_process=True, amplify=True)
    t = torch.from_numpy(np.asarray(scores))
    ref = ((t - t.mean(-1, keepdim=True)) / (t.std(-1, keepdim=True) + 1e-5)).flatten().numpy()
    np.testing.assert_allclose(np.asarray(amp), ref, rtol=1e-4, atol=1e-5)
    # single-sample (K=1) scores pass through untouched
    one = jnp.asarray([[1.7]])
    np.testing.assert_allclose(np.asarray(Lo.rewards_post_process(one)), [1.7])


def test_clipscore_clamp():
    sim = jnp.asarray([[-0.2, 0.4]])
    np.testing.assert_allclose(np.asarray(Lo.clipscore(sim)), [[0.0, 1.0]])


def test_kd_losses_match_torch():
    s = rng.normal(size=(4, 16)).astype(np.float32)
    t = rng.normal(size=(4, 16)).astype(np.float32)
    ts, tt = torch.from_numpy(s), torch.from_numpy(t)

    ref_kd = (F.kl_div(F.log_softmax(ts, 1), F.softmax(tt, 1), reduction="batchmean")).item()
    mine_kd = float(Lo.kd_loss(jnp.asarray(s), jnp.asarray(t)))
    assert abs(mine_kd - ref_kd) < 1e-5

    target = tt.argmax(-1)
    gt_mask = torch.zeros_like(ts).scatter_(1, target.unsqueeze(1), 1).bool()
    p_s = F.softmax(ts, 1)
    p_t = F.softmax(tt, 1)
    cat = lambda p: torch.cat([(p * gt_mask).sum(1, keepdim=True), (p * ~gt_mask).sum(1, keepdim=True)], 1)
    tckd = F.kl_div(torch.log(cat(p_s)), cat(p_t), reduction="sum") / 4
    p_t2 = F.softmax(tt - 1000.0 * gt_mask, 1)
    lp_s2 = F.log_softmax(ts - 1000.0 * gt_mask, 1)
    nckd = F.kl_div(lp_s2, p_t2, reduction="sum") / 4
    ref_dkd = (1.0 * tckd + 0.5 * nckd).item()
    mine_dkd = float(Lo.dkd_loss(jnp.asarray(s), jnp.asarray(t), jnp.asarray(target.numpy())))
    assert abs(mine_dkd - ref_dkd) < 1e-4

    s_mu, s_std = ts.mean(-1, keepdim=True), ts.std(-1, unbiased=False, keepdim=True)
    t_mu, t_std = tt.mean(-1, keepdim=True), tt.std(-1, unbiased=False, keepdim=True)
    ns = (ts - s_mu) / (s_std + 1e-5) * 2.0
    nt = (tt - t_mu) / (t_std + 1e-5) * 2.0
    ref_atkd = (F.kl_div(F.log_softmax(ns, -1), F.softmax(nt, -1), reduction="none") * s_std * s_std).sum(-1).mean().item()
    mine_atkd = float(Lo.atkd_loss(jnp.asarray(s), jnp.asarray(t)))
    assert abs(mine_atkd - ref_atkd) < 1e-4


def test_adamw_matches_torch():
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.AdamW([tw], lr=5e-3, weight_decay=5e-4)
    ecfg = EpisodeConfig(lr=5e-3, weight_decay=5e-4)
    opt = make_optimizer(ecfg)
    jw = jnp.asarray(w0)
    state = opt.init(jw)
    for i in range(3):
        g = rng.normal(size=(5, 3)).astype(np.float32)
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()
        upd, state = opt.update(jnp.asarray(g), state, jw)
        jw = jw + upd  # optax.apply_updates
    np.testing.assert_allclose(np.asarray(jw), tw.detach().numpy(), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# prompt splicing
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_clip():
    cfg = C.CLIP_ARCHS["ViT-B/32"]
    # full-vocab text tower but tiny dims to exercise real tokenization
    cfg = C.ClipConfig("tiny-fullvocab", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_prompt_splice_reproduces_plain_embeddings(tiny_clip):
    """With word-initialized ctx, spliced prompts == embeddings of the full
    prompt strings — the reference PromptLearner invariant."""
    from rlcf_tpu.tokenizer import tokenize

    params, cfg = tiny_clip
    names = ["goldfish", "great white shark", "tiger cat"]
    pt = P.build_prompt_state(params, names, ctx_init="a photo of a")
    spliced = np.asarray(P.splice_prompts(pt.ctx0, pt))
    direct_tokens = tokenize([f"a photo of a {n}." for n in names])
    direct = np.asarray(params["text"]["token_embedding"])[direct_tokens]
    # state is truncated past max(eot) (exact-math dead-tail removal)
    T = spliced.shape[1]
    assert T <= 77 and T > int(direct_tokens.argmax(-1).max())
    np.testing.assert_allclose(spliced, direct[:, :T], rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pt.eot_idx), direct_tokens.argmax(-1))


def test_prompt_splice_gradient_only_through_ctx(tiny_clip):
    params, cfg = tiny_clip
    pt = P.build_prompt_state(params, ["cat", "dog"], ctx_init="a photo of a")

    def loss(ctx):
        return jnp.sum(P.splice_prompts(ctx, pt) ** 2)

    g = jax.grad(loss)(pt.ctx0)
    assert g.shape == pt.ctx0.shape
    assert float(jnp.abs(g).sum()) > 0


def test_prompt_middle_position(tiny_clip):
    params, cfg = tiny_clip
    pt = P.build_prompt_state(params, ["cat"], ctx_init="a photo [CLS] of a")
    # [CLS] at index 2 -> split_idx 2; assembled shape sane, eot consistent
    spliced = P.splice_prompts(pt.ctx0, pt)
    assert spliced.shape[1] % 8 == 0 and spliced.shape[1] > int(pt.eot_idx.max())
    assert pt.ctx0.shape[0] == 4  # "a photo of a" minus [CLS]


# ---------------------------------------------------------------------------
# episode engine
# ---------------------------------------------------------------------------


def _toy_setup(loss="rlcf", tta_steps=3, lr=0.05):
    """Tiny synthetic policy: logits = img_feats @ (W + ctx).T."""
    B, E, C_ = 16, 8, 5
    trng = np.random.default_rng(0)
    img_feats = jnp.asarray(trng.normal(size=(B, E)).astype(np.float32))
    W = jnp.asarray(trng.normal(size=(C_, E)).astype(np.float32))
    r_sim = jnp.asarray(trng.uniform(-0.2, 1.0, size=(B, C_)).astype(np.float32))

    def policy_logits(ctx, cache, idx):
        return cache["img"][idx] @ (W + ctx).T

    def reward_image_sim(views_sel):
        # views here are just indices into a fixed reward sim table
        return r_sim[views_sel[:, 0].astype(jnp.int32)]

    rcfg = RewardConfig(sample_k=3)
    reward = ClipReward.__new__(ClipReward)
    reward.rcfg = rcfg

    ecfg = EpisodeConfig(tta_steps=tta_steps, selection_p=0.25, lr=lr, weight_decay=0.0, loss=loss, sample_k=3)
    ep = make_tta_episode(policy_logits, reward_image_sim, reward.score_samples, ecfg, teacher_scale=10.0)
    views = jnp.arange(B, dtype=jnp.float32)[:, None]  # fake "views" = indices
    cache = {"img": img_feats}
    ctx0 = jnp.zeros((C_, E), jnp.float32)
    return ep, ctx0, cache, views


def test_episode_runs_and_is_pure():
    ep, ctx0, cache, views = _toy_setup()
    out1, aux1 = jax.jit(ep)(ctx0, cache, views)
    out2, aux2 = jax.jit(ep)(ctx0, cache, views)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert aux1["losses"].shape == (3,)
    assert aux1["selected"].shape == (4,)  # ceil(16 * 0.25)


def test_episode_zero_steps_is_zero_shot():
    ep, ctx0, cache, views = _toy_setup(tta_steps=0)
    out, aux = ep(ctx0, cache, views)
    expected = cache["img"][:1] @ (np.asarray(ctx0) + 0).T  # ctx0 = 0 -> W only
    # policy_logits uses W + ctx; recompute directly
    assert out.shape == (1, 5)
    assert aux["losses"].shape == (0,)


def test_episode_step0_vjp_matches_naive_grad():
    """The masked-cotangent step-0 gradient equals a naive recompute."""
    ep, ctx0, cache, views = _toy_setup(tta_steps=1, lr=0.05)
    out, aux = ep(ctx0, cache, views)

    # naive: full forward, select, loss, autodiff end-to-end
    B = 16
    from rlcf_tpu.core.losses import entropy_per_sample, reinforce_loss
    from rlcf_tpu.core.episode import make_optimizer, EpisodeConfig

    W = None  # reconstruct from closure is awkward; instead rerun toy pieces
    # Rebuild the same toy internals
    rng2 = np.random.default_rng(0)
    img_feats = jnp.asarray(rng2.normal(size=(16, 8)).astype(np.float32))
    Wm = jnp.asarray(rng2.normal(size=(5, 8)).astype(np.float32))
    r_sim = jnp.asarray(rng2.uniform(-0.2, 1.0, size=(16, 5)).astype(np.float32))

    def naive(ctx):
        logits_all = img_feats @ (Wm + ctx).T
        ent = entropy_per_sample(logits_all)
        sel = jax.lax.stop_gradient(jax.lax.top_k(-ent, 4)[1])
        logits = logits_all[sel]
        _, idx = jax.lax.top_k(logits, 3)
        sim = r_sim[sel]
        picked = jnp.take_along_axis(sim, idx, axis=-1)
        scores = 2.5 * jnp.maximum(picked, 0.0)
        rewards = jax.lax.stop_gradient(
            (scores - scores.mean(-1, keepdims=True)).reshape(-1)
        )
        return reinforce_loss(logits, idx, rewards)

    g = jax.grad(naive)(jnp.zeros((5, 8), jnp.float32))
    opt = make_optimizer(EpisodeConfig(tta_steps=1, lr=0.05, weight_decay=0.0))
    upd, _ = opt.update(g, opt.init(jnp.zeros((5, 8))), jnp.zeros((5, 8)))
    ctx1 = jnp.zeros((5, 8)) + upd
    final_naive = img_feats[:1] @ (Wm + ctx1).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(final_naive), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("loss", ["tpt", "kd", "dkd", "atkd"])
def test_episode_loss_variants_run(loss):
    ep, ctx0, cache, views = _toy_setup(loss=loss)
    out, aux = jax.jit(ep)(ctx0, cache, views)
    assert np.isfinite(np.asarray(aux["losses"])).all()


def test_episode_vmap_batches_independent():
    """vmapped episodes equal individually-run episodes."""
    ep, ctx0, cache, views = _toy_setup()
    imgs = jnp.stack([cache["img"], cache["img"] * 0.5])
    vs = jnp.stack([views, views])
    batched = jax.vmap(lambda i, v: ep(ctx0, {"img": i}, v))
    out_b, _ = batched(imgs, vs)
    out_0, _ = ep(ctx0, {"img": imgs[0]}, vs[0])
    out_1, _ = ep(ctx0, {"img": imgs[1]}, vs[1])
    # Semantically independent; numerically the step-0 selected-view forward
    # recompute (core/episode.py step-0 strategy) batches differently under
    # vmap than solo, so accumulation order shifts at float tolerance.
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_0), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_b[1]), np.asarray(out_1), rtol=2e-3, atol=2e-3)


def test_momentum_update_batch_equals_sequential():
    """Fused group fold == N sequential momentum_update calls (re-anchor mid-group)."""
    import jax
    import jax.numpy as jnp
    from rlcf_tpu.core import policy as Po

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32)),
              "b": jnp.asarray(rng.normal(size=(4,)).astype(np.float32))}
    adapted = {k: jnp.asarray(rng.normal(size=(5,) + tuple(v.shape)).astype(np.float32))
               for k, v in params.items()}
    kw = dict(momentum=0.9, update_freq=3, update_w=0.7)  # re-anchors at i=2 within the group

    seq = Po.MomentumState.create(params)
    for i in range(5):
        a_i = jax.tree_util.tree_map(lambda a: a[i], adapted)
        seq = Po.momentum_update(seq, a_i, **kw)

    bat = Po.momentum_update_batch(Po.MomentumState.create(params), adapted, **kw)
    assert bat.counter == seq.counter == 2
    for k in params:
        np.testing.assert_allclose(np.asarray(bat.ema_params[k]), np.asarray(seq.ema_params[k]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(bat.reset_params[k]), np.asarray(seq.reset_params[k]), rtol=1e-6)
