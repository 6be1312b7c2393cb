"""Retrieval TTA vs an independent torch-autograd replica of `tune_image`.

Uses the golden tiny full-vocab CLIP (the episode-parity fixture) in torch to
replay the reference retrieval inner loop (`clip_ret_policy.py:76-103`):
tta_steps of {logits = scale * img @ gallery.T, top-k, CLIPScore vs reward
gallery, per-query baseline subtraction, reward-weighted CE, AdamW(eps=1e-6)
on the visual tower}, then the final score row. Asserts the rlcf_tpu
RetrievalTTA reproduces the adapted scores.
"""

import os

import numpy as np
import pytest
import torch

from rlcf_tpu.core.episode import EpisodeConfig
from rlcf_tpu.core.reward import ClipReward, RewardConfig
from rlcf_tpu.models.convert import convert_clip_state_dict
from rlcf_tpu.tasks.retrieval import RetrievalTTA

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_episode.npz")

TEXTS = [
    "a man riding a wave",
    "two dogs in the snow",
    "a kitchen with a stove",
    "people at a market",
    "a plane over mountains",
    "a cat on a couch",
]


class TorchTinyClip(torch.nn.Module):
    """Minimal torch replica of the golden tiny CLIP (ViT + text towers)."""

    def __init__(self, sd):
        super().__init__()
        self.sd = {k: torch.nn.Parameter(torch.from_numpy(np.asarray(v).copy())) for k, v in sd.items()}
        for k, p in self.sd.items():
            self.register_parameter(k.replace(".", "__"), p)

    def _ln(self, x, w, b):
        return torch.nn.functional.layer_norm(x.float(), (x.shape[-1],), w, b).to(x.dtype)

    def _block(self, x, i, prefix, heads, mask=None):
        g = lambda n: self.sd[f"{prefix}.resblocks.{i}.{n}"]
        h = self._ln(x, g("ln_1.weight"), g("ln_1.bias"))
        qkv = h @ g("attn.in_proj_weight").T + g("attn.in_proj_bias")
        q, k, v = qkv.chunk(3, dim=-1)
        B, T, D = q.shape
        hd = D // heads
        s = lambda t: t.reshape(B, T, heads, hd).transpose(1, 2)
        att = (s(q) @ s(k).transpose(-1, -2)) / np.sqrt(hd)
        if mask is not None:
            att = att + mask
        att = att.softmax(-1)
        out = (att @ s(v)).transpose(1, 2).reshape(B, T, D)
        x = x + out @ g("attn.out_proj.weight").T + g("attn.out_proj.bias")
        h = self._ln(x, g("ln_2.weight"), g("ln_2.bias"))
        h = h @ g("mlp.c_fc.weight").T + g("mlp.c_fc.bias")
        h = h * torch.sigmoid(1.702 * h)
        x = x + h @ g("mlp.c_proj.weight").T + g("mlp.c_proj.bias")
        return x

    def encode_image(self, images):  # NCHW
        sd = self.sd
        x = torch.nn.functional.conv2d(images, sd["visual.conv1.weight"], stride=8)
        B, W, gh, gw = x.shape
        x = x.reshape(B, W, gh * gw).permute(0, 2, 1)
        cls = sd["visual.class_embedding"].expand(B, 1, -1)
        x = torch.cat([cls, x], dim=1) + sd["visual.positional_embedding"]
        x = self._ln(x, sd["visual.ln_pre.weight"], sd["visual.ln_pre.bias"])
        for i in range(2):
            x = self._block(x, i, "visual.transformer", heads=1)
        x = self._ln(x[:, 0], sd["visual.ln_post.weight"], sd["visual.ln_post.bias"])
        return x @ sd["visual.proj"]

    def encode_text(self, tokens):
        sd = self.sd
        x = sd["token_embedding.weight"][tokens] + sd["positional_embedding"][: tokens.shape[1]]
        T = tokens.shape[1]
        mask = torch.triu(torch.full((T, T), float("-inf")), diagonal=1)
        for i in range(2):
            x = self._block(x, i, "transformer", heads=1, mask=mask)
        x = self._ln(x, sd["ln_final.weight"], sd["ln_final.bias"])
        eot = tokens.argmax(dim=-1)
        return x[torch.arange(x.shape[0]), eot] @ sd["text_projection"]


def test_retrieval_i2t_matches_torch_replica():
    import pytest as _pytest

    if not os.path.exists(FIXTURE):
        _pytest.skip("golden fixture missing (regenerate: see tests/conftest.py)")
    data = np.load(FIXTURE, allow_pickle=True)
    policy_sd = {k[len("policy::"):]: data[k] for k in data.files if k.startswith("policy::")}
    reward_sd = {k[len("reward::"):]: data[k] for k in data.files if k.startswith("reward::")}

    # --- torch replica sanity: matches the jax towers -------------------
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.tokenizer import tokenize

    t_policy = TorchTinyClip(policy_sd)
    j_params, j_cfg = convert_clip_state_dict(policy_sd)
    img = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_feat = t_policy.encode_image(torch.from_numpy(img)).numpy()
    j_feat = np.asarray(C.encode_image(j_params, j_cfg, img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(j_feat, t_feat, rtol=2e-4, atol=2e-5)

    # --- torch replica of tune_image ------------------------------------
    sample_k, tta_steps, lr, wd = 3, 2, 1e-3, 5e-4
    tokens = tokenize(TEXTS, truncate=True)
    t_reward = TorchTinyClip(reward_sd)
    with torch.no_grad():
        gal = t_policy.encode_text(torch.from_numpy(tokens.astype(np.int64)))
        gal = gal / gal.norm(dim=-1, keepdim=True)
        r_gal = t_reward.encode_text(torch.from_numpy(tokens.astype(np.int64)))
        r_gal = r_gal / r_gal.norm(dim=-1, keepdim=True)

    query = np.random.default_rng(1).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        r_img = t_reward.encode_image(torch.from_numpy(query))
        r_img = r_img / r_img.norm(dim=-1, keepdim=True)

    visual_params = [p for k, p in t_policy.sd.items() if k.startswith("visual")]
    for k, p in t_policy.sd.items():
        p.requires_grad_(k.startswith("visual"))
    opt = torch.optim.AdamW(visual_params, lr=lr, eps=1e-6, weight_decay=wd)
    scale = torch.exp(torch.from_numpy(np.asarray(policy_sd["logit_scale"])))
    for _ in range(tta_steps):
        opt.zero_grad()
        feats = t_policy.encode_image(torch.from_numpy(query))
        feats = feats / feats.norm(dim=-1, keepdim=True)
        logits = scale * feats @ gal.T
        _, idx = torch.topk(logits, sample_k, dim=-1)
        flat = idx.flatten()
        with torch.no_grad():
            sim = 2.5 * torch.sum(r_gal[flat] * r_img.repeat_interleave(sample_k, 0), dim=-1)
            score = torch.clamp(sim, min=0.0).reshape(1, -1)
            rewards = (score - score.mean(-1, keepdim=True)).flatten()
        rep = torch.repeat_interleave(logits, sample_k, dim=0)
        loss = torch.mean(rewards * torch.nn.functional.cross_entropy(rep, flat, reduction="none"))
        loss.backward()
        opt.step()
    with torch.no_grad():
        feats = t_policy.encode_image(torch.from_numpy(query))
        feats = feats / feats.norm(dim=-1, keepdim=True)
        ref_scores = (scale * feats @ gal.T).numpy()

    # --- rlcf_tpu retrieval episode --------------------------------------
    reward = ClipReward(*convert_clip_state_dict(reward_sd), RewardConfig(sample_k=sample_k))
    ecfg = EpisodeConfig(tta_steps=tta_steps, lr=lr, weight_decay=wd, sample_k=sample_k, adam_eps=1e-6)
    tta = RetrievalTTA(j_params, j_cfg, reward, ecfg, direction="i2t").set_text_gallery(TEXTS)
    mine = tta.adapt_queries(query.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(mine, ref_scores, rtol=3e-3, atol=3e-4)
