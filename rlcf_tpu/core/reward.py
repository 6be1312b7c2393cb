"""Frozen CLIP reward models (CLIPScore) for TTA episodes.

Functional rebuild of ``CLIPRewards`` / ``CLIPRewardsMultiple``
(`TPT/clip_reward.py:76-307`): a frozen CLIP scores sampled candidates with
``CLIPScore = w * max(cos, 0)`` and rewards are baseline-subtracted. Episode
code consumes only pure functions + cached feature arrays, so reward scoring
fuses into the jitted episode; the reward encoder's image forward is batched
once per episode over the selected views.

Multi-model ensembles use the confidence weights of `TPT/clip_reward.py:21-26`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import clip as clip_model
from ..tokenizer import tokenize
from .losses import clipscore, rewards_post_process

# Ensemble confidence weights (`TPT/clip_reward.py:21-26`), normalized and
# rounded exactly as the reference does (`:206`).
CONFIDENCE_WEIGHTS = {"ViT-L/14@336px": 10, "ViT-L/14": 5, "RN50x64": 3, "ViT-B/16": 1}


@dataclasses.dataclass
class RewardConfig:
    sample_k: int = 5
    clipscore_weight: float = 2.5
    reward_process: bool = True
    process_batch: bool = False
    amplify: bool = False
    default_resolution: int = 224


def reward_image_features(params, cfg: clip_model.ClipConfig, images):
    """Pure reward image-feature function (params as an argument, jit-safe).

    Resizes if the reward tower expects a different resolution
    (`TPT/clip_reward.py:130-137`). Keep params an ARGUMENT when jitting —
    closure capture bakes the weights into the executable.
    """
    from ..ops.image_ops import resize_bicubic_align_corners

    res = cfg.image_resolution
    if images.shape[1] != res:
        images = resize_bicubic_align_corners(images, res)
    feats = clip_model.encode_image(params, cfg, images).astype(jnp.float32)
    return clip_model.normalize(feats)


class ClipReward:
    """Single frozen CLIP reward model.

    Holds frozen params + cached class/gallery text features; exposes pure
    methods safe to call inside jit.
    """

    def __init__(self, params, cfg: clip_model.ClipConfig, rcfg: RewardConfig):
        self.params = params
        self.cfg = cfg
        self.rcfg = rcfg
        self.class_features: Optional[jnp.ndarray] = None

    # -- host-side caches -------------------------------------------------

    def set_class_features(self, tokenized=None, classnames: Optional[Sequence[str]] = None, batch_size: int = 512):
        """Encode and cache normalized class/caption text features [C, E]."""
        if tokenized is None:
            tokenized = tokenize([c for c in classnames], truncate=True)
        # exact-math truncation of the dead padded tail (see tasks.classification)
        t_max = int(np.asarray(tokenized).argmax(axis=-1).max()) + 1
        tokenized = np.asarray(tokenized)[:, : min(tokenized.shape[1], -(-t_max // 8) * 8)]
        encode = jax.jit(functools.partial(clip_model.encode_text, cfg=self.cfg))
        chunks = []
        for start in range(0, tokenized.shape[0], batch_size):
            chunks.append(encode(self.params, tokens=jnp.asarray(tokenized[start : start + batch_size])))
        feats = jnp.concatenate(chunks, axis=0).astype(jnp.float32)
        self.class_features = clip_model.normalize(feats)
        return self.class_features

    # -- pure, jit-safe ---------------------------------------------------

    def image_features(self, images):
        """Normalized image features (see ``reward_image_features``)."""
        return reward_image_features(self.params, self.cfg, images)

    def text_features(self, tokens):
        feats = clip_model.encode_text(self.params, self.cfg, tokens).astype(jnp.float32)
        return clip_model.normalize(feats)

    def sim_matrix(self, image_feats, class_features=None):
        """Cosine similarities [S, C] against cached class features."""
        cf = class_features if class_features is not None else self.class_features
        return jnp.dot(image_feats, cf.T, preferred_element_type=jnp.float32)

    def score_samples(self, sim, sampled_idx):
        """CLIPScore for sampled class indices.

        sim: [S, C] reward similarity; sampled_idx: [S, K] -> rewards [S*K]
        flat, post-processed per-sample or batch-wide per config
        (`TPT/tpt_cls_rl.py:63-67`).
        """
        picked = jnp.take_along_axis(sim, sampled_idx, axis=-1)  # [S, K]
        scores = clipscore(picked, self.rcfg.clipscore_weight)
        if self.rcfg.process_batch:
            return rewards_post_process(scores.reshape(-1), self.rcfg.reward_process, self.rcfg.amplify)
        return rewards_post_process(scores, self.rcfg.reward_process, self.rcfg.amplify)

    def logits(self, image_feats, class_features=None):
        """Teacher logits for KD: exp(logit_scale) * sim (`TPT/clip_reward.py:167-177`)."""
        return jnp.exp(self.params["logit_scale"]) * self.sim_matrix(image_feats, class_features)


class ClipRewardEnsemble:
    """Confidence-weighted multi-CLIP reward (`CLIPRewardsMultiple`)."""

    def __init__(self, members: List[ClipReward], rcfg: RewardConfig, weighted: bool = True):
        self.members = members
        self.rcfg = rcfg
        raw = [CONFIDENCE_WEIGHTS.get(m.cfg.name, 1) for m in members]
        total = sum(raw)
        self.weights = [round(w / total, 2) for w in raw] if weighted else [1.0 / len(members)] * len(members)

    def set_class_features(self, tokenized=None, classnames=None):
        for m in self.members:
            m.set_class_features(tokenized=tokenized, classnames=classnames)

    def image_features(self, images):
        return [m.image_features(images) for m in self.members]

    def sim_matrices(self, image_feats_list):
        return [m.sim_matrix(f) for m, f in zip(self.members, image_feats_list)]

    def score_samples(self, sims, sampled_idx):
        """Weighted-sum of member CLIPScores, then shared post-processing
        (`TPT/clip_reward.py:227-257`).

        ``sims``: list of [S, C] member sims, or a stacked [M, S, C] array.
        """
        if not isinstance(sims, (list, tuple)):
            sims = [sims[m] for m in range(sims.shape[0])]
        scores = []
        for m, sim, w in zip(self.members, sims, self.weights):
            picked = jnp.take_along_axis(sim, sampled_idx, axis=-1)
            scores.append(w * clipscore(picked, self.rcfg.clipscore_weight))
        combined = sum(scores)
        if self.rcfg.process_batch:
            return rewards_post_process(combined.reshape(-1), self.rcfg.reward_process, self.rcfg.amplify)
        return rewards_post_process(combined, self.rcfg.reward_process, self.rcfg.amplify)


def build_reward_model(
    arch: str = "ViT-L/14",
    rcfg: Optional[RewardConfig] = None,
    checkpoint: Optional[str] = None,
    rng_seed: int = 0,
    dtype=jnp.float32,
) -> ClipReward:
    """Construct a reward model from a checkpoint or random init (no-data envs)."""
    rcfg = rcfg or RewardConfig()
    if checkpoint:
        from ..models.convert import load_clip_checkpoint

        params, cfg = load_clip_checkpoint(checkpoint, dtype=dtype)
    else:
        cfg = clip_model.get_config(arch)
        params = clip_model.init_clip_params(jax.random.PRNGKey(rng_seed), cfg, dtype=dtype)
    return ClipReward(params, cfg, rcfg)
