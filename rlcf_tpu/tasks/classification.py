"""Classification task: zero-shot eval, prompt-TTA (RLCF/TPT/KD) episodes.

Zero-shot parity target: `TPT/zero_shot.py:30-172` via `CLIPCLS_TTA`
(`TPT/clip/custom_clip.py:364-497`): class features are the normalized text
embeddings of ``"<prefix> <name>."`` prompts, logits are
``exp(logit_scale) * norm(image_feats) @ class_feats.T``.

Also provides the multi-model ensemble variant (`CLIPCLS_TTA_Multiple`,
`custom_clip.py:500-583`) that averages logits across CLIP architectures with
per-model bicubic input resizing, and the prompt-TTA driver corresponding to
`TPT/tpt_cls_rl.py` / `tpt_cls.py` (`ClipTestTimeTuning`): frozen image+text
towers, trainable CoOp context spliced at the embedding level, episodes
vmapped over the test stream.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import clip as clip_model
from ..tokenizer import tokenize
from ..data.class_names import assemble_prompts
from ..metrics.classification import AccuracyMeter


def compute_class_features(params, cfg, classnames: Sequence[str], prompt_prefix: str = "a photo of a", batch_size: int = 256):
    """Normalized class text features [C, E] computed in device batches."""
    prompts = assemble_prompts(classnames, prompt_prefix)
    tokens = tokenize(prompts)
    encode = jax.jit(functools.partial(clip_model.encode_text, cfg=cfg))
    feats = []
    for start in range(0, tokens.shape[0], batch_size):
        chunk = jnp.asarray(tokens[start : start + batch_size])
        feats.append(encode(params, tokens=chunk))
    feats = jnp.concatenate(feats, axis=0)
    return clip_model.normalize(feats.astype(jnp.float32))


def classify_logits(params, cfg, images, class_features):
    """Cosine-similarity logits [B, C] for NHWC images."""
    img = clip_model.encode_image(params, cfg, images)
    img = clip_model.normalize(img.astype(jnp.float32))
    scale = jnp.exp(params["logit_scale"])
    return scale * jnp.dot(img, class_features.T, preferred_element_type=jnp.float32)


def resize_bicubic_batch(images, resolution: int):
    """Per-model input resizing for ensembles (`custom_clip.py:541-543`)."""
    B = images.shape[0]
    return jax.image.resize(images, (B, resolution, resolution, images.shape[-1]), method="bicubic")


def zero_shot_eval(
    params,
    cfg,
    dataset,
    classnames: Sequence[str],
    prompt_prefix: str = "a photo of a",
    batch_size: int = 64,
    resolution: int = 224,
    limit: Optional[int] = None,
    seed: int = 0,
) -> dict:
    """Zero-shot top-1/top-5 over a dataset loader."""
    from ..data.datasets import iter_batches

    class_feats = compute_class_features(params, cfg, classnames, prompt_prefix)
    step = jax.jit(functools.partial(classify_logits, cfg=cfg))
    meter = AccuracyMeter()
    for images, labels in iter_batches(dataset, batch_size, resolution, shuffle=True, seed=seed, limit=limit):
        logits = step(params, images=jnp.asarray(images), class_features=class_feats)
        meter.update(np.asarray(logits), labels)
    return meter.summary()


def zero_shot_eval_ensemble(
    models: List,  # list of (params, cfg)
    dataset,
    classnames: Sequence[str],
    prompt_prefix: str = "a photo of a",
    batch_size: int = 64,
    resolution: int = 224,
    limit: Optional[int] = None,
    seed: int = 0,
) -> dict:
    """Logit-averaged multi-architecture ensemble (`custom_clip.py:555-566`)."""
    from ..data.datasets import iter_batches

    feats = [compute_class_features(p, c, classnames, prompt_prefix) for p, c in models]

    @jax.jit
    def step(images, *all_class_feats):
        logits = []
        for (p, c), cf in zip(models, all_class_feats):
            x = images if c.image_resolution == resolution else resize_bicubic_batch(images, c.image_resolution)
            logits.append(classify_logits(p, c, x, cf))
        return jnp.mean(jnp.stack(logits), axis=0)

    meter = AccuracyMeter()
    for images, labels in iter_batches(dataset, batch_size, resolution, shuffle=True, seed=seed, limit=limit):
        logits = step(jnp.asarray(images), *feats)
        meter.update(np.asarray(logits), labels)
    return meter.summary()


# ---------------------------------------------------------------------------
# Prompt TTA (RLCF / TPT / KD): `TPT/tpt_cls_rl.py` rebuilt as jitted episodes
# ---------------------------------------------------------------------------


class PromptTTAClassifier:
    """CoOp-prompt test-time adaptation with a frozen CLIP reward.

    Per dataset, ``setup`` builds the prompt template (the functional
    ``reset_classnames``, `custom_clip.py:169-196`) and caches reward class
    features from the same tokenized prompts (`tpt_cls_rl.py:183`). ``adapt``
    runs N independent episodes in parallel (vmap over samples), each scanning
    ``tta_steps`` REINFORCE updates of the shared initial context.
    """

    def __init__(self, clip_params, clip_cfg, reward, ecfg, ctx_init="a photo of a", n_ctx=4, ctx0=None):
        from ..core.episode import make_tta_episode
        from ..core import prompt as P

        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.reward = reward
        self.ecfg = ecfg
        self.ctx_init = ctx_init
        self.n_ctx = n_ctx
        self.ctx0_override = ctx0
        self._make_tta_episode = make_tta_episode
        self._P = P
        self.prompt_state = None
        self._episode_batched = None

    def setup(self, classnames: Sequence[str]):
        P = self._P
        self.prompt_state = P.build_prompt_state(
            self.clip_params, classnames, ctx_init=self.ctx_init, n_ctx=self.n_ctx, ctx0=self.ctx0_override
        )
        self.reward.set_class_features(tokenized=self.prompt_state.tokenized)
        pt = self.prompt_state
        clip_params, cfg = self.clip_params, self.clip_cfg
        scale = jnp.exp(clip_params["logit_scale"])
        reward_class_feats = self.reward.class_features

        def text_features(ctx):
            prompts = P.splice_prompts(ctx, pt)
            feats = clip_model.encode_text_embeds(clip_params, cfg, prompts, pt.eot_idx)
            return clip_model.normalize(feats.astype(jnp.float32))

        def policy_logits(ctx, cache, idx):
            tf = text_features(ctx)
            return scale * jnp.dot(cache["img_feats"][idx], tf.T, preferred_element_type=jnp.float32)

        reward_model = self.reward

        def reward_image_sim(views_sel):
            feats = reward_model.image_features(views_sel)
            return jnp.dot(feats, reward_class_feats.T, preferred_element_type=jnp.float32)

        teacher_scale = jnp.exp(reward_model.params["logit_scale"]) if hasattr(reward_model, "params") else None
        episode = self._make_tta_episode(
            policy_logits, reward_image_sim, reward_model.score_samples, self.ecfg, teacher_scale=teacher_scale
        )

        def full_episode(views):
            img = clip_model.encode_image(clip_params, cfg, views)
            cache = {"img_feats": clip_model.normalize(img.astype(jnp.float32))}
            return episode(pt.ctx0, cache, views)

        self._episode_batched = jax.jit(jax.vmap(full_episode))
        return self

    def adapt(self, views_batch):
        """views_batch: [N, B, H, W, 3] -> (final_logits [N, C], aux)."""
        logits, aux = self._episode_batched(jnp.asarray(views_batch))
        return logits[:, 0], aux
