"""CLIPScore / RefCLIPScore evaluator (`clipscore/clipscore.py`).

CLIPScore(i, c) = w * max(cos(img, "A photo depicts " + c), 0) with w=2.5 and
a ViT-B/32 scorer by default (`clipscore.py:81,149-174,247`); RefCLIPScore is
the harmonic mean with the max text-text similarity over references
(`clipscore.py:177-217,263`). Feature extraction runs batched on device.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import clip as clip_model
from ..tokenizer import tokenize

CAPTION_PREFIX = "A photo depicts "
CLIPSCORE_W = 2.5


def extract_caption_features(params, cfg, captions: Sequence[str], prefix: str = CAPTION_PREFIX, batch_size: int = 256):
    tokens = tokenize([prefix + c for c in captions], truncate=True)
    encode = jax.jit(functools.partial(clip_model.encode_text, cfg=cfg))
    feats = []
    for s in range(0, tokens.shape[0], batch_size):
        feats.append(np.asarray(encode(params, tokens=jnp.asarray(tokens[s : s + batch_size]))))
    out = np.concatenate(feats, axis=0)
    return out / np.sqrt(np.sum(out**2, axis=1, keepdims=True))


def extract_image_features(params, cfg, images_iter):
    encode = jax.jit(functools.partial(clip_model.encode_image, cfg=cfg))
    feats = [np.asarray(encode(params, images=jnp.asarray(b))) for b in images_iter]
    out = np.concatenate(feats, axis=0)
    return out / np.sqrt(np.sum(out**2, axis=1, keepdims=True))


def clip_score(image_feats: np.ndarray, caption_feats: np.ndarray, w: float = CLIPSCORE_W):
    """Paired per-instance CLIPScore + mean (`clipscore.py:149-174`)."""
    per = w * np.clip(np.sum(image_feats * caption_feats, axis=1), 0, None)
    return float(np.mean(per)), per


def ref_clip_score(caption_feats: np.ndarray, references_feats: List[np.ndarray], per_image_text: np.ndarray):
    """RefCLIPScore: harmonic mean of image-text score and max ref similarity."""
    per_text = np.array(
        [float(np.max(cand @ refs.T)) for cand, refs in zip(caption_feats, references_feats)]
    )
    ref_scores = 2 * per_image_text * per_text / np.maximum(per_image_text + per_text, 1e-12)
    return float(np.mean(per_text)), ref_scores


def evaluate_captions(
    params,
    cfg,
    candidates: Dict[str, str],
    images_iter_factory,
    image_ids: Sequence[str],
    references: Optional[Dict[str, List[str]]] = None,
) -> Dict:
    """Full evaluation: {image_id: caption} (+refs) -> score dict.

    ``images_iter_factory()`` yields NHWC batches aligned with ``image_ids``.
    """
    caps = [candidates[i] for i in image_ids]
    img_feats = extract_image_features(params, cfg, images_iter_factory())
    cap_feats = extract_caption_features(params, cfg, caps)
    mean_cs, per_cs = clip_score(img_feats, cap_feats)
    out = {"clipscore": mean_cs, "per_instance": {i: {"CLIPScore": float(s)} for i, s in zip(image_ids, per_cs)}}
    if references is not None:
        # references are encoded WITHOUT the prefix? The reference tool uses
        # the same prefixed extractor for refs (`clipscore.py:177-198`).
        ref_feats = []
        for i in image_ids:
            ref_feats.append(extract_caption_features(params, cfg, references[i]))
        _, ref_scores = ref_clip_score(cap_feats, ref_feats, per_cs)
        out["ref_clipscore"] = float(np.mean(ref_scores))
        for i, s in zip(image_ids, ref_scores):
            out["per_instance"][i]["RefCLIPScore"] = float(s)
    return out
