"""Retrieval TTA: per-query REINFORCE over a cached gallery.

Rebuild of `retrieval/clip_ret_policy.py` + `retrieval/custom_models.py`:

- i2t ("image2text"): gallery text features (policy + reward towers) are
  precomputed once (`clip_ret_policy.py:150-156`); each query image runs an
  episode adapting the CLIP **visual** tower with the reward-weighted CE over
  the top-K retrieved captions (`tune_image`, `:76-103`); the final
  logits row fills the score matrix (`:168-173`).
- t2i ("text2image"): symmetric — gallery image features cached, episodes
  adapt the **text** tower per query caption (`tune_text`, `:106-137`).

TPU-native deltas: episodes are pure (reset == reuse of initial params,
`:176-179`), jitted, and vmapped over query groups instead of the reference's
sequential bs=1 loop; AdamW uses eps=1e-6 (`:235`). Momentum-EMA re-anchoring
is supported like the classification encoder TTA. The KD variant
(`clip_ret_kd.py:37-93`) distills the frozen reward sim row instead.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import policy as Po
from ..core.episode import EpisodeConfig, make_tta_episode
from ..core.reward import ClipRewardEnsemble, reward_image_features
from ..models import clip as clip_model
from ..tokenizer import tokenize


@dataclasses.dataclass
class RetrievalGallery:
    """Eval-set annotations: images, captions, and GT mappings
    (`retrieval_datasets.py:63-95`)."""

    image_paths: List[str]
    texts: List[str]
    img2txt: Dict[int, List[int]]
    txt2img: Dict[int, int]


def blip_caption_process(caption: str, prompt: str = "", max_words: int = 50) -> str:
    """LAVIS ``BlipCaptionProcessor`` text cleaning
    (`retrieval/lavis/processors/blip_processors.py:29-68`): lowercase,
    punctuation subset -> space, whitespace collapse, word-truncate."""
    import re as _re

    caption = _re.sub(r"([.!\"()*#:;~])", " ", caption.lower())
    caption = _re.sub(r"\s{2,}", " ", caption)
    caption = caption.rstrip("\n").strip(" ")
    words = caption.split(" ")
    if len(words) > max_words:
        caption = " ".join(words[:max_words])
    return prompt + caption


def load_karpathy_annotations(ann_path: str, vis_root: str = "", process_text: bool = True) -> RetrievalGallery:
    """LAVIS retrieval annotation json: [{"image": rel, "caption": [...]}].

    ``process_text`` applies the blip_caption processor the reference eval
    datasets run on every caption (`retrieval_datasets.py:83`).
    """
    with open(ann_path) as fh:
        annotations = json.load(fh)
    image_paths, texts = [], []
    img2txt, txt2img = {}, {}
    tid = 0
    for img_id, ann in enumerate(annotations):
        image_paths.append(os.path.join(vis_root, ann["image"]))
        img2txt[img_id] = []
        caps = ann["caption"] if isinstance(ann["caption"], list) else [ann["caption"]]
        for cap in caps:
            texts.append(blip_caption_process(cap) if process_text else cap)
            img2txt[img_id].append(tid)
            txt2img[tid] = img_id
            tid += 1
    return RetrievalGallery(image_paths, texts, img2txt, txt2img)


def _dp_batch(mesh, batch):
    """Shard a gallery-precompute batch over the mesh's dp axis (replicated
    params + dp-sharded batch = GSPMD splits the tower forward across chips);
    pads a ragged tail to a dp multiple (features of the pad rows are
    discarded by the caller's concat length)."""
    if mesh is None or "dp" not in mesh.shape:
        return jnp.asarray(batch), len(batch)
    from ..parallel.mesh import dp_put

    n = len(batch)
    dp = mesh.shape["dp"]
    if n % dp:
        import numpy as _np

        pad = dp - n % dp
        batch = _np.concatenate([_np.asarray(batch), _np.repeat(_np.asarray(batch[-1:]), pad, axis=0)])
    return dp_put(mesh, jnp.asarray(batch)), n


def encode_text_gallery(params, cfg, texts: Sequence[str], batch_size: int = 256, mesh=None):
    """Normalized text features [N, E] for the whole caption gallery.

    ``mesh``: shard each encode batch over dp — the COCO-scale precompute
    (25k captions / 5k images) is a pure batch forward, so it scales
    linearly with chips."""
    from .classification import truncate_tokens

    tokens = truncate_tokens(tokenize(list(texts), truncate=True))
    encode = jax.jit(functools.partial(clip_model.encode_text, cfg=cfg))
    feats = []
    for s in range(0, tokens.shape[0], batch_size):
        dev, n = _dp_batch(mesh, tokens[s : s + batch_size])
        feats.append(encode(params, tokens=dev)[:n])
    out = jnp.concatenate(feats, axis=0).astype(jnp.float32)
    return clip_model.normalize(out), tokens


def encode_image_gallery(params, cfg, images_iter, batch_size: int = 64, mesh=None):
    """Normalized image features [M, E] from an iterator of NHWC batches."""
    encode = jax.jit(functools.partial(clip_model.encode_image, cfg=cfg))
    feats = []
    for batch in images_iter:
        dev, n = _dp_batch(mesh, np.asarray(batch))
        feats.append(encode(params, images=dev)[:n])
    out = jnp.concatenate(feats, axis=0).astype(jnp.float32)
    return clip_model.normalize(out)


class RetrievalTTA:
    """Per-query retrieval TTA engine for one direction."""

    def __init__(
        self,
        clip_params,
        clip_cfg,
        reward,
        ecfg: EpisodeConfig,
        direction: str = "i2t",
        momentum_update: bool = False,
        update_freq: int = 256,
        update_w: float = 1.0,
        momentum: float = 0.9999,
        mesh=None,
        factor_embedding: bool = True,
    ):
        assert direction in ("i2t", "t2i")
        if isinstance(reward, ClipRewardEnsemble):
            raise ValueError(
                "RetrievalTTA requires a single ClipReward (the reference "
                "retrieval path uses one reward CLIP, `retrieval/clip_rewards.py`)"
            )
        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.reward = reward
        self.ecfg = ecfg
        self.direction = direction
        self.momentum_update = momentum_update
        self.momentum_cfg = dict(momentum=momentum, update_freq=update_freq, update_w=update_w)
        # t2i trains the full text tower incl. the [49408, 512] token
        # embedding (`clip_ret_policy.py:106-137`); per-episode AdamW m/v for
        # that table x group OOMs a 16G chip (25M params x 3 copies x group).
        # But each episode only ever reads the <=77 rows of its own query
        # tokens — untouched rows see zero grad, so their reference update is
        # pure decoupled weight decay, which the final forward never reads.
        # ``factor_embedding`` therefore swaps the trainable to (tower-sans-
        # embedding + the query's gathered rows); outputs are exactly equal
        # (pinned by tests/test_retrieval.py::test_t2i_factored_matches_full).
        # Momentum-EMA anchors must keep the full table (per-query rows can't
        # fold into one shared anchor), so momentum disables the factoring.
        self.factor_embedding = bool(factor_embedding) and direction == "t2i" and not momentum_update
        if direction == "i2t":
            self.trainable0 = clip_params["visual"]
        elif self.factor_embedding:
            self.trainable0 = {k: v for k, v in clip_params["text"].items() if k != "token_embedding"}
        else:
            self.trainable0 = clip_params["text"]
        self.momentum_state = Po.MomentumState.create(self.trainable0) if momentum_update else None
        # Multi-chip: the gallery axis (~25k captions / ~1k-5k images) is the
        # long axis in retrieval (SURVEY §2.5) — shard it over the mesh's tp
        # dimension and query groups over dp; GSPMD inserts the collectives.
        self.mesh = mesh
        self._episode = None
        self.gallery_feats = None
        self.reward_gallery_feats = None

    def _maybe_shard_galleries(self):
        if self.mesh is None or "tp" not in self.mesh.shape:
            return
        from jax.sharding import NamedSharding, PartitionSpec as Spec

        tp = self.mesh.shape["tp"]
        g = self.gallery_feats.shape[0]
        if g % tp:
            print(f"NOTE: gallery size {g} not divisible by tp={tp}; gallery replicated")
            return
        sh = NamedSharding(self.mesh, Spec("tp"))
        self.gallery_feats = jax.device_put(self.gallery_feats, sh)
        if self.reward_gallery_feats is not None and self.reward_gallery_feats.shape[0] % tp == 0:
            self.reward_gallery_feats = jax.device_put(self.reward_gallery_feats, sh)
            self.reward.class_features = self.reward_gallery_feats

    # -- gallery setup ----------------------------------------------------

    def set_text_gallery(self, texts: Sequence[str]):
        """i2t: cache policy + reward text features for all captions."""
        self.gallery_feats, _ = encode_text_gallery(self.clip_params, self.clip_cfg, texts, mesh=self.mesh)
        tokens = tokenize(list(texts), truncate=True)
        self.reward_gallery_feats = self.reward.set_class_features(tokenized=tokens)
        self._maybe_shard_galleries()
        self._build_episode()
        return self

    def set_image_gallery(self, images_iter_policy, images_iter_reward):
        """t2i: cache policy + reward image features for all gallery images."""
        self.gallery_feats = encode_image_gallery(self.clip_params, self.clip_cfg, images_iter_policy, mesh=self.mesh)
        rfeats = []
        # params passed as a jit argument (closure capture would bake the
        # frozen tower into the executable)
        rcfg = self.reward.cfg  # static config only; weights stay arguments
        encode = jax.jit(lambda p, imgs: reward_image_features(p, rcfg, imgs))
        for batch in images_iter_reward:
            rfeats.append(encode(self.reward.params, jnp.asarray(batch)))
        self.reward_gallery_feats = jnp.concatenate(rfeats, axis=0)
        self.reward.class_features = self.reward_gallery_feats
        self._maybe_shard_galleries()
        self._build_episode()
        return self

    # -- episode ----------------------------------------------------------

    def _build_episode(self):
        clip_params, cfg = self.clip_params, self.clip_cfg
        scale = jnp.exp(clip_params["logit_scale"])
        reward_model = self.reward
        direction = self.direction
        rcfg_arch = reward_model.cfg if hasattr(reward_model, "cfg") else None
        # fused attention (with its fused backward) for the per-query towers;
        # dense when sharded / off-TPU / ResNet
        sharded = self.mesh is not None
        attn_p = clip_model.best_attn(cfg if direction == "i2t" else None, sharded=sharded)
        attn_r = clip_model.best_attn(rcfg_arch if direction == "i2t" else None, sharded=sharded)

        # Params and gallery features flow in as jit arguments — closure
        # capture would bake them into the executable (compile explosion).
        def full_episode(cparams, rparams, gallery, r_gallery, trainable0, query):
            if direction == "i2t":

                def policy_logits(visual, cache, idx):
                    params = {**cparams, "visual": visual}
                    feats = clip_model.encode_image(params, cfg, cache["views"][idx], attn=attn_p)
                    feats = clip_model.normalize(feats.astype(jnp.float32))
                    return scale * jnp.dot(feats, gallery.T, preferred_element_type=jnp.float32)

                def reward_sim(views_sel):
                    from ..ops.image_ops import resize_bicubic_align_corners

                    res = rcfg_arch.image_resolution
                    if views_sel.shape[1] != res:
                        views_sel = resize_bicubic_align_corners(views_sel, res)
                    feats = clip_model.normalize(
                        clip_model.encode_image(rparams, rcfg_arch, views_sel, attn=attn_r).astype(jnp.float32)
                    )
                    return jnp.dot(feats, r_gallery.T, preferred_element_type=jnp.float32)

            else:

                def reward_sim(tokens_sel):
                    feats = clip_model.normalize(
                        clip_model.encode_text(rparams, rcfg_arch, tokens_sel, attn=attn_r).astype(jnp.float32)
                    )
                    return jnp.dot(feats, r_gallery.T, preferred_element_type=jnp.float32)

            if direction == "t2i" and self.factor_embedding:

                def policy_logits(trainable, cache, idx):
                    # Rebuild per-position embeddings from the episode's
                    # gathered rows through the first-occurrence one-hot
                    # ("M"): position i reads row firstocc[i], and the matmul
                    # adjoint M^T accumulates duplicate-position grads onto
                    # that row — exactly torch's embedding scatter-add.
                    text = {k: v for k, v in trainable.items() if k != "emb_rows"}
                    embeds = jnp.einsum(
                        "ts,sd->td", cache["one_hot"], trainable["emb_rows"],
                        preferred_element_type=jnp.float32,
                    ).astype(trainable["emb_rows"].dtype)[None]
                    params = {**cparams, "text": text}
                    feats = clip_model.encode_text_embeds(
                        params, cfg, embeds[idx * 0], cache["eot"][idx * 0], attn=attn_p
                    )
                    feats = clip_model.normalize(feats.astype(jnp.float32))
                    return scale * jnp.dot(feats, gallery.T, preferred_element_type=jnp.float32)

            elif direction == "t2i":

                def policy_logits(text_params, cache, idx):
                    params = {**cparams, "text": text_params}
                    feats = clip_model.encode_text(params, cfg, cache["views"][idx], attn=attn_p)
                    feats = clip_model.normalize(feats.astype(jnp.float32))
                    return scale * jnp.dot(feats, gallery.T, preferred_element_type=jnp.float32)

            teacher_scale = jnp.exp(rparams["logit_scale"])
            episode = make_tta_episode(
                policy_logits,
                reward_sim,
                reward_model.score_samples,
                # single query, no view selection: keep the one "view"
                dataclasses.replace(self.ecfg, selection_p=1.0),
                teacher_scale=teacher_scale,  # enables the KD variant (`clip_ret_kd.py:37-93`)
                return_adapted=self.momentum_update,
            )
            cache = {"views": query}
            if direction == "t2i" and self.factor_embedding:
                toks = query[0]  # single view: [77] token ids
                emb0 = cparams["text"]["token_embedding"][toks]  # [77, D]
                firstocc = jnp.argmax(toks[None, :] == toks[:, None], axis=-1)
                cache["one_hot"] = jax.nn.one_hot(firstocc, toks.shape[0], dtype=emb0.dtype)
                cache["eot"] = jnp.argmax(toks)[None]
                trainable0 = {**trainable0, "emb_rows": emb0}
            return episode(trainable0, cache, query)

        self._episode = jax.jit(jax.vmap(full_episode, in_axes=(None, None, None, None, None, 0)))

    # -- memory ------------------------------------------------------------

    # Measured on v5e (PERF_r04 OOM dumps): a group-32 i2t sweep needed
    # 25.23G with a ~2G fixed footprint -> ~4.2x the trainable bytes per
    # episode (adapted params + AdamW m/v + grad transients, scan-carried).
    _PER_EPISODE_FACTOR = 4.25

    def trainable_bytes(self) -> int:
        """Per-episode trainable bytes (incl. the factored emb rows)."""
        n = sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(self.trainable0))
        if self.factor_embedding:
            d = self.clip_params["text"]["token_embedding"].shape[1]
            itemsize = self.clip_params["text"]["token_embedding"].dtype.itemsize
            n += self.clip_cfg.context_length * d * itemsize
        return n

    def hbm_group_cap(self, hbm_limit_bytes: int | None = None) -> int | None:
        """Largest episode group that fits this device's HBM, or None (no
        limit known — e.g. CPU). Estimate: fixed footprint (frozen towers +
        galleries + 1G activation slack) + group x 4.25 x trainable bytes,
        against 95% of the device's memory limit."""
        if hbm_limit_bytes is None:
            dev = jax.devices()[0]
            stats = getattr(dev, "memory_stats", lambda: None)() or {}
            hbm_limit_bytes = stats.get("bytes_limit")
        if not hbm_limit_bytes:
            return None
        fixed = sum(
            l.size * l.dtype.itemsize
            for l in jax.tree.leaves((self.clip_params, self.reward.params))
        ) + int(1e9)
        for feats in (self.gallery_feats, self.reward_gallery_feats):
            if feats is not None:
                fixed += feats.size * feats.dtype.itemsize
        budget = 0.95 * hbm_limit_bytes - fixed
        return max(1, int(budget / (self._PER_EPISODE_FACTOR * self.trainable_bytes())))

    def adapt_queries(self, queries: np.ndarray) -> np.ndarray:
        """Run episodes for a group of queries -> score rows [N, gallery_size].

        queries: [N, H, W, 3] images (i2t) or [N, 77] tokens (t2i).
        """
        from ..parallel.mesh import dp_put

        q = dp_put(self.mesh, jnp.asarray(queries))[:, None]  # add the singleton view axis
        start = self.momentum_state.reset_params if self.momentum_update else self.trainable0
        logits, aux = self._episode(
            self.clip_params, self.reward.params, self.gallery_feats, self.reward_gallery_feats, start, q
        )
        if self.momentum_update:
            # fused device scan: bit-identical to the sequential per-sample
            # fold, without N host-sliced tree_maps (`Po.momentum_update_batch`)
            self.momentum_state = Po.momentum_update_batch(
                self.momentum_state, aux["adapted"], **self.momentum_cfg
            )
        return np.asarray(logits[:, 0])

    def run(self, queries_iter, total: int, gallery_size: int, group_size: int = 8) -> np.ndarray:
        """Fill the full score matrix (init -100, `clip_ret_policy.py:146-147`)."""
        cap = self.hbm_group_cap()
        if cap is not None and group_size > cap:
            print(f"NOTE: episode group {group_size} would exceed HBM; capping to {cap}")
            group_size = cap
        scores = np.full((total, gallery_size), -100.0, dtype=np.float32)
        row = 0
        buf = []
        for q in queries_iter:
            buf.append(q)
            if len(buf) == group_size:
                scores[row : row + group_size] = self.adapt_queries(np.stack(buf))
                row += group_size
                buf = []
        if buf:
            scores[row : row + len(buf)] = self.adapt_queries(np.stack(buf))
        return scores


def zero_shot_scores(clip_params, cfg, image_feats, text_feats):
    """Zero-shot score matrices (`retrieval/zero_shot.py:24-36`)."""
    scale = jnp.exp(clip_params["logit_scale"])
    i2t = scale * jnp.dot(image_feats, text_feats.T, preferred_element_type=jnp.float32)
    return np.asarray(i2t), np.asarray(i2t.T)


def zero_shot_scores_ensemble(models, image_feats_list, text_feats_list):
    """Multi-arch zero-shot retrieval: mean of per-model scaled sims
    (`retrieval/zero_shot.py:24-36` via CLIPRet_Multiple)."""
    mats = []
    for (params, _cfg), ifeat, tfeat in zip(models, image_feats_list, text_feats_list):
        scale = jnp.exp(params["logit_scale"])
        mats.append(scale * jnp.dot(ifeat, tfeat.T, preferred_element_type=jnp.float32))
    i2t = jnp.mean(jnp.stack(mats), axis=0)
    return np.asarray(i2t), np.asarray(i2t.T)
