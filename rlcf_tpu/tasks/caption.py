"""Captioning: ClipCap/CapDec models, supervised training, TTA with CLIP reward.

Rebuild of the reference caption pipeline:

- Model (`caption/image_llm/models/modules.py:212-268`): a prefix mapper
  projects a CLIP embedding to ``prefix_length`` LLM token embeddings which
  condition a frozen OPT decoder; only the mapper trains
  (``ClipCaptionPrefixV2``).
- Supervised trainer (`caption/train.py:18-76`): teacher-forcing CE on
  precomputed CLIP embeddings; CapDec adds Gaussian noise to the (normalized)
  text embedding (`caption/image_llm/utils.py:24-41`); linear-warmup schedule;
  loss slice ``logits[:, prefix_len-1:-1]`` with ignore_index=0.
- TTA (`caption/capdec_tta.py:49-156`): per image, ``tta_steps`` of
  {beam-sample K captions, CLIPScore them against the image, baseline
  subtract, reward-weighted teacher-forcing CE on the sampled tokens};
  final beam-5 caption; mapper-only gradients; snapshot/reset via pure
  params. Generation->reward needs a host tokenizer round-trip (OPT ids ->
  text -> CLIP BPE), so the TTA driver alternates jitted device stages with
  host decode, batched over image groups.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import clip as clip_model
from ..models import mappers as M
from ..models import opt as O
from ..tokenizer import tokenize as clip_tokenize


@dataclasses.dataclass(frozen=True)
class CaptionModelConfig:
    """Mapper ⊕ frozen LLM; ``llm`` selects the backend like the reference's
    ``LLMModel(config_dir)`` dispatch (`modules.py:188-209`): "opt" (default,
    the RLCF TTA path) or "gpt2" (the legacy ClipCap path)."""

    mapper: M.MapperConfig
    opt: Optional[O.OPTConfig] = None
    normalize_prefix: bool = False
    llm: str = "opt"
    gpt2: Optional[object] = None  # models.gpt2.GPT2Config when llm == "gpt2"

    @property
    def prefix_length(self) -> int:
        return self.mapper.prefix_length

    @property
    def llm_key(self) -> str:
        """Param-tree key of the LLM ("opt" or "gpt2")."""
        return "gpt2" if self.llm == "gpt2" else "opt"


def llm_forward(llm_params, ccfg: CaptionModelConfig, tokens=None, prefix_embeds=None, attention_mask=None):
    """Dispatch the frozen-LLM forward to the configured backend."""
    if ccfg.llm == "gpt2":
        from ..models import gpt2 as G

        return G.forward(llm_params, ccfg.gpt2, tokens=tokens, prefix_embeds=prefix_embeds,
                         attention_mask=attention_mask)
    return O.forward(llm_params, ccfg.opt, tokens=tokens, prefix_embeds=prefix_embeds,
                     attention_mask=attention_mask)


def init_caption_params(rng, ccfg: CaptionModelConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    out = {"mapper": M.init_mapper_params(k1, ccfg.mapper, dtype)}
    if ccfg.llm == "gpt2":
        from ..models import gpt2 as G

        out["gpt2"] = G.init_gpt2_params(k2, ccfg.gpt2, dtype)
    else:
        out["opt"] = O.init_opt_params(k2, ccfg.opt, dtype)
    return out


def prefix_tokens(mapper_params, ccfg: CaptionModelConfig, clip_emb):
    """CLIP embedding [B, E] -> prefix embeddings [B, P, D]."""
    return M.mapper_forward(mapper_params, ccfg.mapper, clip_emb)


def caption_forward(params, ccfg: CaptionModelConfig, clip_emb, tokens, attention_mask=None):
    """Teacher-forcing logits [B, P+T, V] (`modules.py:239-252`)."""
    prefix = prefix_tokens(params["mapper"], ccfg, clip_emb)
    return llm_forward(params[ccfg.llm_key], ccfg, tokens=tokens, prefix_embeds=prefix,
                       attention_mask=attention_mask)


def caption_ce(logits, tokens, prefix_length: int, ignore_id: int = 0, per_sample: bool = False,
               valid_mask=None):
    """CE over ``logits[:, P-1:-1]`` vs tokens, ignore_index=0
    (`caption/train.py:46-47`, `capdec_tta.py:120-123`).

    per_sample (the TTA path): the reference tokenizes each image's K
    captions padded only to their longest (``padding=True``) and takes
    ``all_loss.mean(dim=-1)`` — so pad-id-1 targets inside that length DO
    contribute CE (ignore_index is 0, OPT pads with 1) and the divisor is the
    batch-longest length. Here captions arrive padded to a fixed static
    length; ``valid_mask`` (the per-caption token mask) recovers the
    reference semantics exactly: positions past the group's longest caption
    are dropped and the mean divides by that longest length.
    """
    sl = logits[:, prefix_length - 1 : -1]
    logp = jax.nn.log_softmax(sl.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]  # [B, T]
    keep = (tokens != ignore_id).astype(jnp.float32)
    if per_sample:
        if valid_mask is None:
            return jnp.sum(ce * keep, axis=-1) / ce.shape[-1]
        l_eff = jnp.maximum(jnp.max(jnp.sum(valid_mask, axis=-1)), 1).astype(jnp.float32)
        in_batch = (jnp.arange(tokens.shape[-1])[None, :] < l_eff).astype(jnp.float32)
        return jnp.sum(ce * keep * in_batch, axis=-1) / l_eff
    return jnp.sum(ce * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def noise_injection(rng, x, variance: float = 0.016, dont_norm: bool = False):
    """CapDec Gaussian noise on the CLIP text embedding (`utils.py:24-41`)."""
    if variance <= 0:
        return x
    if not dont_norm:
        x = clip_model.normalize(x)
    x = x + jax.random.normal(rng, x.shape, x.dtype) * np.sqrt(variance)
    return clip_model.normalize(x)


# ---------------------------------------------------------------------------
# Supervised trainer (ClipCap / CapDec)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainConfig:
    lr: float = 2e-5
    warmup_steps: int = 5000
    total_steps: int = 100_000
    epochs: int = 10
    batch_size: int = 40
    cap_model: str = "CapDec"  # CapDec => noise injection on text embeddings
    noise_variance: float = 0.016
    normalize_prefix: bool = False


def make_caption_trainer(ccfg: CaptionModelConfig, tcfg: TrainConfig):
    """Returns (init_opt_state, jitted train_step).

    train_step(mapper_params, opt_state, rng, prefix, tokens, mask)
      -> (mapper_params, opt_state, loss)
    Only the mapper trains (`ClipCaptionPrefixV2.parameters()`,
    `modules.py:255-258`).
    """
    # linear warmup then linear decay to 0 over total_steps (HF
    # get_linear_schedule_with_warmup, `caption/train.py:96-101`)
    def lr_fn(step):
        warm = step / jnp.maximum(tcfg.warmup_steps, 1)
        decay = jnp.maximum(
            0.0, (tcfg.total_steps - step) / jnp.maximum(tcfg.total_steps - tcfg.warmup_steps, 1)
        )
        return tcfg.lr * jnp.where(step < tcfg.warmup_steps, warm, decay)

    # reference: torch.optim.AdamW(..., eps=1e-06, weight_decay=0.0)
    # (`caption/train.py:96`)
    opt = optax.adamw(lr_fn, eps=1e-6, weight_decay=0.0)

    def train_step(mapper_params, opt_params, opt_state, rng, prefix, tokens, mask):
        if tcfg.cap_model == "CapDec":
            prefix = noise_injection(rng, prefix, tcfg.noise_variance, dont_norm=tcfg.normalize_prefix)
        elif tcfg.normalize_prefix:
            prefix = clip_model.normalize(prefix)

        def loss_fn(mp):
            logits = llm_forward(
                opt_params,
                ccfg,
                tokens=tokens,
                prefix_embeds=prefix_tokens(mp, ccfg, prefix),
                attention_mask=mask,
            )
            return caption_ce(logits, tokens, ccfg.prefix_length)

        loss, grads = jax.value_and_grad(loss_fn)(mapper_params)
        updates, opt_state = opt.update(grads, opt_state, mapper_params)
        mapper_params = optax.apply_updates(mapper_params, updates)
        return mapper_params, opt_state, loss

    return opt, jax.jit(train_step)


def train_caption_model(
    params,
    ccfg: CaptionModelConfig,
    tcfg: TrainConfig,
    dataset_iter_fn: Callable[[], object],
    rng=None,
    log_every: int = 100,
    checkpoint_dir: Optional[str] = None,
    start_epoch: int = 0,
):
    """Epoch loop over an iterator factory yielding (prefix, tokens, mask).

    Saves ``ckpt-latest.npz`` plus last-6-epoch snapshots like
    `caption/train.py:62-71`.
    """
    import os

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    opt, train_step = make_caption_trainer(ccfg, tcfg)
    opt_state = opt.init(params["mapper"])
    mapper = params["mapper"]
    losses = []
    for epoch in range(start_epoch, tcfg.epochs):
        total, count = 0.0, 0
        for prefix, tokens, mask in dataset_iter_fn():
            rng, sub = jax.random.split(rng)
            mapper, opt_state, loss = train_step(
                mapper, params[ccfg.llm_key], opt_state, sub, jnp.asarray(prefix), jnp.asarray(tokens), jnp.asarray(mask)
            )
            total += float(loss)
            count += 1
        losses.append(total / max(count, 1))
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            save_mapper_checkpoint(os.path.join(checkpoint_dir, "ckpt-latest.npz"), mapper, epoch)
            if epoch >= tcfg.epochs - 6:
                save_mapper_checkpoint(os.path.join(checkpoint_dir, f"ckpt-{epoch:03d}.npz"), mapper, epoch)
    return {**params, "mapper": mapper}, losses


def save_mapper_checkpoint(path: str, mapper_params, epoch: int):
    flat = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(mapper_params)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in key_path)
        flat[name] = np.asarray(leaf)
    np.savez(path, __epoch__=epoch, **flat)


def load_mapper_checkpoint(path: str, template):
    data = np.load(path)
    flat_template = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for key_path, leaf in flat_template[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in key_path)
        leaves.append(jnp.asarray(data[name]))
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(template), leaves), int(data["__epoch__"])


# ---------------------------------------------------------------------------
# Caption TTA (CAP_TTA + make_preds_policy_batch)
# ---------------------------------------------------------------------------


class CaptionTTA:
    """Per-image caption TTA with a frozen CLIP reward.

    Host/device split: generation and the reward/update step are jitted; the
    OPT-token -> text -> CLIP-token round trip runs on host between them.
    """

    def __init__(
        self,
        params,
        ccfg: CaptionModelConfig,
        reward,
        opt_tokenizer,
        tta_steps: int = 4,
        lr: float = 3e-6,
        weight_decay: float = 5e-4,
        sample_k: int = 6,
        max_new_tokens: int = 50,
        use_nucleus: bool = False,
        momentum_update: bool = False,
        update_freq: int = 256,
        update_w: float = 1.0,
        momentum: float = 0.9999,
        token_pad_len: Optional[int] = None,
        mesh=None,
        quantize_decode: bool = False,
        decode_seg_len = None,
    ):
        from ..core import policy as Po

        if ccfg.llm != "opt":
            raise ValueError(
                "CaptionTTA requires the OPT backend (the reference TTA path "
                "generates through opt_generate, `capdec_tta.py:98-100`); use "
                "clipcap_predict for GPT-2 no-TTA captioning"
            )
        self.params = params
        self.ccfg = ccfg
        self.reward = reward
        self.tok = opt_tokenizer
        self.tta_steps = tta_steps
        self.sample_k = sample_k
        self.max_new_tokens = max_new_tokens
        self.use_nucleus = use_nucleus
        # Re-tokenized captions must never truncate below what generation can
        # emit (the reference pads to longest, `capdec_tta.py:111`). Decoding
        # can EXPAND token counts: an id whose bytes don't form valid UTF-8
        # decodes to U+FFFD which re-encodes as 3 byte-tokens, so +4 slack is
        # not enough — budget 4x generated length (+BOS +slack), and
        # _decode_and_retokenize still warns if a caption would truncate.
        self.token_pad_len = token_pad_len or (4 * max_new_tokens + 4)
        # reference uses AdamW eps=1e-6 (`capdec_tta.py:189`)
        self.opt = optax.adamw(lr, eps=1e-6, weight_decay=weight_decay)
        self.momentum_update = momentum_update
        self.momentum_cfg = dict(momentum=momentum, update_freq=update_freq, update_w=update_w)
        self.momentum_state = Po.MomentumState.create(params["mapper"]) if momentum_update else None
        # episode-DP: adapt_batch groups shard over the mesh's dp axis (per-
        # image mapper states, embeddings and images partition on axis 0; OPT
        # + reward params replicate). SURVEY §2.5 first-class axis.
        self.mesh = mesh
        self._Po = Po
        self._sample_counter = 0
        # Opt-in int8 weight-only decode (models/opt.py::quantize_opt_params):
        # generation streams all OPT weights per token, so int8 halves the
        # decode's HBM bytes; the CE/update path keeps full precision.
        # Sampled/beam captions may differ within quantization error.
        self.decode_params = O.quantize_opt_params(params["opt"]) if quantize_decode else params["opt"]
        if mesh is not None and mesh.shape.get("tp", 1) > 1:
            # tensor-parallel decode: Megatron-split weight shardings; GSPMD
            # propagates head-sharded KV caches + inserts the collectives
            from ..parallel.tp_opt import tp_opt_params

            self.decode_params = tp_opt_params(mesh, self.decode_params)

        # LLM/reward params flow in as jit arguments (closure capture would
        # bake them into the executables — compile explosion at OPT-125m scale).
        reward_cfg_arch = self.reward.cfg
        rcfg = self.reward.rcfg

        if use_nucleus:

            @jax.jit
            def generate_k(opt_params, mapper_params, clip_emb, step_rng):
                prefix = prefix_tokens(mapper_params, ccfg, clip_emb)
                return O.nucleus_generate(
                    opt_params, ccfg.opt, prefix, step_rng, num_captions=sample_k, max_new_tokens=max_new_tokens
                )

        else:

            @jax.jit
            def generate_k(opt_params, mapper_params, clip_emb, step_rng):
                del step_rng
                prefix = prefix_tokens(mapper_params, ccfg, clip_emb)
                seqs, _ = O.beam_generate(
                    opt_params, ccfg.opt, prefix, num_beams=sample_k, max_new_tokens=max_new_tokens,
                    num_return=sample_k, seg_len=decode_seg_len,
                )
                return seqs  # [B, K, L]

        @jax.jit
        def generate_final(opt_params, mapper_params, clip_emb):
            prefix = prefix_tokens(mapper_params, ccfg, clip_emb)
            seqs, _ = O.beam_generate(
                opt_params, ccfg.opt, prefix, num_beams=5, max_new_tokens=max_new_tokens,
                num_return=1, seg_len=decode_seg_len,
            )
            return seqs[:, 0]

        @jax.jit
        def reward_image_feat(rparams, images):
            """Frozen reward image features [N, E], computed ONCE per episode.

            The captions change every TTA step; the image does not — hoisting
            the ViT reward encode out of the step loop saves (steps-1) full
            reward-tower forwards per image (the reference recomputes it each
            step through `get_clip_score`, `capdec_tta.py:104-110`; the math
            is identical because the feature is bit-identical)."""
            from ..models import clip as _clip
            from ..ops.image_ops import resize_bicubic_align_corners

            res = reward_cfg_arch.image_resolution
            if images.shape[1] != res:
                images = resize_bicubic_align_corners(images, res)
            a_i = _clip.best_attn(reward_cfg_arch, sharded=self.mesh is not None)
            return _clip.normalize(
                _clip.encode_image(rparams, reward_cfg_arch, images, attn=a_i).astype(jnp.float32))

        @jax.jit
        def reward_of(rparams, img_feat, caption_clip_tokens):
            """CLIPScore(precomputed image feature [E], K captions) -> rewards [K]."""
            from ..models import clip as _clip
            from ..core.losses import clipscore, rewards_post_process

            a_t = _clip.best_attn(sharded=self.mesh is not None)
            txt_feats = _clip.normalize(
                _clip.encode_text(rparams, reward_cfg_arch, caption_clip_tokens, attn=a_t).astype(jnp.float32)
            )
            sim = jnp.sum(txt_feats * img_feat[None], axis=-1)  # [K]
            scores = clipscore(sim, rcfg.clipscore_weight)
            return rewards_post_process(scores.reshape(1, -1), rcfg.reward_process, rcfg.amplify)

        @jax.jit
        def update_step(opt_params, mapper_params, opt_state, clip_emb, opt_tokens, attn_mask, rewards):
            """Reward-weighted teacher-forcing CE on sampled captions
            (`capdec_tta.py:111-130`). opt_tokens [K, L]."""
            K = opt_tokens.shape[0]
            rep_emb = jnp.repeat(clip_emb[None], K, axis=0)
            token_mask = attn_mask[:, ccfg.prefix_length :]

            def loss_fn(mp):
                logits = O.forward(
                    opt_params, ccfg.opt, tokens=opt_tokens,
                    prefix_embeds=prefix_tokens(mp, ccfg, rep_emb), attention_mask=attn_mask,
                )
                per_caption = caption_ce(
                    logits, opt_tokens, ccfg.prefix_length, per_sample=True, valid_mask=token_mask
                )
                return jnp.mean(rewards * per_caption)

            loss, grads = jax.value_and_grad(loss_fn)(mapper_params)
            updates, opt_state = self.opt.update(grads, opt_state, mapper_params)
            return optax.apply_updates(mapper_params, updates), opt_state, loss

        self._generate_k = generate_k
        self._generate_final = generate_final
        self._reward_image_feat = reward_image_feat
        self._reward_of = reward_of
        self._update_step = update_step

        # ---- batched variants: N independent per-image mapper states ----
        @jax.jit
        def generate_k_batch(opt_params, mappers, clip_embs, step_rng):
            """mappers: stacked pytree [N, ...]; clip_embs [N, E] -> [N, K, L]."""
            prefixes = jax.vmap(lambda mp, e: prefix_tokens(mp, ccfg, e[None])[0])(mappers, clip_embs)
            if use_nucleus:
                return O.nucleus_generate(
                    opt_params, ccfg.opt, prefixes, step_rng, num_captions=sample_k, max_new_tokens=max_new_tokens
                )
            seqs, _ = O.beam_generate(
                opt_params, ccfg.opt, prefixes, num_beams=sample_k, max_new_tokens=max_new_tokens,
                num_return=sample_k, seg_len=decode_seg_len,
            )
            return seqs

        @jax.jit
        def generate_final_batch(opt_params, mappers, clip_embs):
            prefixes = jax.vmap(lambda mp, e: prefix_tokens(mp, ccfg, e[None])[0])(mappers, clip_embs)
            seqs, _ = O.beam_generate(
                opt_params, ccfg.opt, prefixes, num_beams=5, max_new_tokens=max_new_tokens,
                num_return=1, seg_len=decode_seg_len,
            )
            return seqs[:, 0]

        @jax.jit
        def reward_of_batch(rparams, img_feats, caption_clip_tokens):
            """img_feats [N, E] (precomputed); tokens [N, K, 77] -> rewards [N, K]."""
            from ..models import clip as _clip
            from ..core.losses import clipscore, rewards_post_process

            N, K = caption_clip_tokens.shape[:2]
            a_t = _clip.best_attn(sharded=self.mesh is not None)
            txt = _clip.normalize(
                _clip.encode_text(rparams, reward_cfg_arch, caption_clip_tokens.reshape(N * K, -1), attn=a_t).astype(jnp.float32)
            ).reshape(N, K, -1)
            sim = jnp.einsum("nke,ne->nk", txt, img_feats)
            scores = clipscore(sim, rcfg.clipscore_weight)
            return jax.vmap(lambda s: rewards_post_process(s.reshape(1, -1), rcfg.reward_process, rcfg.amplify))(scores)

        @jax.jit
        def update_step_batch(opt_params, mappers, opt_states, clip_embs, opt_tokens, attn_masks, rewards):
            """Vmapped reward-weighted CE update. opt_tokens [N, K, L]."""

            def one(mp, st, emb, toks, mask, rw):
                K = toks.shape[0]
                rep = jnp.repeat(emb[None], K, axis=0)
                token_mask = mask[:, ccfg.prefix_length :]

                def loss_fn(m):
                    logits = O.forward(
                        opt_params, ccfg.opt, tokens=toks,
                        prefix_embeds=prefix_tokens(m, ccfg, rep), attention_mask=mask,
                    )
                    per_caption = caption_ce(
                        logits, toks, ccfg.prefix_length, per_sample=True, valid_mask=token_mask
                    )
                    return jnp.mean(rw * per_caption)

                loss, grads = jax.value_and_grad(loss_fn)(mp)
                upd, st = self.opt.update(grads, st, mp)
                return optax.apply_updates(mp, upd), st, loss

            return jax.vmap(one)(mappers, opt_states, clip_embs, opt_tokens, attn_masks, rewards)

        self._generate_k_batch = generate_k_batch
        self._generate_final_batch = generate_final_batch
        self._reward_of_batch = reward_of_batch
        self._update_step_batch = update_step_batch

    def _decode_and_retokenize(self, seqs_np):
        """OPT ids [K, L] -> texts + (opt tokens+mask padded, clip tokens).

        Tokens pad to the group's longest caption rounded UP to a 32-token
        bucket (``token_pad_len`` pre-sizes the bucket but never truncates:
        a longer caption grows the bucket and compiles one more update-step
        shape): the CE update's fwd+bwd cost is linear in the padded length,
        and real captions retokenize far below the 4x worst-case budget.
        Exactness: per-sample CE masks positions past the longest caption and
        divides by that longest length (see ``caption_ce``), so any pad >=
        longest yields the identical loss — bucketing only bounds the set of
        compiled update-step shapes.
        """
        texts = self.tok.batch_decode(seqs_np, stop_id=self.ccfg.opt.eos_newline_id)
        opt_tokens, opt_mask, lengths = self.tok.batch_encode(texts, return_lengths=True)
        longest = max(lengths, default=0)
        bucket = max(32, -(-opt_tokens.shape[1] // 32) * 32)
        if longest > self.token_pad_len:
            # NEVER truncate — the reference computes CE on the full caption
            # (pads to longest, `capdec_tta.py:111-119`). Grow past the
            # configured bucket cap instead; the only cost is compiling one
            # more update-step shape for this (rare) longer bucket.
            import warnings

            warnings.warn(
                f"re-tokenized caption length {longest} exceeds token_pad_len "
                f"{self.token_pad_len}; padding up to a {bucket}-token bucket "
                "(one extra compiled update-step shape) — raise token_pad_len "
                "to pre-size the bucket",
                RuntimeWarning,
            )
            pad_to = bucket
        else:
            pad_to = min(self.token_pad_len, bucket)
        if opt_tokens.shape[1] < pad_to:
            fill = ((0, 0), (0, pad_to - opt_tokens.shape[1]))
            opt_tokens = np.pad(opt_tokens, fill, constant_values=self.tok.pad_id)
            opt_mask = np.pad(opt_mask, fill, constant_values=0)
        elif opt_tokens.shape[1] > pad_to:
            opt_tokens = opt_tokens[:, :pad_to]
            opt_mask = opt_mask[:, :pad_to]
        clip_tokens = clip_tokenize([t if t else " " for t in texts], truncate=True)
        return texts, opt_tokens, opt_mask, clip_tokens

    def adapt_image(self, image, clip_emb, trace: Optional[list] = None) -> str:
        """One image's TTA -> final caption text."""
        start = self.momentum_state.reset_params if self.momentum_update else self.params["mapper"]
        mapper = start
        opt_state = self.opt.init(mapper)
        clip_emb = jnp.asarray(clip_emb)[None]  # [1, E]
        image = jnp.asarray(image)
        P = self.ccfg.prefix_length
        opt_params = self.params["opt"]
        rparams = self.reward.params
        step_rng = jax.random.PRNGKey(self._sample_counter)
        self._sample_counter += 1
        img_feat = self._reward_image_feat(rparams, image[None])[0]  # hoisted: once per episode
        for step in range(self.tta_steps):
            seqs = self._generate_k(self.decode_params, mapper, clip_emb, jax.random.fold_in(step_rng, step))  # [1, K, L]
            texts, opt_tokens, opt_mask, clip_tokens = self._decode_and_retokenize(np.asarray(seqs[0]))
            rewards = self._reward_of(rparams, img_feat, jnp.asarray(clip_tokens))
            if trace is not None:
                trace.append(list(zip(texts, np.asarray(rewards).tolist())))
            attn = np.concatenate([np.ones((opt_tokens.shape[0], P), np.int32), opt_mask], axis=1)
            mapper, opt_state, _ = self._update_step(
                opt_params, mapper, opt_state, clip_emb[0], jnp.asarray(opt_tokens), jnp.asarray(attn), rewards
            )
        final = self._generate_final(self.decode_params, mapper, clip_emb)
        caption = self.tok.batch_decode(np.asarray(final), stop_id=self.ccfg.opt.eos_newline_id)[0].lower()
        if self.momentum_update:
            self.momentum_state = self._Po.momentum_update(self.momentum_state, mapper, **self.momentum_cfg)
        return caption

    def adapt_batch(self, images, clip_embs, trace: Optional[list] = None) -> List[str]:
        """TTA for a group of images at once (vmapped per-image mapper states).

        images [N, H, W, 3]; clip_embs [N, E] -> N final captions. Same math
        as adapt_image, batched for device utilization (the reference loops
        bs=1, `capdec_tta.py:84`).
        """
        N = clip_embs.shape[0]
        start = self.momentum_state.reset_params if self.momentum_update else self.params["mapper"]
        mappers = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a[None], (N,) + a.shape), start)
        opt_states = jax.vmap(self.opt.init)(mappers)
        clip_embs = jnp.asarray(clip_embs)
        images = jnp.asarray(images)
        if self.mesh is not None:
            from ..parallel.mesh import dp_put

            dp_tree = lambda tree: jax.tree_util.tree_map(
                lambda a: dp_put(self.mesh, a) if getattr(a, "ndim", 0) >= 1 and a.shape[0] == N else a,
                tree,
            )
            images = dp_put(self.mesh, images)
            clip_embs = dp_put(self.mesh, clip_embs)
            mappers = dp_tree(mappers)
            opt_states = dp_tree(opt_states)
        P = self.ccfg.prefix_length
        opt_params = self.params["opt"]
        rparams = self.reward.params
        step_rng = jax.random.PRNGKey(self._sample_counter)
        self._sample_counter += 1
        img_feats = self._reward_image_feat(rparams, images)  # hoisted: once per group
        for step in range(self.tta_steps):
            seqs = self._generate_k_batch(self.decode_params, mappers, clip_embs, jax.random.fold_in(step_rng, step))
            flat = np.asarray(seqs).reshape(N * self.sample_k, -1)
            texts, opt_tokens, opt_mask, clip_tokens = self._decode_and_retokenize(flat)
            rewards = self._reward_of_batch(
                rparams, img_feats, jnp.asarray(clip_tokens).reshape(N, self.sample_k, -1)
            )
            if trace is not None:
                trace.append(list(zip(texts, np.asarray(rewards).reshape(-1).tolist())))
            K, L = self.sample_k, opt_tokens.shape[1]
            attn = np.concatenate([np.ones((N * K, P), np.int32), opt_mask], axis=1)
            mappers, opt_states, _ = self._update_step_batch(
                opt_params, mappers, opt_states, clip_embs,
                jnp.asarray(opt_tokens).reshape(N, K, L),
                jnp.asarray(attn).reshape(N, K, -1),
                rewards,
            )
        final = self._generate_final_batch(self.decode_params, mappers, clip_embs)
        captions = [t.lower() for t in self.tok.batch_decode(np.asarray(final), stop_id=self.ccfg.opt.eos_newline_id)]
        if self.momentum_update:
            self.momentum_state = self._Po.momentum_update_batch(
                self.momentum_state, mappers, **self.momentum_cfg
            )
        return captions

    def predict_only(self, clip_emb) -> List[str]:
        """No-TTA beam-5 predictions (`caption/predictions.py:21-70`)."""
        final = self._generate_final(self.decode_params, self.params["mapper"], jnp.asarray(clip_emb))
        return [t.lower() for t in self.tok.batch_decode(np.asarray(final), stop_id=self.ccfg.opt.eos_newline_id)]


# ---------------------------------------------------------------------------
# Legacy ClipCap predictor (GPT-2 backend, `caption/image_llm/generate.py`)
# ---------------------------------------------------------------------------


def clipcap_predict(
    params,
    ccfg: CaptionModelConfig,
    clip_embs,
    gpt2_tokenizer,
    use_beam: bool = True,
    beam_size: int = 5,
    entry_length: int = 67,
    temperature: float = 1.0,
    stop_token: str = ".",
) -> List[str]:
    """No-TTA ClipCap captioning through the GPT-2 backend.

    Mirrors the legacy path of `caption/predictions.py:21-70`: CLIP embedding
    -> mapper prefix -> ``generate_beam`` (best beam) or ``generate2`` greedy.
    ``clip_embs``: [N, E]. Returns N caption strings.
    """
    from ..models import gpt2 as G

    if ccfg.llm != "gpt2":
        raise ValueError("clipcap_predict requires a CaptionModelConfig with llm='gpt2'")
    # raw token id (HF GPT-2 tokenizers prepend no BOS, unlike OPT's </s>)
    stop_id = gpt2_tokenizer.encode(stop_token, add_bos=False)[0]
    gen_beam = jax.jit(
        functools.partial(G.clipcap_beam_generate, cfg=ccfg.gpt2, stop_token=stop_id,
                          beam_size=beam_size, entry_length=entry_length, temperature=temperature),
        static_argnames=(),
    )
    gen_greedy = jax.jit(
        functools.partial(G.clipcap_top_p_generate, cfg=ccfg.gpt2, stop_token=stop_id,
                          entry_length=entry_length, temperature=temperature)
    )
    prefix_fn = jax.jit(functools.partial(prefix_tokens, ccfg=ccfg))
    prefixes = prefix_fn(params["mapper"], clip_emb=jnp.asarray(clip_embs))
    out = []
    for n in range(prefixes.shape[0]):
        if use_beam:
            tokens, lengths, order = gen_beam(params["gpt2"], prefix_embeds=prefixes[n])
            best = int(np.asarray(order)[0])
            ids = np.asarray(tokens)[best][: int(np.asarray(lengths)[best])]
        else:
            tokens, length = gen_greedy(params["gpt2"], prefix_embeds=prefixes[n])
            ids = np.asarray(tokens)[: int(length)]
        out.append(gpt2_tokenizer.decode(list(ids)))
    return out


# ---------------------------------------------------------------------------
# CLIP feature pre-extraction (`caption/extractor_pickle.py`)
# ---------------------------------------------------------------------------


def extract_clip_features(clip_params, clip_cfg, images_iter=None, texts: Optional[Sequence[str]] = None, batch_size: int = 256):
    """Precompute CLIP image and/or text embeddings for caption training."""
    out = {}
    if images_iter is not None:
        encode_i = jax.jit(functools.partial(clip_model.encode_image, cfg=clip_cfg))
        feats = [np.asarray(encode_i(clip_params, images=jnp.asarray(b))) for b in images_iter]
        out["image_embeddings"] = np.concatenate(feats, axis=0)
    if texts is not None:
        encode_t = jax.jit(functools.partial(clip_model.encode_text, cfg=clip_cfg))
        tok = clip_tokenize(list(texts), truncate=True)
        feats = []
        for s in range(0, tok.shape[0], batch_size):
            feats.append(np.asarray(encode_t(clip_params, tokens=jnp.asarray(tok[s : s + batch_size]))))
        out["text_embeddings"] = np.concatenate(feats, axis=0)
    return out
