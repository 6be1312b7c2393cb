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
import optax

from ..models import clip as clip_model
from ..tokenizer import tokenize
from ..data.class_names import assemble_prompts
from ..data.transforms import CLIP_MEAN, CLIP_STD
from ..metrics.classification import AccuracyMeter


def maybe_normalize_u8(views):
    """CLIP-normalize raw uint8 views on device; float views pass through.

    Lets hosts ship uint8 pixels (4x less transfer) with the affine normalize
    fused into the downstream encoder by XLA.
    """
    if views.dtype == jnp.uint8:
        return (views.astype(jnp.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    return views


def patch_norm_constants(patch_dim: int):
    """Per-column CLIP mean/std for patch-major u8 tokens [.., T, patch_dim].

    Column j of a patch-major token corresponds to channel ``j % 3`` (patch
    pixels flatten (row, col, channel)), so u8 -> CLIP-normalized is one
    vectorized affine with tiled [patch_dim] constants — no image-space
    reshuffle on device.
    """
    reps = patch_dim // 3
    return (
        jnp.asarray(np.tile(CLIP_MEAN, reps).astype(np.float32)),
        jnp.asarray(np.tile(CLIP_STD, reps).astype(np.float32)),
    )


def normalize_u8_patch_tokens(tokens):
    """u8 patch-major tokens [..., T, D] -> CLIP-normalized float32."""
    mean, std = patch_norm_constants(tokens.shape[-1])
    return (tokens.astype(jnp.float32) / 255.0 - mean) / std


def truncate_tokens(tokens: np.ndarray) -> np.ndarray:
    """Drop the all-padding tail: causal attention + EOT pooling make
    positions past max(eot) dead compute (exact, not approximate)."""
    t_max = int(tokens.argmax(axis=-1).max()) + 1
    t_max = min(tokens.shape[1], -(-t_max // 8) * 8)
    return tokens[:, :t_max]


def compute_class_features(params, cfg, classnames: Sequence[str], prompt_prefix: str = "a photo of a", batch_size: int = 256):
    """Normalized class text features [C, E] computed in device batches."""
    prompts = assemble_prompts(classnames, prompt_prefix)
    tokens = truncate_tokens(tokenize(prompts))
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
    """Per-model input resizing for ensembles (`custom_clip.py:541-543`):
    torch-exact align_corners bicubic."""
    from ..ops.image_ops import resize_bicubic_align_corners

    return resize_bicubic_align_corners(images, resolution)


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
    decode: str = "pil",
    decode_workers: int = 0,
) -> dict:
    """Zero-shot top-1/top-5 over a dataset loader."""
    from ..data.datasets import iter_batches

    class_feats = compute_class_features(params, cfg, classnames, prompt_prefix)
    step = jax.jit(functools.partial(classify_logits, cfg=cfg))
    meter = AccuracyMeter()
    for images, labels in iter_batches(dataset, batch_size, resolution, shuffle=True, seed=seed, limit=limit, decode=decode, workers=decode_workers):
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
    decode: str = "pil",
    decode_workers: int = 0,
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
    for images, labels in iter_batches(dataset, batch_size, resolution, shuffle=True, seed=seed, limit=limit, decode=decode, workers=decode_workers):
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

    def __init__(
        self, clip_params, clip_cfg, reward, ecfg, ctx_init="a photo of a", n_ctx=4, ctx0=None,
        learned_cls: bool = False, mesh=None,
    ):
        from ..core.episode import make_tta_episode
        from ..core import prompt as P

        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.reward = reward
        self.ecfg = ecfg
        self.ctx_init = ctx_init
        self.n_ctx = n_ctx
        self.ctx0_override = ctx0
        self.learned_cls = learned_cls  # trainable class token (Bongard mode)
        # Multi-chip: a jax Mesh with ("dp", "tp") axes. Class-axis arrays
        # (prompt template, text/reward class features) are placed sharded
        # over tp and episode batches over dp; XLA/GSPMD inserts the
        # collectives (SURVEY §2.5's "shard the class/gallery axis" design —
        # annotate shardings, no hand-written comms).
        self.mesh = mesh
        self._make_tta_episode = make_tta_episode
        self._P = P
        self.prompt_state = None
        self._episode_batched = None

    def setup(self, classnames: Sequence[str]):
        P = self._P
        self.prompt_state = P.build_prompt_state(
            self.clip_params, classnames, ctx_init=self.ctx_init, n_ctx=self.n_ctx,
            ctx0=self.ctx0_override, learned_cls=self.learned_cls,
        )
        self.reward.set_class_features(tokenized=self.prompt_state.tokenized)
        pt = self.prompt_state
        clip_params, cfg = self.clip_params, self.clip_cfg
        reward_model = self.reward
        ecfg = self.ecfg

        # NOTE on jit boundaries: model params are passed as ARGUMENTS to
        # every outer jit. Closure-captured arrays become compile-time
        # constants baked into the executable — with 430M reward+policy
        # params that produced multi-hundred-MB executables and pathological
        # (or crashing) compiles on the TPU compile service.
        # The prompt-template arrays derive from the token embedding (weights!)
        # — pass them as jit arguments too, both to keep executables free of a
        # [C, T, D] constant (158 MB at 1000 ImageNet classes) and to keep
        # serving exports weight-agnostic.
        learned_cls = self.learned_cls
        pt_args = {"fixed_embed": pt.fixed_embed, "ctx_map": pt.ctx_map, "eot_idx": pt.eot_idx}
        if learned_cls:
            trainable0 = {"ctx": pt.ctx0, "cls": pt.cls0}
            pt_args["cls_mask"] = pt.cls_mask
        else:
            trainable0 = pt.ctx0

        # fused attention for frozen towers AND the episode's text fwd+bwd:
        # TPU-only, single-chip (a dp-sharded pallas_call would need
        # shard_map), ViT towers only. The text kernel is G-blocked — one
        # grid step per ~40 sequences at T~16; one-per-sequence granularity
        # measured 64.7 -> 78.3 ms/img before the blocking
        attn_for = lambda c: clip_model.best_attn(c, sharded=self.mesh is not None)
        attn_text = attn_for(cfg)

        def text_features(cparams, trainable, pt_a):
            if learned_cls:
                prompts = P.splice_arrays(
                    trainable["ctx"], pt_a["fixed_embed"], pt_a["ctx_map"], trainable["cls"], pt_a["cls_mask"]
                )
            else:
                prompts = P.splice_arrays(trainable, pt_a["fixed_embed"], pt_a["ctx_map"])
            feats = clip_model.encode_text_embeds(cparams, cfg, prompts, pt_a["eot_idx"], attn=attn_text)
            return clip_model.normalize(feats.astype(jnp.float32))

        # Initial text features are per-dataset constants: confidence selection
        # uses them for free (the reference re-runs the text tower for the
        # selection forward; here it costs one setup-time forward). The two
        # stages compile separately — the frozen towers (stage A) and the
        # text-tower TTA scan (stage B) — keeping graphs small.
        tf0 = jax.jit(text_features)(clip_params, trainable0, pt_args)

        from ..core import losses as Lo
        from ..core.episode import make_optimizer, step_loss

        teacher_scale = (
            jnp.exp(reward_model.params["logit_scale"]) if hasattr(reward_model, "params") else None
        )
        opt = make_optimizer(ecfg)

        is_ensemble = not hasattr(reward_model, "params")
        if is_ensemble and ecfg.loss not in ("rlcf", "tpt"):
            raise ValueError(
                f"loss '{ecfg.loss}' needs single-teacher logits; reward ensembles "
                "only support the 'rlcf'/'tpt' losses (the reference KD paths use "
                "one reward CLIP, `TPT/tpt_cls_rl.py:201-219`)"
            )
        if is_ensemble:
            member_cfgs = [m.cfg for m in reward_model.members]
            reward_params_arg = tuple(m.params for m in reward_model.members)
            reward_feats_arg = tuple(m.class_features for m in reward_model.members)
        else:
            member_cfgs = None
            reward_params_arg = reward_model.params
            reward_feats_arg = reward_model.class_features

        def _reward_encode(rparams_, rcfg_, views, r_class_feats):
            from ..ops.image_ops import resize_bicubic_align_corners

            res = rcfg_.image_resolution
            if views.shape[1] != res:
                views = resize_bicubic_align_corners(views, res)
            feats = clip_model.normalize(
                clip_model.encode_image(rparams_, rcfg_, views, attn=attn_for(rcfg_)).astype(jnp.float32)
            )
            return jnp.dot(feats, r_class_feats.T, preferred_element_type=jnp.float32)

        @functools.partial(jax.jit, static_argnames=("views_shape",))
        def prepare(cparams, rparams, tf0_, r_class_feats, views_batch, views_shape=None):
            """[N, B, H, W, 3] -> (img_feats [N,B,E], sel [N,S], reward_sim).

            reward_sim: [N, S, C] for a single reward, [N, M, S, C] stacked
            for ensembles. uint8 views are raw pixels, CLIP-normalized here
            on device (4x cheaper host->device transfer; the normalize fuses
            into the first conv). ``views_shape``: when set, ``views_batch``
            arrives as a FLAT u8 buffer and is reshaped on device — a rank-5
            [.., 3]-minor u8 array tile-pads through the transfer path
            (measured 45 MB/s vs 1.5 GB/s flat on this fabric, a 34x
            difference); the reshape fuses into the normalize+conv consumer.
            """
            if views_shape is not None:
                views_batch = views_batch.reshape(views_shape)
            views_batch = maybe_normalize_u8(views_batch)
            N, B = views_batch.shape[:2]
            n_keep = max(1, int(B * ecfg.selection_p))
            flat = views_batch.reshape((N * B,) + views_batch.shape[2:])
            img = clip_model.encode_image(cparams, cfg, flat, attn=attn_for(cfg))
            img_feats = clip_model.normalize(img.astype(jnp.float32)).reshape(N, B, -1)
            scale_ = jnp.exp(cparams["logit_scale"]).astype(jnp.float32)
            logits0 = scale_ * jnp.einsum("nbe,ce->nbc", img_feats, tf0_, preferred_element_type=jnp.float32)
            ent = Lo.entropy_per_sample(logits0)
            sel = Lo.select_confident_entropy(ent, n_keep)  # [N, S]
            sel_views = jnp.take_along_axis(
                views_batch, sel[:, :, None, None, None], axis=1
            ).reshape((N * n_keep,) + views_batch.shape[2:])
            if is_ensemble:
                sims = [
                    _reward_encode(rp, rc, sel_views, rf).reshape(N, n_keep, -1)
                    for rp, rc, rf in zip(rparams, member_cfgs, r_class_feats)
                ]
                r_sim = jnp.stack(sims, axis=1)  # [N, M, S, C]
            else:
                r_sim = _reward_encode(rparams, reward_model.cfg, sel_views, r_class_feats).reshape(N, n_keep, -1)
            return img_feats, sel, r_sim

        def one_episode(cparams, trainable0_, pt_a, tf0_, img_feats, sel, reward_sim):
            # Everything weight-derived (trainable init, prompt-template
            # embeddings, logit scale) is an ARGUMENT, not a closure: no big
            # baked constants, and serving exports stay weight-agnostic.
            sel_feats = img_feats[sel]  # [S, E]
            scale_ = jnp.exp(cparams["logit_scale"]).astype(jnp.float32)

            def loss_fn(ctx):
                tf = text_features(cparams, ctx, pt_a)
                logits = scale_ * jnp.dot(sel_feats, tf.T, preferred_element_type=jnp.float32)
                return step_loss(logits, reward_sim, ecfg, reward_model.score_samples, teacher_scale)

            def step(carry, _):
                ctx, opt_state = carry
                loss, g = jax.value_and_grad(loss_fn)(ctx)
                upd, opt_state = opt.update(g, opt_state, ctx)
                return (optax.apply_updates(ctx, upd), opt_state), loss

            (ctx_t, _), losses = jax.lax.scan(
                step, (trainable0_, opt.init(trainable0_)), None, length=ecfg.tta_steps
            )
            tf_final = text_features(cparams, ctx_t, pt_a) if ecfg.tta_steps > 0 else tf0_
            final = scale_ * jnp.dot(img_feats[:1], tf_final.T, preferred_element_type=jnp.float32)
            return final[0], losses

        # ---- patch-major token path (the TPU-native hot path) --------------
        # Views arrive pre-patchified on host: policy tokens [N, B, Tp, p²·3]
        # and reward tokens [N, B, Tr, q²·3] u8. Patch embedding is one MXU
        # matmul; no [..., 3]-minor image tensor ever exists on device (that
        # layout tile-pads 42x and costs ~0.8 s per 256-view group in
        # transfer OR relayout). ViT policy + single ViT reward only.
        token_mode_ok = cfg.is_vit and (not is_ensemble)
        patch_size = cfg.vision_patch_size
        # frozen-tower encodes route through the VMEM-fused attention kernel
        # on TPU (the dense [B,H,T,T] fp32 HBM round trip measured 37% of the
        # image-tower forward for 4% of its FLOPs)
        attn_impl = attn_for(cfg)

        @jax.jit
        def prepare_tokens(cparams, rparams, tf0_, r_class_feats, ptoks, rtoks=None):
            N, B, Tp, Dp = ptoks.shape
            n_keep = max(1, int(B * ecfg.selection_p))
            x = normalize_u8_patch_tokens(ptoks).reshape(N * B, Tp, Dp)
            img = clip_model.encode_image_tokens(cparams, cfg, x, attn=attn_impl)
            img_feats = clip_model.normalize(img.astype(jnp.float32)).reshape(N, B, -1)
            scale_ = jnp.exp(cparams["logit_scale"]).astype(jnp.float32)
            logits0 = scale_ * jnp.einsum("nbe,ce->nbc", img_feats, tf0_, preferred_element_type=jnp.float32)
            sel = Lo.select_confident_entropy(Lo.entropy_per_sample(logits0), n_keep)  # [N, S]
            if rtoks is not None:
                # reward pre-patchified on host at the reward's own patch size
                # (ViT reward at the view resolution only)
                Tr, Dr = rtoks.shape[2], rtoks.shape[3]
                sel_r = jnp.take_along_axis(rtoks, sel[:, :, None, None], axis=1)
                rx = normalize_u8_patch_tokens(sel_r).reshape(N * n_keep, Tr, Dr)
                feats = clip_model.normalize(
                    clip_model.encode_image_tokens(rparams, reward_model.cfg, rx, attn=attn_impl).astype(jnp.float32)
                )
                r_sim = jnp.dot(feats, r_class_feats.T, preferred_element_type=jnp.float32)
                r_sim = r_sim.reshape(N, n_keep, -1)
            else:
                # depatchify ONLY the selected views (S << B) back to image
                # space for the reward tower — works for any reward arch and
                # resolution (resize happens in _reward_encode); the costly
                # [..., 3]-minor layout exists only for the small selection.
                sel_p = jnp.take_along_axis(ptoks, sel[:, :, None, None], axis=1)  # [N, S, Tp, Dp]
                sel_x = normalize_u8_patch_tokens(sel_p).reshape(N * n_keep, Tp, Dp)
                sel_views = clip_model.images_from_patch_tokens(sel_x, patch_size)
                r_sim = _reward_encode(rparams, reward_model.cfg, sel_views, r_class_feats).reshape(
                    N, n_keep, -1
                )
            return img_feats, sel, r_sim

        self._prepare_tokens = prepare_tokens if token_mode_ok else None

        # Multi-chip placement: class-axis arrays sharded over tp (replicated
        # over dp); GSPMD propagates the shardings through prepare/episodes
        # and inserts the all-gathers where the full class axis is needed
        # (entropy/top-k). Falls back to replication when the class count
        # doesn't tile the tp axis.
        if self.mesh is not None and "tp" in self.mesh.shape:
            from jax.sharding import NamedSharding, PartitionSpec as Spec

            tp = self.mesh.shape["tp"]
            n_cls = pt.fixed_embed.shape[0]
            if n_cls % tp == 0:
                cls_sh = NamedSharding(self.mesh, Spec("tp"))
                pt_args = {
                    k: jax.device_put(v, cls_sh)
                    if k in ("fixed_embed", "ctx_map", "eot_idx", "cls_mask") and v is not None
                    else v
                    for k, v in pt_args.items()
                }
                tf0 = jax.device_put(tf0, cls_sh)
                if not is_ensemble:
                    reward_feats_arg = jax.device_put(reward_feats_arg, cls_sh)
            else:
                print(f"NOTE: {n_cls} classes not divisible by tp={tp}; class axis replicated")

        self._tf0 = tf0
        self._trainable0 = trainable0
        self._pt_args = pt_args
        self._reward_params_arg = reward_params_arg
        self._reward_feats_arg = reward_feats_arg
        self._prepare = prepare
        self._episodes = jax.jit(jax.vmap(one_episode, in_axes=(None, None, None, None, 0, 0, 0)))
        return self

    def adapt(self, views_batch):
        """views_batch: [N, B, H, W, 3] -> (final_logits [N, C], aux).

        Host uint8 batches ship FLAT and reshape on device: the rank-5
        [..., 3]-minor u8 layout tile-pads through the host->device path
        (34x slower transfer measured); flat rides the fast path and the
        device reshape fuses into the first conv's input processing.
        """
        from ..parallel.mesh import dp_put

        views_shape = None
        if self.mesh is not None and getattr(views_batch, "ndim", 0) == 5:
            # multi-chip: dp-shard the episode axis (u8 included — the flat
            # fast path is a single-chip tunnel optimization and would leave
            # the batch replicated across the dp groups)
            views_batch = dp_put(self.mesh, jnp.asarray(views_batch))
        elif isinstance(views_batch, np.ndarray) and views_batch.dtype == np.uint8:
            views_shape = views_batch.shape
            views_batch = jax.device_put(np.ascontiguousarray(views_batch).reshape(-1))
        img_feats, sel, r_sim = self._prepare(
            self.clip_params, self._reward_params_arg, self._tf0, self._reward_feats_arg,
            jnp.asarray(views_batch), views_shape=views_shape,
        )
        logits, losses = self._episodes(
            self.clip_params, self._trainable0, self._pt_args, self._tf0, img_feats, sel, r_sim
        )
        return logits, {"losses": losses, "selected": sel}

    def adapt_tokens(self, policy_tokens, reward_tokens=None):
        """TTA from pre-patchified u8 views (the TPU-native hot path).

        policy_tokens: [N, B, (res/p)², p²·3] u8, patch-major (row, col,
        channel) flattening of the views at the policy's patch size. With
        ``reward_tokens`` (same views at the reward's patch size) the reward
        tower also consumes tokens directly — requires a ViT reward at the
        view resolution; without it, only the confidence-selected views are
        depatchified on device for the reward (any reward arch/resolution).
        """
        if self._prepare_tokens is None:
            raise ValueError(
                "token mode needs a ViT policy and a single reward model "
                "(ResNet policies / reward ensembles take the NHWC adapt() path)"
            )
        pd = self.clip_cfg.vision_patch_size ** 2 * 3
        if policy_tokens.shape[-1] != pd:
            raise ValueError(
                f"policy patch dim {policy_tokens.shape[-1]} doesn't match the tower (expect {pd})"
            )
        if reward_tokens is not None:
            if not self.reward.cfg.is_vit:
                raise ValueError("reward_tokens require a ViT reward; omit them to use depatchify")
            rd = self.reward.cfg.vision_patch_size ** 2 * 3
            if reward_tokens.shape[-1] != rd:
                raise ValueError(
                    f"reward patch dim {reward_tokens.shape[-1]} doesn't match the tower (expect {rd})"
                )
            n_tok_r = (self.reward.cfg.image_resolution // self.reward.cfg.vision_patch_size) ** 2
            if reward_tokens.shape[2] != n_tok_r:
                raise ValueError(
                    f"reward tokens carry {reward_tokens.shape[2]} patches but the reward tower "
                    f"expects {n_tok_r}: views must be generated at the reward resolution "
                    f"({self.reward.cfg.image_resolution}px)"
                )
            reward_tokens = jnp.asarray(reward_tokens)
        from ..parallel.mesh import dp_put

        policy_tokens = dp_put(self.mesh, jnp.asarray(policy_tokens))
        if reward_tokens is not None:
            reward_tokens = dp_put(self.mesh, reward_tokens)
        img_feats, sel, r_sim = self._prepare_tokens(
            self.clip_params, self._reward_params_arg, self._tf0, self._reward_feats_arg,
            policy_tokens, reward_tokens,
        )
        logits, losses = self._episodes(
            self.clip_params, self._trainable0, self._pt_args, self._tf0, img_feats, sel, r_sim
        )
        return logits, {"losses": losses, "selected": sel}

    def adapt_sources_fn(self, *, n_views: int, src_size: int = 256, resolution: int = 224,
                         augmix: bool = True, interpret: bool = False):
        """Single-dispatch flagship hot path: u8 source images -> final logits.

        Fuses the Pallas view generator, the frozen-tower prepare, and the
        episode vmap into ONE jitted program, and derives the per-group RNG
        on device from a carried int32 counter. The host-side alternative
        (eager ``PRNGKey``+``split`` then three separate jit calls per group)
        costs tens of ms of synchronous tunnel round-trips per group on a
        remote TPU fabric — measured ~8 ms/img of the flagship's end-to-end
        overhead at group 4. Returns ``run(images_planar_u8, seed) ->
        (logits, losses, next_seed)``; pass ``next_seed`` back in so the seed
        stays device-resident (a dependent dispatch is ~1 ms; a fresh host
        scalar is a fresh H2D round trip).

        Replaces the reference's host-side AugMix dataloader + per-step GPU
        dispatch (`TPT/tpt_cls_rl.py:237-262`) with one compiled program per
        episode group. ViT policy + single ViT reward (token mode) only.
        """
        if self._prepare_tokens is None:
            raise ValueError(
                "adapt_sources_fn needs token mode (ViT policy, single reward); "
                "use adapt() with a host view generator otherwise"
            )
        from ..ops.pallas_augmix import fused_views, fused_views_sharded

        pcfg, rcfg = self.clip_cfg, self.reward.cfg
        reward_same = rcfg.is_vit and rcfg.image_resolution == resolution
        fkw = dict(n_views=n_views, resolution=resolution, src_size=src_size, augmix=augmix,
                   p_policy=pcfg.vision_patch_size,
                   p_reward=rcfg.vision_patch_size if reward_same else 0,
                   interpret=interpret)
        prep, eps, mesh = self._prepare_tokens, self._episodes, self.mesh

        @jax.jit
        def run(cparams, rparams, trainable0, pt_args, tf0, r_feats, images_planar, seed):
            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), seed), images_planar.shape[0]
            )
            if mesh is not None and images_planar.shape[0] % mesh.shape["dp"] == 0:
                toks = fused_views_sharded(images_planar, keys, mesh, **fkw)
            else:
                toks = fused_views(images_planar, keys, **fkw)
            ptoks, rtoks = toks if isinstance(toks, tuple) else (toks, None)
            img_feats, sel, r_sim = prep(cparams, rparams, tf0, r_feats, ptoks, rtoks)
            logits, losses = eps(cparams, trainable0, pt_args, tf0, img_feats, sel, r_sim)
            return logits, losses, seed + 1

        def adapt(images_planar, seed):
            return run(self.clip_params, self._reward_params_arg, self._trainable0,
                       self._pt_args, self._tf0, self._reward_feats_arg,
                       images_planar, jnp.asarray(seed, jnp.int32))

        return adapt

    def adapt_sources_scan_fn(self, *, n_views: int, src_size: int = 256,
                              resolution: int = 224, augmix: bool = True,
                              interpret: bool = False):
        """Scanned macro-batch flagship path: MANY episode groups per dispatch.

        ``run(images_planar_u8 [G, N, 3, S, S], seed) -> (logits [G, N, C],
        losses, next_seed)`` — a ``lax.scan`` over G groups of the same
        fused viewgen + prepare + episodes body as :meth:`adapt_sources_fn`,
        with the identical per-group RNG stream (group g uses ``seed + g``;
        ``next_seed = seed + G``), so scanning G groups equals G chained
        single-dispatch calls exactly.

        Why it exists: even the single-dispatch path pays per-call host work
        (pytree flattening of two CLIP towers + a tunnel dispatch) — measured
        ~35 ms/group on this fabric, ~18% of a group's device time. Scanning
        amortizes that to once per macro-batch, so steady-state throughput
        reads the episode roofline. Peak memory is ONE group (scan reuses the
        body's buffers); only the [G, N, C] logits accumulate.

        Replaces the reference's outer dataset loop (`TPT/tpt_cls_rl.py:237`)
        for throughput runs; use :meth:`adapt_sources_fn` for per-sample
        latency.
        """
        if self._prepare_tokens is None:
            raise ValueError(
                "adapt_sources_scan_fn needs token mode (ViT policy, single reward); "
                "use adapt() with a host view generator otherwise"
            )
        from ..ops.pallas_augmix import fused_views, fused_views_sharded

        pcfg, rcfg = self.clip_cfg, self.reward.cfg
        reward_same = rcfg.is_vit and rcfg.image_resolution == resolution
        fkw = dict(n_views=n_views, resolution=resolution, src_size=src_size, augmix=augmix,
                   p_policy=pcfg.vision_patch_size,
                   p_reward=rcfg.vision_patch_size if reward_same else 0,
                   interpret=interpret)
        prep, eps, mesh = self._prepare_tokens, self._episodes, self.mesh

        @jax.jit
        def run(cparams, rparams, trainable0, pt_args, tf0, r_feats, images_planar, seed):
            group = images_planar.shape[1]

            def body(s, imgs_g):
                keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), s), group)
                if mesh is not None and group % mesh.shape["dp"] == 0:
                    toks = fused_views_sharded(imgs_g, keys, mesh, **fkw)
                else:
                    toks = fused_views(imgs_g, keys, **fkw)
                ptoks, rtoks = toks if isinstance(toks, tuple) else (toks, None)
                img_feats, sel, r_sim = prep(cparams, rparams, tf0, r_feats, ptoks, rtoks)
                logits, losses = eps(cparams, trainable0, pt_args, tf0, img_feats, sel, r_sim)
                return s + 1, (logits, losses)

            next_seed, (logits, losses) = jax.lax.scan(body, seed, images_planar)
            return logits, losses, next_seed

        def adapt(images_planar, seed):
            return run(self.clip_params, self._reward_params_arg, self._trainable0,
                       self._pt_args, self._tf0, self._reward_feats_arg,
                       images_planar, jnp.asarray(seed, jnp.int32))

        return adapt

    # -- serving export -----------------------------------------------------

    def serving_fn(self):
        """Pure fused episode for AOT export (see ``utils.export``).

        (cparams, rparams, trainable0, pt_args, tf0, r_feats, views) ->
        logits [N, C]. All weight-derived values (prompt init, template
        embeddings, logit scale, text features) are arguments, so one artifact
        serves any checkpoint of this architecture/class-count. Exception: KD
        losses bind the reward logit scale at export time.
        """
        prepare, episodes = self._prepare, self._episodes

        def serve(cparams, rparams, trainable0, pt_args, tf0, r_feats, views):
            img_feats, sel, r_sim = prepare(cparams, rparams, tf0, r_feats, views)
            logits, _ = episodes(cparams, trainable0, pt_args, tf0, img_feats, sel, r_sim)
            return logits

        return serve

    def serving_example_args(self, views_shape, views_dtype=jnp.float32):
        """Example-argument tuple (shape structs ok) matching ``serving_fn``."""
        return (
            self.clip_params,
            self._reward_params_arg,
            self._trainable0,
            self._pt_args,
            self._tf0,
            self._reward_feats_arg,
            jax.ShapeDtypeStruct(tuple(views_shape), views_dtype),
        )

    def serving_fn_tokens(self):
        """Token-input serving variant (the production hot path).

        (cparams, rparams, trainable0, pt_args, tf0, r_feats,
        policy_tokens u8 [N, B, T, p²·3]) -> logits [N, C]. Patch-major u8
        input rides the fast transfer layout; the reward consumes the
        depatchified selected views, so any reward arch works.
        """
        if self._prepare_tokens is None:
            raise ValueError("token serving needs a ViT policy and a single reward model")
        prepare_tokens, episodes = self._prepare_tokens, self._episodes

        def serve(cparams, rparams, trainable0, pt_args, tf0, r_feats, policy_tokens):
            img_feats, sel, r_sim = prepare_tokens(cparams, rparams, tf0, r_feats, policy_tokens)
            logits, _ = episodes(cparams, trainable0, pt_args, tf0, img_feats, sel, r_sim)
            return logits

        return serve

    def serving_example_args_tokens(self, tokens_shape, tokens_dtype=jnp.uint8):
        """Example-argument tuple matching ``serving_fn_tokens``."""
        return (
            self.clip_params,
            self._reward_params_arg,
            self._trainable0,
            self._pt_args,
            self._tf0,
            self._reward_feats_arg,
            jax.ShapeDtypeStruct(tuple(tokens_shape), tokens_dtype),
        )


# ---------------------------------------------------------------------------
# Encoder TTA: `TPT/tune_cls_rl.py` (CLIPCLS_TTA) — tune the visual tower
# ---------------------------------------------------------------------------


class EncoderTTAClassifier:
    """Visual-encoder test-time adaptation with frozen class text features.

    Mirrors `CLIPCLS_TTA` (`custom_clip.py:364-497`): class features are
    computed once per dataset from plain prompts; episodes adapt the visual
    tower (or only its normalization affines with ``only_norm``) under the
    REINFORCE/TPT/KD loss; optional momentum-EMA re-anchoring of the episode
    start point every ``update_freq`` samples; optional BN-prior statistics
    mixing for ResNet towers (`tune_cls_rl.py:35-44`).
    """

    def __init__(
        self,
        clip_params,
        clip_cfg,
        reward,
        ecfg,
        prompt_prefix: str = "a photo of a",
        only_norm: bool = False,
        momentum_update: bool = False,
        update_freq: int = 256,
        update_w: float = 1.0,
        momentum: float = 0.9999,
        bn_prior: Optional[float] = None,
        mesh=None,
        remat=True,
    ):
        from ..core import policy as Po

        if not hasattr(reward, "params"):
            raise ValueError(
                "EncoderTTAClassifier requires a single ClipReward; reward "
                "ensembles are only supported by PromptTTAClassifier (matching "
                "the reference encoder path, `TPT/tune_cls_rl.py`)"
            )
        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.reward = reward
        self.ecfg = ecfg
        self.prompt_prefix = prompt_prefix
        self.only_norm = only_norm
        self.momentum_cfg = dict(momentum=momentum, update_freq=update_freq, update_w=update_w)
        self.momentum_update = momentum_update
        self.bn_prior = bn_prior
        self.mesh = mesh  # episode-DP: batches shard over dp, params replicate
        # remat policy for the differentiated visual tower: True = full
        # per-layer recompute (round-3 winner), "save_attn" = keep each
        # block's attention output for the backward (layers.transformer)
        self.remat = remat
        self._Po = Po

        if only_norm:
            self.trainable0, self.frozen_visual = Po.partition(clip_params["visual"], Po.norm_only_filter)
        else:
            self.trainable0, self.frozen_visual = clip_params["visual"], None
        self.momentum_state = Po.MomentumState.create(self.trainable0) if momentum_update else None
        self._episode_batched = None
        self.class_features = None

    def setup(self, classnames: Sequence[str]):
        from ..core.episode import make_tta_episode
        from ..core.prompt import splice_prompts  # noqa: F401 (parity note)

        Po = self._Po
        self.class_features = compute_class_features(self.clip_params, self.clip_cfg, classnames, self.prompt_prefix)
        self.reward.set_class_features(
            tokenized=np.asarray(
                tokenize(assemble_prompts(classnames, self.prompt_prefix))
            )
        )
        clip_params, cfg = self.clip_params, self.clip_cfg
        scale = jnp.exp(clip_params["logit_scale"])
        reward_model = self.reward
        only_norm = self.only_norm
        bn_prior = self.bn_prior

        # Params flow in as jit arguments (never closures) — closure-captured
        # weights get baked into executables as constants, exploding compiles.
        def policy_logits_with(cparams, class_feats):
            def policy_logits(trainable, cache, idx):
                visual = Po.merge(trainable, cache["frozen_visual"]) if only_norm else trainable
                params = {**cparams, "visual": visual}
                # remat: the episode backward differentiates through the full
                # view batch's visual tower — storing all activations OOMs HBM
                # at 64 views x group>1 (measured 21.5 GB); checkpointing the
                # scan-over-layers recomputes them (bwd +~1 fwd of FLOPs)
                feats = clip_model.encode_image(
                    params, cfg, cache["views"][idx], bn_prior=bn_prior, remat=self.remat,
                    attn=clip_model.best_attn(cfg, sharded=self.mesh is not None),
                )
                feats = clip_model.normalize(feats.astype(jnp.float32))
                return scale * jnp.dot(feats, class_feats.T, preferred_element_type=jnp.float32)

            return policy_logits

        teacher_scale = jnp.exp(reward_model.params["logit_scale"]) if hasattr(reward_model, "params") else None

        def full_episode(cparams, rparams, class_feats, r_class_feats, frozen_visual, trainable0, views):
            views = maybe_normalize_u8(views)

            def reward_image_sim(views_sel):
                from ..ops.image_ops import resize_bicubic_align_corners

                res = reward_model.cfg.image_resolution
                if views_sel.shape[1] != res:
                    views_sel = resize_bicubic_align_corners(views_sel, res)
                feats = clip_model.normalize(
                    clip_model.encode_image(
                        rparams, reward_model.cfg, views_sel,
                        attn=clip_model.best_attn(reward_model.cfg, sharded=self.mesh is not None),
                    ).astype(jnp.float32)
                )
                return jnp.dot(feats, r_class_feats.T, preferred_element_type=jnp.float32)

            episode = make_tta_episode(
                policy_logits_with(cparams, class_feats),
                reward_image_sim,
                reward_model.score_samples,
                self.ecfg,
                teacher_scale=teacher_scale,
                return_adapted=self.momentum_update,
            )
            return episode(trainable0, {"views": views, "frozen_visual": frozen_visual}, views)

        vmapped = jax.vmap(full_episode, in_axes=(None, None, None, None, None, None, 0))

        @functools.partial(jax.jit, static_argnames=("views_shape",))
        def episode_batched(cparams, rparams, class_feats, r_class_feats, frozen_visual, trainable0, views, views_shape=None):
            # flat-u8 fast transfer path (see PromptTTAClassifier.adapt)
            if views_shape is not None:
                views = views.reshape(views_shape)
            return vmapped(cparams, rparams, class_feats, r_class_feats, frozen_visual, trainable0, views)

        self._episode_batched = episode_batched
        return self

    def adapt(self, views_batch):
        """views_batch: [N, B, H, W, 3] -> (final_logits [N, C], aux).

        With momentum_update, adapted weights of each episode in the batch are
        EMA-folded in order (`tune_cls_rl.py:240`). Note: all N episodes in
        one call start from the same anchor, so when ``update_freq`` falls
        inside a group the re-anchor takes effect one group late vs the
        strictly sequential reference — pass N=1 batches for exact parity.
        """
        Po = self._Po
        start = self.momentum_state.reset_params if self.momentum_update else self.trainable0
        views_shape = None
        if self.mesh is not None and getattr(views_batch, "ndim", 0) == 5:
            # multi-chip: dp-shard the episode axis (the flat-u8 fast path is
            # a single-chip tunnel optimization and would replicate the batch)
            from ..parallel.mesh import dp_put

            views_batch = dp_put(self.mesh, jnp.asarray(views_batch))
        elif isinstance(views_batch, np.ndarray) and views_batch.dtype == np.uint8:
            views_shape = views_batch.shape
            views_batch = jax.device_put(np.ascontiguousarray(views_batch).reshape(-1))
        logits, aux = self._episode_batched(
            self.clip_params,
            self.reward.params,
            self.class_features,
            self.reward.class_features,
            self.frozen_visual,
            start,
            jnp.asarray(views_batch),
            views_shape=views_shape,
        )
        if self.momentum_update:
            self.momentum_state = Po.momentum_update_batch(
                self.momentum_state, aux["adapted"], **self.momentum_cfg
            )
            aux = {k: v for k, v in aux.items() if k != "adapted"}
        return logits[:, 0], aux


# ---------------------------------------------------------------------------
# CoCoOp: image-conditioned prompt TTA (`TPT/clip/cocoop.py`, `tpt_cls.py`)
# ---------------------------------------------------------------------------


def init_meta_net(rng, embed_dim: int, ctx_dim: int, dtype=jnp.float32):
    """CoCoOp meta-net: Linear(E, E//16) -> ReLU -> Linear(E//16, D)
    (`cocoop.py:53-57`)."""
    import jax.random as jr

    k1, k2 = jr.split(rng)
    hidden = embed_dim // 16
    scale1 = (embed_dim) ** -0.5
    scale2 = (hidden) ** -0.5
    return {
        "w1": (jr.normal(k1, (embed_dim, hidden)) * scale1).astype(dtype),
        "b1": jnp.zeros((hidden,), dtype),
        "w2": (jr.normal(k2, (hidden, ctx_dim)) * scale2).astype(dtype),
        "b2": jnp.zeros((ctx_dim,), dtype),
    }


def meta_net_forward(params, im_features):
    h = jax.nn.relu(im_features @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def convert_cocoop_checkpoint(sd):
    """Torch CoCoOp ckpt -> (ctx [n_ctx, D], meta_net params).

    Accepts keys with or without a ``prompt_generator.``/``prompt_learner.``
    prefix (`load_model_weight`, `TPT/utils/tools.py:101-131`).
    """
    import numpy as _np

    def find(suffix):
        for k, v in sd.items():
            if k.endswith(suffix):
                return _np.asarray(v, dtype=_np.float32)
        raise KeyError(suffix)

    ctx = jnp.asarray(find("ctx"))
    meta = {
        "w1": jnp.asarray(find("meta_net.linear1.weight").T),
        "b1": jnp.asarray(find("meta_net.linear1.bias")),
        "w2": jnp.asarray(find("meta_net.linear2.weight").T),
        "b2": jnp.asarray(find("meta_net.linear2.bias")),
    }
    return ctx, meta


class CoCoOpTTAClassifier:
    """TPT-style TTA over a CoCoOp instance-conditioned context.

    Per sample: the frozen meta-net produces ``pgen_ctx = ctx +
    meta_net(mean image feature)`` from the base view (`cocoop.py:173-182`),
    then ``tta_steps`` entropy-minimization updates tune pgen_ctx only
    (`tpt_cls.py:50-53,100-114`); prediction uses the adapted context.
    """

    def __init__(self, clip_params, clip_cfg, ecfg, ctx_init="a photo of a", n_ctx=4, ctx0=None, meta_net=None, rng=None):
        from ..core import prompt as P

        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.ecfg = ecfg
        self.ctx_init = ctx_init
        self.n_ctx = n_ctx
        self._P = P
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ctx_dim = clip_cfg.text_width
        self.meta_net = meta_net or init_meta_net(rng, clip_cfg.embed_dim, ctx_dim)
        self.ctx0_override = ctx0
        self.prompt_state = None
        self._episode_batched = None

    def setup(self, classnames: Sequence[str]):
        from ..core.episode import make_tta_episode

        P = self._P
        self.prompt_state = P.build_prompt_state(
            self.clip_params, classnames, ctx_init=self.ctx_init, n_ctx=self.n_ctx, ctx0=self.ctx0_override
        )
        pt = self.prompt_state
        cfg = self.clip_cfg
        n_cls = pt.n_cls
        # Prompt-template arrays derive from the token embedding (weights) —
        # pass them as jit ARGUMENTS like PromptTTAClassifier does: closure
        # capture would bake a [C, T, D] constant into the executable
        # (multi-MB at 1000 classes; this env's compile service has crashed
        # on baked-constant executables).
        pt_args = {"fixed_embed": pt.fixed_embed, "ctx_map": pt.ctx_map, "eot_idx": pt.eot_idx}

        def full_episode(cparams, meta_params, pt_a, ctx_init_, views):
            views = maybe_normalize_u8(views)
            scale = jnp.exp(cparams["logit_scale"]).astype(jnp.float32)

            def policy_logits(ctx, cache, idx):
                prompts = P.splice_arrays(ctx, pt_a["fixed_embed"], pt_a["ctx_map"])
                tf = clip_model.encode_text_embeds(cparams, cfg, prompts, pt_a["eot_idx"])
                tf = clip_model.normalize(tf.astype(jnp.float32))
                return scale * jnp.dot(cache["img_feats"][idx], tf.T, preferred_element_type=jnp.float32)

            episode = make_tta_episode(
                policy_logits,
                reward_image_sim=lambda v: jnp.zeros((1, n_cls)),  # unused (tpt loss)
                score_samples=None,
                ecfg=self.ecfg,
                # text-tower cost is idx-independent: the masked-VJP reuse
                # saves a full text forward vs the step-0 recompute
                step0_reuse=True,
            )
            img = clip_model.encode_image(cparams, cfg, views)
            img_feats = clip_model.normalize(img.astype(jnp.float32))
            # instance-conditioned ctx from the base view's features
            bias = meta_net_forward(meta_params, img_feats[:1].astype(jnp.float32))  # [1, D]
            ctx0 = ctx_init_ + bias[0][None, :].astype(ctx_init_.dtype)
            return episode(ctx0, {"img_feats": img_feats}, views)

        self._pt_args = pt_args
        self._episode_batched = jax.jit(jax.vmap(full_episode, in_axes=(None, None, None, None, 0)))
        return self

    def adapt(self, views_batch):
        logits, aux = self._episode_batched(
            self.clip_params, self.meta_net, self._pt_args, self.prompt_state.ctx0, jnp.asarray(views_batch)
        )
        return logits[:, 0], aux
