"""CoOp-style learnable prompt state as pure embedding surgery.

Rebuilds the reference ``PromptLearner`` (`TPT/clip/custom_clip.py:76-289`)
functionally: instead of per-class python concatenation of prefix/ctx/suffix
slices, prompt assembly is one static-shaped gather —

    prompts[c, t] = fixed_embed[c, t]            where ctx_map[c, t] < 0
                    ctx[ctx_map[c, t]]           where ctx_map[c, t] >= 0
                    (+ cls[c] at cls_mask positions, if learned_cls)

which covers all three class-token positions (end/middle/front) with one
differentiable expression; gradients reach only ``ctx`` (and ``cls``).

``build_prompt_state`` is host-side setup, re-run per dataset exactly like
``reset_classnames`` (`custom_clip.py:169-196`). The per-episode weight reset
(`custom_clip.py:161-167`) is free: episodes always start from ``ctx0``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..tokenizer import get_tokenizer, tokenize


@dataclasses.dataclass
class PromptState:
    """Device arrays describing the prompt template for one class set."""

    ctx0: jnp.ndarray          # [n_ctx, D] initial context vectors
    fixed_embed: jnp.ndarray   # [C, T, D] embeddings, zeroed at ctx positions
    ctx_map: jnp.ndarray       # [C, T] int32: ctx index or -1
    eot_idx: jnp.ndarray       # [C] pooling positions (argmax of token ids)
    tokenized: np.ndarray      # [C, T] token ids (reward model re-tokenization)
    cls0: Optional[jnp.ndarray] = None   # [C, D] learnable class token init
    cls_mask: Optional[jnp.ndarray] = None  # [C, T] 1.0 at the class-token slot

    @property
    def n_cls(self) -> int:
        return self.fixed_embed.shape[0]

    @property
    def n_ctx(self) -> int:
        return self.ctx0.shape[0]


def splice_arrays(ctx, fixed_embed, ctx_map, cls=None, cls_mask=None):
    """Assemble [C, T, D] prompt embeddings from explicit arrays.

    Keeping ``fixed_embed`` an argument (it derives from the token embedding,
    i.e. model weights) lets jitted consumers avoid baking a [C, T, D]
    constant into the executable and keeps serving exports weight-agnostic.
    """
    # one-hot matmul instead of gather: rows with ctx_map == -1 match no
    # column and contribute zero; forward is an exact single-term sum and the
    # BACKWARD is a matmul too (the gather's adjoint is a scatter-add, which
    # runs far off the TPU fast path)
    onehot = (ctx_map[..., None] == jnp.arange(ctx.shape[0])).astype(ctx.dtype)  # [C, T, n_ctx]
    prompts = fixed_embed.astype(ctx.dtype) + jnp.einsum(
        "ctn,nd->ctd", onehot, ctx, preferred_element_type=jnp.float32
    ).astype(ctx.dtype)
    if cls is not None:
        prompts = prompts + cls[:, None, :] * cls_mask[..., None].astype(ctx.dtype)
    return prompts


def splice_prompts(ctx, state: PromptState, cls=None):
    """Assemble [C, T, D] prompt embeddings from trainable ctx (and cls)."""
    return splice_arrays(ctx, state.fixed_embed, state.ctx_map, cls,
                         state.cls_mask if cls is not None else None)


def init_ctx_from_words(clip_params, ctx_init: str):
    """Context vectors from a word phrase (`custom_clip.py:90-107`)."""
    phrase = ctx_init.replace("_", " ").replace("[CLS] ", "")
    tokens = tokenize(phrase)[0]
    n_ctx = int((tokens > 0).sum()) - 2  # minus SOT/EOT
    embedding = np.asarray(clip_params["text"]["token_embedding"])[tokens]
    return jnp.asarray(embedding[1 : 1 + n_ctx]), phrase, n_ctx


def build_prompt_state(
    clip_params,
    classnames: Sequence[str],
    ctx_init: Optional[str] = "a photo of a",
    n_ctx: int = 4,
    ctx_position: str = "end",
    ctx0: Optional[jnp.ndarray] = None,
    learned_cls: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> PromptState:
    """Host-side prompt-template construction for a class set.

    ``ctx0`` overrides the initial context (e.g. loaded CoOp weights,
    `TPT/tpt_cls_rl.py:95-101`); otherwise it is word-initialized from
    ``ctx_init`` or randomly drawn (std 0.02).
    """
    tok = get_tokenizer()
    token_embedding = np.asarray(clip_params["text"]["token_embedding"])
    ctx_dim = token_embedding.shape[1]

    split_idx = None
    if ctx_init:
        if "[CLS]" in ctx_init:
            ctx_position = "middle"
            split_idx = ctx_init.replace("_", " ").split(" ").index("[CLS]")
        if ctx0 is None:
            ctx0, prompt_prefix, n_ctx = init_ctx_from_words(clip_params, ctx_init)
        else:
            prompt_prefix = ctx_init.replace("_", " ").replace("[CLS] ", "")
            n_ctx = ctx0.shape[0]
    else:
        if ctx0 is None:
            rng = rng or np.random.default_rng(0)
            ctx0 = jnp.asarray(rng.normal(0.0, 0.02, size=(n_ctx, ctx_dim)).astype(np.float32))
        else:
            n_ctx = ctx0.shape[0]  # provided weights define the slot count
        prompt_prefix = " ".join(["X"] * n_ctx)

    if learned_cls and ctx_position != "end":
        # The reference only wires the learnable class token into the "end"
        # layout (`custom_clip.py:239-260`); other positions would silently
        # drop it, so reject instead.
        raise ValueError("learned_cls requires ctx_position='end'")

    classnames = [name.replace("_", " ") for name in classnames]
    if learned_cls:
        name_lens = [1] * len(classnames)
        prompts = [f"{prompt_prefix} X." for _ in classnames]
    else:
        name_lens = [len(tok.encode(name)) for name in classnames]
        prompts = [f"{prompt_prefix} {name}." for name in classnames]

    tokenized = tokenize(prompts)  # [C, 77]
    embeds = token_embedding[tokenized]  # [C, 77, D]
    C, T, D = embeds.shape

    ctx_map = np.full((C, T), -1, dtype=np.int32)
    cls_mask = np.zeros((C, T), dtype=np.float32)
    for c in range(C):
        nl = name_lens[c]
        if ctx_position == "end":
            ctx_map[c, 1 : 1 + n_ctx] = np.arange(n_ctx)
            if learned_cls:
                cls_mask[c, 1 + n_ctx] = 1.0
        elif ctx_position == "middle":
            half = split_idx if split_idx is not None else n_ctx // 2
            # layout: SOT, ctx[:half], name, ctx[half:], rest
            ctx_map[c, 1 : 1 + half] = np.arange(half)
            start2 = 1 + half + nl
            ctx_map[c, start2 : start2 + (n_ctx - half)] = np.arange(half, n_ctx)
        elif ctx_position == "front":
            # layout: SOT, name, ctx, rest
            ctx_map[c, 1 + nl : 1 + nl + n_ctx] = np.arange(n_ctx)
        else:
            raise ValueError(ctx_position)

    # For middle/front the token stream was tokenized in template order
    # (prefix first); re-derive embeddings by reordering is unnecessary: the
    # reference reorders *embedding slices* of the same tokenized prompts
    # (`custom_clip.py:239-284`). Reproduce that: build the fixed embedding by
    # slicing prefix/name/suffix segments into their final positions.
    fixed = embeds.copy()
    if ctx_position in ("middle", "front"):
        fixed = np.zeros_like(embeds)
        for c in range(C):
            nl = name_lens[c]
            prefix = embeds[c, :1]
            name_seg = embeds[c, 1 + n_ctx : 1 + n_ctx + nl]
            rest = embeds[c, 1 + n_ctx + nl :]
            if ctx_position == "middle":
                half = split_idx if split_idx is not None else n_ctx // 2
                fixed[c, 0] = prefix
                fixed[c, 1 + half : 1 + half + nl] = name_seg
                fixed[c, 1 + half + nl + (n_ctx - half) :] = rest[: T - (1 + half + nl + (n_ctx - half))]
            else:  # front
                fixed[c, 0] = prefix
                fixed[c, 1 : 1 + nl] = name_seg
                fixed[c, 1 + nl + n_ctx :] = rest[: T - (1 + nl + n_ctx)]
    fixed[ctx_map >= 0] = 0.0
    if learned_cls:
        fixed[cls_mask > 0] = 0.0

    cls0 = None
    if learned_cls:
        rng = rng or np.random.default_rng(0)
        cls0 = jnp.asarray(rng.normal(0.0, 0.02, size=(C, ctx_dim)).astype(np.float32))

    eot = tokenized.argmax(axis=-1)
    # Exact-math sequence truncation: causal attention means positions past
    # the pooled EOT never influence the text features, so the padded-to-77
    # tail (the reference always runs full context, `TPT/clip/model.py:343`)
    # is dead compute. Keep max(eot)+1 positions, padded to a multiple of 8
    # for TPU sublane tiling — ~5x fewer text-tower FLOPs per TTA step for
    # typical class prompts, bit-identical pooled outputs.
    t_max = min(T, int(-(-(int(eot.max()) + 1) // 8) * 8))

    return PromptState(
        ctx0=jnp.asarray(ctx0),
        fixed_embed=jnp.asarray(fixed[:, :t_max]),
        ctx_map=jnp.asarray(ctx_map[:, :t_max]),
        eot_idx=jnp.asarray(eot),
        tokenized=tokenized,
        cls0=cls0,
        cls_mask=jnp.asarray(cls_mask[:, :t_max]) if learned_cls else None,
    )


def load_coop_ctx(path: str) -> jnp.ndarray:
    """Load pretrained CoOp context vectors from a torch checkpoint
    (`TPT/tpt_cls_rl.py:95-101`)."""
    from ..models.convert import load_torch_file

    sd = load_torch_file(path)
    for key in ("ctx", "state_dict.ctx", "prompt_learner.ctx"):
        if key in sd:
            return jnp.asarray(sd[key])
    raise KeyError(f"no ctx tensor found in {path}; keys: {list(sd)[:10]}")
