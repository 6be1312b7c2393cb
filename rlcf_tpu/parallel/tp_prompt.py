"""Class-axis (tp) sharding for the prompt-TTA text tower.

The long axis in RLCF classification is the class-prompt batch (1000 ImageNet
prompts re-encoded every TTA step). This module shards that axis over the
mesh's ``tp`` dimension with ``shard_map``: each chip encodes its class
shard's prompts (the trainable ctx is replicated), computes its logits
columns, and an ``all_gather`` over the small [S, C_local] logit blocks
restores the full class axis for selection/top-k/rewards. Gradients flow
through shard_map back to the replicated ctx with a psum.

This is the "shard the class/gallery axis" design from SURVEY §2.5 — the
reward gallery (~25k captions) shards the same way for retrieval.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models import clip as clip_model
from ..core import prompt as Pr


def shard_prompt_state(mesh: Mesh, pt: Pr.PromptState):
    """Place the per-class prompt arrays with the class axis over tp."""
    cls_sharded = NamedSharding(mesh, P("tp"))
    replicated = NamedSharding(mesh, P())
    return Pr.PromptState(
        ctx0=jax.device_put(pt.ctx0, replicated),
        fixed_embed=jax.device_put(pt.fixed_embed, cls_sharded),
        ctx_map=jax.device_put(pt.ctx_map, cls_sharded),
        eot_idx=jax.device_put(pt.eot_idx, cls_sharded),
        tokenized=pt.tokenized,
        cls0=pt.cls0,
        cls_mask=pt.cls_mask,
    )


def make_tp_text_features(mesh: Mesh, clip_cfg):
    """Build text_features(cparams, ctx, fixed_embed, ctx_map, eot_idx) with
    the class axis sharded over tp; returns replicated [C, E] features."""

    def local_features(cparams, ctx, fixed_embed, ctx_map, eot_idx):
        # per-shard prompt splice + text tower over the local class slice
        gather = ctx[jnp.clip(ctx_map, 0)]
        use_ctx = (ctx_map >= 0)[..., None].astype(ctx.dtype)
        prompts = fixed_embed.astype(ctx.dtype) + gather * use_ctx
        feats = clip_model.encode_text_embeds(cparams, clip_cfg, prompts, eot_idx)
        feats = clip_model.normalize(feats.astype(jnp.float32))
        # restore the full class axis for downstream top-k/selection
        return jax.lax.all_gather(feats, "tp", axis=0, tiled=True)

    return shard_map(
        local_features,
        mesh=mesh,
        in_specs=(P(), P(), P("tp"), P("tp"), P("tp")),
        out_specs=P(),
        check_vma=False,
    )


def tp_logits_fn(mesh: Mesh, clip_cfg, scale):
    """logits(cparams, ctx, img_feats, pt arrays) with tp-sharded classes."""
    text_features = make_tp_text_features(mesh, clip_cfg)

    def logits(cparams, ctx, img_feats, fixed_embed, ctx_map, eot_idx):
        tf = text_features(cparams, ctx, fixed_embed, ctx_map, eot_idx)
        return scale * jnp.dot(img_feats, tf.T, preferred_element_type=jnp.float32)

    return logits
