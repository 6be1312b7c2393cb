"""CLIP (ViT + ModifiedResNet towers) as pure JAX functions over param pytrees.

One implementation unifies the four vendored CLIP copies of the reference
(`TPT/clip/model.py`, `retrieval/lavis/models/clip_models/model.py`,
`caption/image_llm/clip/model.py`, `clipscore/clip/model.py`):

- ``encode_image(..., pool=False)`` returns all patch tokens, the caption
  fork's extension (`caption/image_llm/clip/model.py:235-245`).
- ``encode_text`` supports shorter-than-77 sequences with sliced positional
  embeddings (`caption/image_llm/clip/model.py:349-367`).
- ``encode_text_embeds`` consumes pre-assembled token embeddings so CoOp-style
  prompt splicing (`TPT/clip/custom_clip.py:198-289`) stays a pure embedding
  operation with gradients flowing only through the spliced context vectors.

Architecture hyperparameters and the state-dict shape inference mirror
``build_model`` (`TPT/clip/model.py:399-438`). Convs run NHWC (TPU-native);
LayerNorm is fp32; matmuls accumulate fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    name: str
    embed_dim: int
    image_resolution: int
    vision_layers: Union[int, Tuple[int, int, int, int]]
    vision_width: int
    vision_patch_size: Optional[int]
    text_width: int
    text_layers: int
    context_length: int = 77
    vocab_size: int = 49408
    # Overrides for tiny test configs where width//64 would be 0.
    vision_heads_override: Optional[int] = None
    text_heads_override: Optional[int] = None

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    @property
    def vision_heads(self) -> int:
        if self.vision_heads_override:
            return self.vision_heads_override
        return self.vision_width // 64 if self.is_vit else self.vision_width * 32 // 64

    @property
    def text_heads(self) -> int:
        return self.text_heads_override or self.text_width // 64

    @property
    def grid_size(self) -> int:
        assert self.is_vit
        return self.image_resolution // self.vision_patch_size


def _cfg(name, embed_dim, res, vl, vw, patch, tw, tl, **kw):
    return ClipConfig(name, embed_dim, res, vl, vw, patch, tw, tl, **kw)


CLIP_ARCHS = {
    "ViT-B/32": _cfg("ViT-B/32", 512, 224, 12, 768, 32, 512, 12),
    "ViT-B/16": _cfg("ViT-B/16", 512, 224, 12, 768, 16, 512, 12),
    "ViT-L/14": _cfg("ViT-L/14", 768, 224, 24, 1024, 14, 768, 12),
    "ViT-L/14@336px": _cfg("ViT-L/14@336px", 768, 336, 24, 1024, 14, 768, 12),
    "RN50": _cfg("RN50", 1024, 224, (3, 4, 6, 3), 64, None, 512, 12),
    "RN101": _cfg("RN101", 512, 224, (3, 4, 23, 3), 64, None, 512, 12),
    "RN50x4": _cfg("RN50x4", 640, 288, (4, 6, 10, 6), 80, None, 640, 12),
    "RN50x16": _cfg("RN50x16", 768, 384, (6, 8, 18, 8), 96, None, 768, 12),
    "RN50x64": _cfg("RN50x64", 1024, 448, (3, 15, 36, 10), 128, None, 1024, 12),
    # Tiny architectures for tests (same code paths, minutes-not-hours compiles).
    "test-tiny-vit": _cfg("test-tiny-vit", 32, 32, 2, 64, 8, 64, 2, vocab_size=512),
    "test-tiny-rn": _cfg("test-tiny-rn", 64, 64, (1, 1, 1, 1), 16, None, 64, 2, vocab_size=512),
    # Small full-vocab arch: real tokenizer range, CPU-friendly compiles.
    "test-small": _cfg("test-small", 64, 64, 2, 64, 16, 64, 2),
}


def get_config(arch: str) -> ClipConfig:
    return CLIP_ARCHS[arch]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_clip_params(rng, cfg: ClipConfig, dtype=jnp.float32):
    k_vis, k_txt, k_tok, k_pos, k_proj = jax.random.split(rng, 5)
    if cfg.is_vit:
        visual = _init_vit(k_vis, cfg, dtype)
    else:
        visual = _init_resnet(k_vis, cfg, dtype)
    text = {
        "token_embedding": (jax.random.normal(k_tok, (cfg.vocab_size, cfg.text_width)) * 0.02).astype(dtype),
        "positional_embedding": (jax.random.normal(k_pos, (cfg.context_length, cfg.text_width)) * 0.01).astype(dtype),
        "blocks": L.init_transformer_blocks(k_txt, cfg.text_layers, cfg.text_width, dtype),
        "ln_final_w": jnp.ones((cfg.text_width,), dtype),
        "ln_final_b": jnp.zeros((cfg.text_width,), dtype),
        "projection": (jax.random.normal(k_proj, (cfg.text_width, cfg.embed_dim)) * cfg.text_width**-0.5).astype(dtype),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }


def _init_vit(rng, cfg: ClipConfig, dtype):
    ks = jax.random.split(rng, 4)
    W, P = cfg.vision_width, cfg.vision_patch_size
    scale = W**-0.5
    n_tokens = cfg.grid_size**2 + 1
    return {
        "conv_w": (jax.random.normal(ks[0], (P, P, 3, W)) * scale).astype(dtype),
        "class_emb": (jax.random.normal(ks[1], (W,)) * scale).astype(dtype),
        "pos_emb": (jax.random.normal(ks[2], (n_tokens, W)) * scale).astype(dtype),
        "ln_pre_w": jnp.ones((W,), dtype),
        "ln_pre_b": jnp.zeros((W,), dtype),
        "blocks": L.init_transformer_blocks(ks[3], cfg.vision_layers, W, dtype),
        "ln_post_w": jnp.ones((W,), dtype),
        "ln_post_b": jnp.zeros((W,), dtype),
        "proj": (jax.random.normal(ks[3], (W, cfg.embed_dim)) * scale).astype(dtype),
    }


def _init_bn(c, dtype):
    return {
        "w": jnp.ones((c,), dtype),
        "b": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def _init_bottleneck(rng, inplanes, planes, has_downsample, dtype):
    ks = jax.random.split(rng, 4)
    he = lambda k, shape: (jax.random.normal(k, shape) * np.sqrt(2.0 / np.prod(shape[:-1]))).astype(dtype)
    p = {
        "conv1_w": he(ks[0], (1, 1, inplanes, planes)),
        "bn1": _init_bn(planes, dtype),
        "conv2_w": he(ks[1], (3, 3, planes, planes)),
        "bn2": _init_bn(planes, dtype),
        "conv3_w": he(ks[2], (1, 1, planes, planes * 4)),
        "bn3": _init_bn(planes * 4, dtype),
    }
    if has_downsample:
        p["downsample"] = {"conv_w": he(ks[3], (1, 1, inplanes, planes * 4)), "bn": _init_bn(planes * 4, dtype)}
    return p


def _init_resnet(rng, cfg: ClipConfig, dtype):
    W = cfg.vision_width
    ks = jax.random.split(rng, 8)
    he = lambda k, shape: (jax.random.normal(k, shape) * np.sqrt(2.0 / np.prod(shape[:-1]))).astype(dtype)
    stem = {
        "conv1_w": he(ks[0], (3, 3, 3, W // 2)),
        "bn1": _init_bn(W // 2, dtype),
        "conv2_w": he(ks[1], (3, 3, W // 2, W // 2)),
        "bn2": _init_bn(W // 2, dtype),
        "conv3_w": he(ks[2], (3, 3, W // 2, W)),
        "bn3": _init_bn(W, dtype),
    }
    groups = []
    inplanes = W
    for g, n_blocks in enumerate(cfg.vision_layers):
        planes = W * (2**g)
        blocks = []
        for b in range(n_blocks):
            has_ds = b == 0  # stride>1 or channel change on every group's first block
            blocks.append(_init_bottleneck(jax.random.fold_in(ks[3 + g], b), inplanes, planes, has_ds, dtype))
            inplanes = planes * 4
        groups.append(blocks)
    embed_dim_vis = W * 32
    spacial = cfg.image_resolution // 32
    k_ap = ks[7]
    kq, kk, kv, kc, kp = jax.random.split(k_ap, 5)
    std = embed_dim_vis**-0.5
    attnpool = {
        "pos_emb": (jax.random.normal(kp, (spacial**2 + 1, embed_dim_vis)) * std).astype(dtype),
        "q_w": (jax.random.normal(kq, (embed_dim_vis, embed_dim_vis)) * std).astype(dtype),
        "q_b": jnp.zeros((embed_dim_vis,), dtype),
        "k_w": (jax.random.normal(kk, (embed_dim_vis, embed_dim_vis)) * std).astype(dtype),
        "k_b": jnp.zeros((embed_dim_vis,), dtype),
        "v_w": (jax.random.normal(kv, (embed_dim_vis, embed_dim_vis)) * std).astype(dtype),
        "v_b": jnp.zeros((embed_dim_vis,), dtype),
        "c_w": (jax.random.normal(kc, (embed_dim_vis, cfg.embed_dim)) * std).astype(dtype),
        "c_b": jnp.zeros((cfg.embed_dim,), dtype),
    }
    return {"stem": stem, "groups": groups, "attnpool": attnpool}


# ---------------------------------------------------------------------------
# Vision towers
# ---------------------------------------------------------------------------


def _vit_post_patch(p, cfg: ClipConfig, x, pool=True, remat=False, attn="dense"):
    """Shared ViT trunk after patch embedding: x [B, T, W] patch activations."""
    B, T, W = x.shape
    cls_tok = jnp.broadcast_to(p["class_emb"].astype(x.dtype), (B, 1, W))
    x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + p["pos_emb"].astype(x.dtype)
    x = L.layer_norm(x, p["ln_pre_w"], p["ln_pre_b"])
    x = L.transformer(x, p["blocks"], cfg.vision_heads, remat=remat, attn=attn)
    if pool:
        x = L.layer_norm(x[:, 0, :], p["ln_post_w"], p["ln_post_b"])
        return jnp.dot(x, p["proj"], preferred_element_type=jnp.float32).astype(x.dtype)
    x = L.layer_norm(x, p["ln_post_w"], p["ln_post_b"])
    return jnp.dot(x, p["proj"], preferred_element_type=jnp.float32).astype(x.dtype)


def _vit_encode(p, cfg: ClipConfig, images, pool=True, remat=False, attn="dense"):
    """images: [B, H, W, 3] NHWC, normalized. Cast to the tower's dtype like
    the reference's ``image.type(self.dtype)`` (`TPT/clip/model.py:340-341`)."""
    x = L.conv2d(images.astype(p["conv_w"].dtype), p["conv_w"], stride=cfg.vision_patch_size, padding="VALID")
    B, gh, gw, W = x.shape
    return _vit_post_patch(p, cfg, x.reshape(B, gh * gw, W), pool=pool, remat=remat, attn=attn)


def patch_tokens_from_images(images, patch_size: int):
    """NHWC images -> patch-major tokens [B, T, patch_size*patch_size*3].

    Patch vector order is (row, col, channel) — exactly the contraction order
    of the HWIO patchify conv, so ``encode_image_tokens`` on these tokens is
    bit-for-bit the conv path. Works on numpy or jax arrays.
    """
    B, H, W, C = images.shape
    gh, gw = H // patch_size, W // patch_size
    x = images.reshape(B, gh, patch_size, gw, patch_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, gh * gw, patch_size * patch_size * C)


def images_from_patch_tokens(tokens, patch_size: int):
    """Inverse of ``patch_tokens_from_images``: [B, T, p*p*3] -> NHWC images.

    Device-side materialization of the [..., 3]-minor layout — use only for
    small selections (e.g. reward-tower inputs after confidence selection).
    """
    B, T, D = tokens.shape
    g = int(round(T ** 0.5))
    p = patch_size
    x = tokens.reshape(B, g, g, p, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, g * p, g * p, 3)


def encode_image_tokens(params, cfg: ClipConfig, tokens, pool=True, attn="dense"):
    """Encode pre-patchified views: tokens [B, T, p*p*3] -> [B, embed_dim].

    The TPU-native hot path: hosts ship views in patch-major layout (minor
    dim p*p*3, e.g. 768 — rides the fast transfer path and tiles perfectly)
    and patch embedding becomes one MXU matmul with the conv kernel reshaped
    [p*p*3, width]; no image-space [..., 3]-minor tensor ever materializes on
    device (such layouts tile-pad 42x). ViT towers only.
    """
    if not cfg.is_vit:
        raise ValueError("encode_image_tokens requires a ViT tower (ResNets keep the NHWC path)")
    p = params["visual"]
    W = p["conv_w"].shape[-1]
    kmat = p["conv_w"].reshape(-1, W)  # HWIO row-major == (row, col, channel)
    x = jnp.dot(tokens.astype(kmat.dtype), kmat, preferred_element_type=jnp.float32).astype(kmat.dtype)
    return _vit_post_patch(p, cfg, x, pool=pool, attn=attn)


def _bottleneck(x, p, stride: int, bn_prior=None):
    bn = lambda h, q: L.batch_norm_2d(h, q, prior=bn_prior)
    out = jax.nn.relu(bn(L.conv2d(x, p["conv1_w"]), p["bn1"]))
    out = jax.nn.relu(bn(L.conv2d(out, p["conv2_w"], padding=1), p["bn2"]))
    if stride > 1:
        out = L.avg_pool(out, stride)
    out = bn(L.conv2d(out, p["conv3_w"]), p["bn3"])
    if "downsample" in p:
        identity = x if stride == 1 else L.avg_pool(x, stride)
        identity = bn(L.conv2d(identity, p["downsample"]["conv_w"]), p["downsample"]["bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attention_pool(x, p, n_heads: int):
    """QKV attention pool over NHWC feature map (`TPT/clip/model.py:58-91`)."""
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C)
    mean_tok = jnp.mean(tokens, axis=1, keepdims=True)
    tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # [B, HW+1, C]
    tokens = tokens + p["pos_emb"].astype(tokens.dtype)
    q = L.linear(tokens[:, :1], p["q_w"], p["q_b"])
    k = L.linear(tokens, p["k_w"], p["k_b"])
    v = L.linear(tokens, p["v_w"], p["v_b"])
    head_dim = C // n_heads
    T = tokens.shape[1]
    q = q.reshape(B, 1, n_heads, head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, n_heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, n_heads, head_dim).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(head_dim)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
    return L.linear(out, p["c_w"], p["c_b"])


def _resnet_encode(p, cfg: ClipConfig, images, bn_prior=None):
    bn = lambda h, q: L.batch_norm_2d(h, q, prior=bn_prior)
    stem = p["stem"]
    x = images.astype(stem["conv1_w"].dtype)
    x = jax.nn.relu(bn(L.conv2d(x, stem["conv1_w"], stride=2, padding=1), stem["bn1"]))
    x = jax.nn.relu(bn(L.conv2d(x, stem["conv2_w"], padding=1), stem["bn2"]))
    x = jax.nn.relu(bn(L.conv2d(x, stem["conv3_w"], padding=1), stem["bn3"]))
    x = L.avg_pool(x, 2)
    for g, blocks in enumerate(p["groups"]):
        for b, block in enumerate(blocks):
            stride = 1 if (b > 0 or g == 0) else 2
            x = _bottleneck(x, block, stride, bn_prior)
    return _attention_pool(x, p["attnpool"], cfg.vision_heads)


def encode_image(params, cfg: ClipConfig, images, pool=True, bn_prior=None, remat=False, attn="dense"):
    """Encode NHWC images to [B, embed_dim] (or all tokens if ``pool=False``).

    ``remat``: checkpoint ViT layers — required by paths that differentiate
    through the tower on large view batches (encoder TTA); free otherwise.
    ``attn``: "fused" routes ViT attention through the VMEM-fused kernel
    (TPU, unmasked; see `ops/pallas_attention.py`). ResNets ignore both."""
    if cfg.is_vit:
        return _vit_encode(params["visual"], cfg, images, pool=pool, remat=remat, attn=attn)
    return _resnet_encode(params["visual"], cfg, images, bn_prior=bn_prior)


def best_attn(cfg: "ClipConfig | None" = None, sharded: bool = False) -> str:
    """Pick the attention impl for a frozen/differentiated tower at trace
    time: the VMEM-fused kernel on a single TPU chip (ViT vision towers and
    any text tower — it carries a flash-style fused backward), dense
    elsewhere (CPU tests, dp/tp-sharded programs, ResNet towers)."""
    import jax as _jax

    if sharded or _jax.default_backend() != "tpu":
        return "dense"
    if cfg is not None and not cfg.is_vit:
        return "dense"
    return "fused"


# ---------------------------------------------------------------------------
# Text tower
# ---------------------------------------------------------------------------


def embed_tokens(params, tokens):
    """Token ids [B, T] -> embeddings [B, T, D]."""
    return params["text"]["token_embedding"][tokens]


def encode_text_embeds(params, cfg: ClipConfig, embeds, eot_index, attn="dense"):
    """Text features from pre-assembled token embeddings.

    ``eot_index`` [B] selects the pooled position (argmax of token ids in the
    reference, `TPT/clip/model.py:354`).
    """
    t = params["text"]
    T = embeds.shape[1]
    x = embeds + t["positional_embedding"][:T].astype(embeds.dtype)
    x = L.transformer(x, t["blocks"], cfg.text_heads, mask=L.causal_mask(T), attn=attn)
    x = L.layer_norm(x, t["ln_final_w"], t["ln_final_b"])
    # EOT pooling as a one-hot mask-sum (exact; the gather and its scatter
    # adjoint are slow on TPU)
    sel = (jnp.arange(T)[None, :] == eot_index[:, None]).astype(x.dtype)  # [B, T]
    pooled = jnp.einsum("bt,btd->bd", sel, x, preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.dot(pooled, t["projection"], preferred_element_type=jnp.float32).astype(x.dtype)


def encode_text(params, cfg: ClipConfig, tokens, pool=True, attn="dense"):
    """Standard text encoding from token ids [B, T] (T <= context_length)."""
    embeds = embed_tokens(params, tokens)
    if pool:
        eot_index = jnp.argmax(tokens, axis=-1)
        return encode_text_embeds(params, cfg, embeds, eot_index, attn=attn)
    t = params["text"]
    T = tokens.shape[1]
    x = embeds + t["positional_embedding"][:T].astype(embeds.dtype)
    x = L.transformer(x, t["blocks"], cfg.text_heads, mask=L.causal_mask(T))
    x = L.layer_norm(x, t["ln_final_w"], t["ln_final_b"])
    return jnp.dot(x, t["projection"], preferred_element_type=jnp.float32).astype(x.dtype)


def normalize(features, axis=-1, eps=0.0):
    return features / jnp.linalg.norm(features, axis=axis, keepdims=True)


def forward(params, cfg: ClipConfig, images, tokens):
    """Paired forward -> (logits_per_image, logits_per_text)."""
    img = normalize(encode_image(params, cfg, images))
    txt = normalize(encode_text(params, cfg, tokens))
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * jnp.dot(img, txt.T, preferred_element_type=jnp.float32)
    return logits_per_image, logits_per_image.T


# ---------------------------------------------------------------------------
# Architecture inference from a torch checkpoint's key/shape map
# ---------------------------------------------------------------------------


def infer_arch_from_state_dict(shapes: dict) -> ClipConfig:
    """Replicates ``build_model``'s shape sniffing (`TPT/clip/model.py:399-422`).

    ``shapes`` maps torch state-dict keys to tensor shapes.
    """
    is_vit = "visual.proj" in shapes
    if is_vit:
        vision_width = shapes["visual.conv1.weight"][0]
        vision_layers = len([k for k in shapes if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")])
        vision_patch = shapes["visual.conv1.weight"][-1]
        grid = round((shapes["visual.positional_embedding"][0] - 1) ** 0.5)
        image_resolution = vision_patch * grid
    else:
        counts = []
        for g in (1, 2, 3, 4):
            blocks = {k.split(".")[2] for k in shapes if k.startswith(f"visual.layer{g}")}
            counts.append(len(blocks))
        vision_layers = tuple(counts)
        vision_width = shapes["visual.layer1.0.conv1.weight"][0]
        out_width = round((shapes["visual.attnpool.positional_embedding"][0] - 1) ** 0.5)
        vision_patch = None
        image_resolution = out_width * 32
    embed_dim = shapes["text_projection"][1]
    context_length = shapes["positional_embedding"][0]
    vocab_size = shapes["token_embedding.weight"][0]
    text_width = shapes["ln_final.weight"][0]
    text_layers = len({k.split(".")[2] for k in shapes if k.startswith("transformer.resblocks")})
    return ClipConfig(
        name="from-checkpoint",
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch,
        text_width=text_width,
        text_layers=text_layers,
        context_length=context_length,
        vocab_size=vocab_size,
    )
