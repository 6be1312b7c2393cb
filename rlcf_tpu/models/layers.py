"""Shared neural-net building blocks (pure functions over param pytrees).

Numerical parity targets are the OpenAI CLIP blocks in the reference
(``TPT/clip/model.py``): fp32 LayerNorm regardless of activation dtype
(`model.py:157-163`), QuickGELU (`model.py:166-168`), and pre-LN residual
attention blocks (`model.py:171-192`). Transformer stacks are laid out
TPU-first: all layers' weights are stacked along a leading axis and the stack
is traversed with ``lax.scan`` so XLA compiles one layer body.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def layer_norm(x, weight, bias, eps: float = 1e-5):
    """LayerNorm computed in fp32, result cast back to the input dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def linear(x, w, b=None):
    """x @ w (+ b). Weights stored input-major: w[in, out]."""
    y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


# Global switch for the attention implementation: "dense" (default) or
# "flash" (jax's official Pallas flash-attention kernel; TPU only, pays off
# at longer sequences / larger batches than CLIP's 77-257 tokens — exposed
# for bigger towers and future workloads).
ATTN_IMPL = "dense"


def _flash_attention(q, k, v, causal: bool, scale: float):
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    return flash_attention(q, k, v, causal=causal, sm_scale=scale)


def multi_head_attention(x, qkv_w, qkv_b, out_w, out_b, n_heads: int, mask=None, attn: str = "dense"):
    """Self-attention over [B, T, D] with fused QKV projection.

    ``mask`` is an additive [T, T] bias (0 / -inf) matching the causal mask the
    reference text transformer builds (`TPT/clip/model.py:328-334`); the flash
    path maps it to its native causal flag. ``attn="fused"`` routes unmasked
    attention through the VMEM-fused Pallas kernel (`ops/pallas_attention.py`)
    — the dense path's [B, H, T, T] fp32 score round-trip through HBM is 37%
    of the image-tower forward for 4% of its FLOPs (measured round 3).
    """
    B, T, D = x.shape
    head_dim = D // n_heads
    qkv = linear(x, qkv_w, qkv_b)  # [B, T, 3D]
    scale = 1.0 / np.sqrt(head_dim)
    if attn == "fused":
        # fused path consumes qkv UNSPLIT: the per-head split happens via
        # static lane slices in VMEM, skipping the [B, H, T, D] split/merge
        # HBM relayouts entirely; masked (causal text) attention fuses too,
        # with a flash-style fused backward for differentiated towers
        from ..ops.pallas_attention import fused_attention

        return linear(fused_attention(qkv, mask, n_heads, float(scale)), out_w, out_b)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(B, T, n_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    if ATTN_IMPL == "flash" and T % 128 == 0:
        out = _flash_attention(q, k, v, causal=mask is not None, scale=scale).astype(x.dtype)
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        if mask is not None:
            logits = logits + mask.astype(logits.dtype)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    return linear(out, out_w, out_b)


def residual_block(x, p, n_heads: int, mask=None, attn: str = "dense"):
    """Pre-LN residual attention block (attn + QuickGELU MLP)."""
    from jax.ad_checkpoint import checkpoint_name

    h = layer_norm(x, p["ln1_w"], p["ln1_b"])
    # tagged for remat="save_attn": an identity outside checkpointed scopes
    a = checkpoint_name(
        multi_head_attention(h, p["qkv_w"], p["qkv_b"], p["out_w"], p["out_b"], n_heads, mask, attn=attn),
        "attn_out",
    )
    x = x + a
    h = layer_norm(x, p["ln2_w"], p["ln2_b"])
    x = x + linear(quick_gelu(linear(h, p["fc_w"], p["fc_b"])), p["proj_w"], p["proj_b"])
    return x


def transformer(x, blocks, n_heads: int, mask=None, remat=False, attn: str = "dense"):
    """Run a stacked-block transformer with lax.scan.

    ``blocks`` is a dict of arrays whose leading axis is the layer index.
    ``remat``: checkpoint each layer (scan-over-layers rematerialization) —
    the backward pass recomputes block activations instead of storing them.
    Essential for paths that differentiate through the tower on big batches
    (encoder-TTA's 64-view ViT backward kept ~20 GB of activations without
    it); forward-only uses are unaffected (nothing to rematerialize).

    Values: False (store everything), True (full per-layer recompute), or
    "save_attn" (recompute pointwise ops but SAVE each block's attention
    output — the backward reuses the expensive attention instead of
    re-running it; [B, T, D] per layer extra residency).
    """

    def body(h, layer_params):
        return residual_block(h, layer_params, n_heads, mask, attn=attn), None

    if remat == "save_attn":
        body = jax.checkpoint(body, policy=jax.checkpoint_policies.save_only_these_names("attn_out"))
    elif remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, blocks)
    return x


def init_transformer_blocks(rng, n_layers: int, width: int, dtype=jnp.float32):
    """Initialize a stacked transformer block pytree (CLIP init scheme,
    `TPT/clip/model.py:316-323`)."""
    keys = jax.random.split(rng, 4)
    proj_std = (width**-0.5) * ((2 * n_layers) ** -0.5)
    attn_std = width**-0.5
    fc_std = (2 * width) ** -0.5
    shape = lambda *s: (n_layers,) + s
    return {
        "ln1_w": jnp.ones(shape(width), dtype),
        "ln1_b": jnp.zeros(shape(width), dtype),
        "qkv_w": (jax.random.normal(keys[0], shape(width, 3 * width)) * attn_std).astype(dtype),
        "qkv_b": jnp.zeros(shape(3 * width), dtype),
        "out_w": (jax.random.normal(keys[1], shape(width, width)) * proj_std).astype(dtype),
        "out_b": jnp.zeros(shape(width), dtype),
        "ln2_w": jnp.ones(shape(width), dtype),
        "ln2_b": jnp.zeros(shape(width), dtype),
        "fc_w": (jax.random.normal(keys[2], shape(width, 4 * width)) * fc_std).astype(dtype),
        "fc_b": jnp.zeros(shape(4 * width), dtype),
        "proj_w": (jax.random.normal(keys[3], shape(4 * width, width)) * proj_std).astype(dtype),
        "proj_b": jnp.zeros(shape(width), dtype),
    }


def causal_mask(length: int):
    """Additive [T, T] causal mask (0 on/below diagonal, -inf above)."""
    return jnp.triu(jnp.full((length, length), -jnp.inf), k=1)


def batch_norm_2d(x, p, eps: float = 1e-5, prior: float | None = None):
    """Inference BatchNorm over NHWC using running statistics.

    ``prior`` implements the BN-prior trick from the reference encoder-TTA
    entry (`TPT/tune_cls_rl.py:35-44`): statistics become a convex mix of the
    running stats (weight ``prior``) and the current batch stats.
    """
    mean, var = p["mean"], p["var"]
    if prior is not None:
        x32 = x.astype(jnp.float32)
        batch_mean = jnp.mean(x32, axis=(0, 1, 2))
        batch_var = jnp.var(x32, axis=(0, 1, 2))
        mean = prior * mean + (1.0 - prior) * batch_mean
        var = prior * var + (1.0 - prior) * batch_var
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps) * p["w"].astype(jnp.float32)
    out = x.astype(jnp.float32) * inv + (p["b"].astype(jnp.float32) - mean.astype(jnp.float32) * inv)
    return out.astype(x.dtype)


def conv2d(x, w, stride: int = 1, padding="SAME"):
    """NHWC conv with HWIO weights.

    No ``preferred_element_type``: its transposed (backward) conv rejects the
    mixed bf16/f32 operands that arise when the loss upstream is fp32; TPU
    MXU accumulates bf16 convs in fp32 internally regardless.
    """
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def avg_pool(x, window: int):
    """Non-overlapping NHWC average pool."""
    return jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, window, window, 1), (1, window, window, 1), "VALID"
    ).astype(x.dtype) / (window * window)
