"""Prefix mappers: CLIP embedding -> LLM prefix tokens (ClipCap/CapDec).

Functional rebuild of `caption/image_llm/models/modules.py`:

- ``MLP`` mapper (`modules.py:13-25`): Linear/Tanh stack emitting
  prefix_length * llm_dim, reshaped to prefix tokens.
- ``TransformerMapper`` (`modules.py:139-160`): clip embedding projected to
  ``clip_length`` tokens, concatenated with learned prefix constants, run
  through an 8-head pre-LN transformer (ReLU MLP, ratio 2, bias-free q/kv
  projections), returning the trailing ``prefix_length`` tokens.
- ``TransformerEncoderDecoder`` (`modules.py:163-178`): a self-attention
  encoder over projected clip tokens and an alternating cross/self decoder
  driven by the prefix constants.

Converters ingest ClipCap/CapDec torch checkpoints (``clip_project.*`` keys).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    kind: str  # "mlp" | "transformer" | "transformer_encoder_decoder"
    clip_dim: int = 512
    llm_dim: int = 768
    prefix_length: int = 40
    clip_length: int = 40
    num_layers: int = 8
    n_heads: int = 8
    mlp_ratio: float = 2.0
    enc_dec_width: int = 512  # TransformerEncoderDecoder internal width


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_linear(rng, d_in, d_out, dtype, bias=True):
    w = (jax.random.normal(rng, (d_in, d_out)) * (d_in**-0.5)).astype(dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _init_xf_layer(rng, d_self, d_ref, mlp_ratio, dtype):
    ks = jax.random.split(rng, 5)
    h = int(d_self * mlp_ratio)
    return {
        "norm1_w": jnp.ones((d_self,), dtype),
        "norm1_b": jnp.zeros((d_self,), dtype),
        "q": _init_linear(ks[0], d_self, d_self, dtype, bias=False),
        "kv": _init_linear(ks[1], d_ref, 2 * d_self, dtype, bias=False),
        "proj": _init_linear(ks[2], d_self, d_self, dtype, bias=True),
        "norm2_w": jnp.ones((d_self,), dtype),
        "norm2_b": jnp.zeros((d_self,), dtype),
        "fc1": _init_linear(ks[3], d_self, h, dtype, bias=True),
        "fc2": _init_linear(ks[4], h, d_self, dtype, bias=True),
    }


def init_mapper_params(rng, cfg: MapperConfig, dtype=jnp.float32):
    ks = jax.random.split(rng, 4)
    if cfg.kind == "mlp":
        hidden = (cfg.llm_dim * cfg.prefix_length) // 2
        return {
            "fc1": _init_linear(ks[0], cfg.clip_dim, hidden, dtype),
            "fc2": _init_linear(ks[1], hidden, cfg.llm_dim * cfg.prefix_length, dtype),
        }
    if cfg.kind == "transformer":
        layers = [
            _init_xf_layer(jax.random.fold_in(ks[0], i), cfg.llm_dim, cfg.llm_dim, cfg.mlp_ratio, dtype)
            for i in range(cfg.num_layers)
        ]
        return {
            "linear": _init_linear(ks[1], cfg.clip_dim, cfg.clip_length * cfg.llm_dim, dtype),
            "prefix_const": jax.random.normal(ks[2], (cfg.prefix_length, cfg.llm_dim)).astype(dtype),
            "layers": layers,
        }
    if cfg.kind == "transformer_encoder_decoder":
        W = cfg.enc_dec_width
        enc = [
            _init_xf_layer(jax.random.fold_in(ks[0], i), W, W, cfg.mlp_ratio, dtype)
            for i in range(cfg.num_layers)
        ]
        # decoder alternates cross (ref=W) and self (ref=llm_dim) layers
        dec = []
        for i in range(cfg.num_layers * 2):
            d_ref = W if i % 2 == 0 else cfg.llm_dim
            dec.append(_init_xf_layer(jax.random.fold_in(ks[1], i), cfg.llm_dim, d_ref, cfg.mlp_ratio, dtype))
        return {
            "linear": _init_linear(ks[2], cfg.clip_dim, cfg.clip_length * W, dtype),
            "prefix_const": jax.random.normal(ks[3], (cfg.prefix_length, cfg.llm_dim)).astype(dtype),
            "encoder": enc,
            "decoder": dec,
        }
    raise ValueError(cfg.kind)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _linear(x, p):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def _ln(x, w, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _mha(x, y, p, n_heads):
    """modules.py MultiHeadAttention: q from x, fused kv from y."""
    B, N, C = x.shape
    M = y.shape[1]
    hd = C // n_heads
    q = _linear(x, p["q"]).reshape(B, N, n_heads, hd)
    kv = _linear(y, p["kv"]).reshape(B, M, 2, n_heads, hd)
    k, v = kv[:, :, 0], kv[:, :, 1]
    att = jnp.einsum("bnhd,bmhd->bnmh", q, k, preferred_element_type=jnp.float32) * (hd**-0.5)
    att = jax.nn.softmax(att, axis=2).astype(x.dtype)
    out = jnp.einsum("bnmh,bmhd->bnhd", att, v, preferred_element_type=jnp.float32).astype(x.dtype)
    return _linear(out.reshape(B, N, C), p["proj"])


def _xf_layer(x, y, p, n_heads):
    """Pre-LN block (`modules.py:79-98`). ``y=None`` means self-attention,
    whose keys/values come from the *normed* queries (reference forwards
    ``attn(norm1(x), y=None)`` and MultiHeadAttention defaults y to its normed
    input); an explicit ``y`` (cross or enc_dec self) is used unnormed."""
    xn = _ln(x, p["norm1_w"], p["norm1_b"])
    kv_src = xn if y is None else y
    x = x + _mha(xn, kv_src, p, n_heads)
    h = _ln(x, p["norm2_w"], p["norm2_b"])
    return x + _linear(jax.nn.relu(_linear(h, p["fc1"])), p["fc2"])


def mapper_forward(params, cfg: MapperConfig, clip_emb):
    """clip_emb [B, clip_dim] (or [B, T, clip_dim] for clip_patch) ->
    prefix tokens [B, prefix_length, llm_dim]."""
    if cfg.kind == "mlp":
        h = jnp.tanh(_linear(clip_emb, params["fc1"]))
        out = _linear(h, params["fc2"])
        return out.reshape(out.shape[0], cfg.prefix_length, cfg.llm_dim)
    if cfg.kind == "transformer":
        B = clip_emb.shape[0]
        x = _linear(clip_emb, params["linear"]).reshape(B, cfg.clip_length, cfg.llm_dim)
        const = jnp.broadcast_to(params["prefix_const"], (B,) + params["prefix_const"].shape)
        h = jnp.concatenate([x, const], axis=1)
        for layer in params["layers"]:
            h = _xf_layer(h, None, layer, cfg.n_heads)
        return h[:, cfg.clip_length :]
    if cfg.kind == "transformer_encoder_decoder":
        B = clip_emb.shape[0]
        ref = _linear(clip_emb, params["linear"]).reshape(B, cfg.clip_length, cfg.enc_dec_width)
        for layer in params["encoder"]:
            ref = _xf_layer(ref, None, layer, cfg.n_heads)
        x = jnp.broadcast_to(params["prefix_const"], (B,) + params["prefix_const"].shape)
        for i, layer in enumerate(params["decoder"]):
            y = ref if i % 2 == 0 else x
            x = _xf_layer(x, y, layer, cfg.n_heads)
        return x
    raise ValueError(cfg.kind)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (clip_project.* from ClipCap/CapDec ckpts)
# ---------------------------------------------------------------------------


def convert_mapper_state_dict(sd, cfg: MapperConfig, prefix: str = "clip_project."):
    def np_(k, tr=False):
        v = sd[prefix + k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        v = np.asarray(v, np.float32)
        return jnp.asarray(v.T if tr else v)

    if cfg.kind == "mlp":
        return {
            "fc1": {"w": np_("model.0.weight", True), "b": np_("model.0.bias")},
            "fc2": {"w": np_("model.2.weight", True), "b": np_("model.2.bias")},
        }
    if cfg.kind == "transformer":
        layers = []
        for i in range(cfg.num_layers):
            base = f"transformer.layers.{i}."
            layers.append(
                {
                    "norm1_w": np_(base + "norm1.weight"),
                    "norm1_b": np_(base + "norm1.bias"),
                    "q": {"w": np_(base + "attn.to_queries.weight", True)},
                    "kv": {"w": np_(base + "attn.to_keys_values.weight", True)},
                    "proj": {"w": np_(base + "attn.project.weight", True), "b": np_(base + "attn.project.bias")},
                    "norm2_w": np_(base + "norm2.weight"),
                    "norm2_b": np_(base + "norm2.bias"),
                    "fc1": {"w": np_(base + "mlp.fc1.weight", True), "b": np_(base + "mlp.fc1.bias")},
                    "fc2": {"w": np_(base + "mlp.fc2.weight", True), "b": np_(base + "mlp.fc2.bias")},
                }
            )
        return {
            "linear": {"w": np_("linear.weight", True), "b": np_("linear.bias")},
            "prefix_const": np_("prefix_const"),
            "layers": layers,
        }
    raise ValueError(f"conversion for {cfg.kind} not supported")
