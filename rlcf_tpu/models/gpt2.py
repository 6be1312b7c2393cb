"""GPT-2 language model (the legacy ClipCap captioner backend).

The reference's ``LLMModel`` wraps either HF GPT-2 or the OPT fork
(`caption/image_llm/models/modules.py:188-209`); captions are generated with
the classic ClipCap loops — a length-normalized beam search and a top-p
greedy sampler over ``inputs_embeds`` (`caption/image_llm/generate.py:9-145`).
This module provides the GPT-2 half TPU-natively: stacked transformer blocks
traversed with ``lax.scan``, static-shape KV-cache decoding, and jittable
generation loops with the reference's exact beam semantics.

Numerical parity target is HF ``GPT2LMHeadModel``: learned absolute position
embeddings added to (prefix ++ token) embeddings, pre-LN blocks with the
``gelu_new`` tanh activation, 1/sqrt(head_dim) attention scaling, final
``ln_f``, and the LM head tied to ``wte``.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .layers import layer_norm

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    name: str
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    ln_eps: float = 1e-5


GPT2_CONFIGS = {
    "gpt2": GPT2Config("gpt2"),
    "gpt2-medium": GPT2Config("gpt2-medium", n_embd=1024, n_layer=24, n_head=16),
    "gpt2-large": GPT2Config("gpt2-large", n_embd=1280, n_layer=36, n_head=20),
    "gpt2-xl": GPT2Config("gpt2-xl", n_embd=1600, n_layer=48, n_head=25),
    # tiny config for tests (HF-instantiable without downloads)
    "test-tiny-gpt2": GPT2Config("test-tiny-gpt2", vocab_size=96, n_positions=64, n_embd=32, n_layer=2, n_head=2),
}


def gelu_new(x):
    """HF 'gelu_new' tanh approximation (GPT-2's activation)."""
    x32 = x.astype(jnp.float32)
    y = 0.5 * x32 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x32 + 0.044715 * x32**3)))
    return y.astype(x.dtype)


def init_gpt2_params(rng, cfg: GPT2Config, dtype=jnp.float32):
    keys = jax.random.split(rng, 8)
    D, L = cfg.n_embd, cfg.n_layer
    std = 0.02
    # c_proj layers get the GPT-2 scaled init (std / sqrt(2 * n_layer))
    pstd = std / np.sqrt(2 * L)
    shape = lambda *s: (L,) + s
    blocks = {
        "ln1_w": jnp.ones(shape(D), dtype),
        "ln1_b": jnp.zeros(shape(D), dtype),
        "attn_w": (jax.random.normal(keys[0], shape(D, 3 * D)) * std).astype(dtype),
        "attn_b": jnp.zeros(shape(3 * D), dtype),
        "attn_proj_w": (jax.random.normal(keys[1], shape(D, D)) * pstd).astype(dtype),
        "attn_proj_b": jnp.zeros(shape(D), dtype),
        "ln2_w": jnp.ones(shape(D), dtype),
        "ln2_b": jnp.zeros(shape(D), dtype),
        "fc_w": (jax.random.normal(keys[2], shape(D, 4 * D)) * std).astype(dtype),
        "fc_b": jnp.zeros(shape(4 * D), dtype),
        "proj_w": (jax.random.normal(keys[3], shape(4 * D, D)) * pstd).astype(dtype),
        "proj_b": jnp.zeros(shape(D), dtype),
    }
    return {
        "wte": (jax.random.normal(keys[4], (cfg.vocab_size, D)) * std).astype(dtype),
        "wpe": (jax.random.normal(keys[5], (cfg.n_positions, D)) * std).astype(dtype),
        "blocks": blocks,
        "lnf_w": jnp.ones((D,), dtype),
        "lnf_b": jnp.zeros((D,), dtype),
    }


def _attention(x, bp, cfg: GPT2Config, bias, cache_kv=None, cache_index=None):
    """Causal self-attention; with a cache, x is the new suffix only.

    ``bias``: additive [.., Tq, Tk] mask. Returns (out, (k, v)) where k/v
    cover the full prefix for cache updates.
    """
    B, T, D = x.shape
    H = cfg.n_head
    hd = D // H
    qkv = jnp.dot(x, bp["attn_w"], preferred_element_type=jnp.float32).astype(x.dtype) + bp["attn_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda t: t.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    if cache_kv is not None:
        ck, cv = cache_kv  # [B, H, S, hd]
        k = jax.lax.dynamic_update_slice(ck, k, (0, 0, cache_index, 0))
        v = jax.lax.dynamic_update_slice(cv, v, (0, 0, cache_index, 0))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(hd)
    logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    out = jnp.dot(out, bp["attn_proj_w"], preferred_element_type=jnp.float32).astype(x.dtype) + bp["attn_proj_b"]
    return out, (k, v)


def _block(x, bp, cfg: GPT2Config, bias, cache_kv=None, cache_index=None):
    h = layer_norm(x, bp["ln1_w"], bp["ln1_b"], eps=cfg.ln_eps)
    a, kv = _attention(h, bp, cfg, bias, cache_kv, cache_index)
    x = x + a
    h = layer_norm(x, bp["ln2_w"], bp["ln2_b"], eps=cfg.ln_eps)
    m = jnp.dot(h, bp["fc_w"], preferred_element_type=jnp.float32).astype(x.dtype) + bp["fc_b"]
    m = jnp.dot(gelu_new(m), bp["proj_w"], preferred_element_type=jnp.float32).astype(x.dtype) + bp["proj_b"]
    return x + m, kv


def _embed(params, cfg: GPT2Config, tokens, prefix_embeds):
    parts = []
    if prefix_embeds is not None:
        parts.append(prefix_embeds.astype(params["wte"].dtype))
    if tokens is not None:
        parts.append(params["wte"][tokens])
    x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    T = x.shape[1]
    # HF GPT-2 assigns sequential positions regardless of attention mask
    return x + params["wpe"][:T]


def forward(params, cfg: GPT2Config, tokens=None, prefix_embeds=None, attention_mask=None):
    """LM logits [B, T, V] over (prefix ++ tokens).

    ``attention_mask`` [B, T] (1 = attend) combines with the causal mask the
    way HF does (additive large-negative on masked keys).
    """
    x = _embed(params, cfg, tokens, prefix_embeds)
    T = x.shape[1]
    bias = jnp.triu(jnp.full((T, T), NEG_INF, jnp.float32), k=1)
    if attention_mask is not None:
        bias = bias[None, None] + (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
    else:
        bias = bias[None, None]

    def body(h, bp):
        h, _ = _block(h, bp, cfg, bias)
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["lnf_w"], params["lnf_b"], eps=cfg.ln_eps)
    return jnp.dot(x, params["wte"].T, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# KV-cache decoding
# ---------------------------------------------------------------------------


def _prefill(params, cfg: GPT2Config, embeds, max_len: int):
    """Run the prompt embeddings, returning (last-position logits, cache).

    cache: dict(k, v [L, B, H, max_len, hd], index scalar).
    """
    B, P, D = embeds.shape
    H, hd = cfg.n_head, cfg.n_embd // cfg.n_head
    x = embeds.astype(params["wte"].dtype) + params["wpe"][:P]
    bias = jnp.triu(jnp.full((P, max_len), NEG_INF, jnp.float32), k=1)[None, None]

    def body(h, bp):
        ck = jnp.zeros((B, H, max_len, hd), h.dtype)
        cv = jnp.zeros((B, H, max_len, hd), h.dtype)
        h, kv = _block(h, bp, cfg, bias, (ck, cv), 0)
        return h, kv

    x, (ks, vs) = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x[:, -1:], params["lnf_w"], params["lnf_b"], eps=cfg.ln_eps)
    logits = jnp.dot(x[:, 0], params["wte"].T, preferred_element_type=jnp.float32)
    return logits, {"k": ks, "v": vs, "index": jnp.asarray(P, jnp.int32)}


def _decode_step(params, cfg: GPT2Config, cache, token_embeds):
    """One decode step from [B, 1, D] new-position embeddings."""
    B = token_embeds.shape[0]
    idx = cache["index"]
    max_len = cache["k"].shape[3]
    x = token_embeds.astype(params["wte"].dtype) + jax.lax.dynamic_slice_in_dim(params["wpe"], idx, 1)
    valid = jnp.arange(max_len) <= idx  # attend to cache[0..idx]
    bias = jnp.where(valid, 0.0, NEG_INF)[None, None, None, :]

    def body(h, layer):
        bp, ck, cv = layer
        h, kv = _block(h, bp, cfg, bias, (ck, cv), idx)
        return h, kv

    x, (ks, vs) = jax.lax.scan(body, x, (params["blocks"], cache["k"], cache["v"]))
    x = layer_norm(x, params["lnf_w"], params["lnf_b"], eps=cfg.ln_eps)
    logits = jnp.dot(x[:, 0], params["wte"].T, preferred_element_type=jnp.float32)
    return logits, {"k": ks, "v": vs, "index": idx + 1}


# ---------------------------------------------------------------------------
# ClipCap generation loops (`caption/image_llm/generate.py`)
# ---------------------------------------------------------------------------


def clipcap_beam_generate(
    params,
    cfg: GPT2Config,
    prefix_embeds,
    stop_token: int,
    beam_size: int = 5,
    entry_length: int = 67,
    temperature: float = 1.0,
):
    """Length-normalized beam search over inputs_embeds, exactly reproducing
    ``generate_beam`` (`generate.py:9-84`): beams are re-ranked every step by
    score/length, stopped beams freeze their score via a 0-logprob pad token,
    and outputs are sorted by final average score.

    prefix_embeds: [P, D] (single image). Returns (tokens [beam, entry_length],
    lengths [beam], order [beam]) — decode row ``order[0][:lengths[order[0]]]``
    on the host for the best caption.
    """
    P = prefix_embeds.shape[0]
    max_len = P + entry_length
    temp = temperature if temperature > 0 else 1.0

    logits0, cache = _prefill(params, cfg, prefix_embeds[None], max_len)
    logp0 = jax.nn.log_softmax(logits0[0] / temp)
    scores, first = jax.lax.top_k(logp0, beam_size)  # [beam]
    # expand the cache to beam_size rows
    cache = {
        "k": jnp.repeat(cache["k"], beam_size, axis=1),
        "v": jnp.repeat(cache["v"], beam_size, axis=1),
        "index": cache["index"],
    }
    tokens = jnp.zeros((beam_size, entry_length), jnp.int32).at[:, 0].set(first)
    seq_lengths = jnp.ones((beam_size,), jnp.float32)
    is_stopped = first == stop_token

    def step(carry, i):
        tokens, scores, seq_lengths, is_stopped, cache = carry
        prev = tokens[jnp.arange(beam_size), i - 1]
        logits, cache = _decode_step(params, cfg, cache, params["wte"][prev][:, None, :])
        logp = jax.nn.log_softmax(logits / temp, axis=-1)  # [beam, V]
        # stopped rows contribute only a frozen score through column 0
        logp = jnp.where(is_stopped[:, None], NEG_INF, logp)
        logp = logp.at[:, 0].set(jnp.where(is_stopped, 0.0, logp[:, 0]))
        scores_sum = scores[:, None] + logp
        seq_lengths = seq_lengths + (~is_stopped).astype(jnp.float32)
        avg = scores_sum / seq_lengths[:, None]
        top_avg, flat_idx = jax.lax.top_k(avg.reshape(-1), beam_size)
        src = flat_idx // logp.shape[-1]
        nxt = flat_idx % logp.shape[-1]
        seq_lengths = seq_lengths[src]
        tokens = tokens[src].at[:, i].set(nxt)
        scores = top_avg * seq_lengths
        is_stopped = is_stopped[src] | (nxt == stop_token)
        cache = {"k": cache["k"][:, src], "v": cache["v"][:, src], "index": cache["index"]}
        return (tokens, scores, seq_lengths, is_stopped, cache), None

    def step_w(carry):
        i, inner = carry
        inner, _ = step(inner, i)
        return (i + 1, inner)

    def cond_w(carry):  # early exit once every beam has stopped
        i, inner = carry
        return (i < entry_length) & ~jnp.all(inner[3])

    _, (tokens, scores, seq_lengths, is_stopped, _) = jax.lax.while_loop(
        cond_w, step_w, (jnp.int32(1), (tokens, scores, seq_lengths, is_stopped, cache))
    )
    final = scores / seq_lengths
    order = jnp.argsort(-final)
    return tokens, seq_lengths.astype(jnp.int32), order


def clipcap_top_p_generate(
    params,
    cfg: GPT2Config,
    prefix_embeds,
    stop_token: int,
    entry_length: int = 67,
    top_p: float = 0.8,
    temperature: float = 1.0,
    alt_stop_token: int = 764,
):
    """Greedy decoding over nucleus-filtered logits, reproducing ``generate2``
    (`generate.py:87-145`): sort logits, drop the tail beyond cumulative
    ``top_p`` (always keeping the argmax), then take the argmax. Stops at
    ``stop_token`` or token 764 ('.').

    prefix_embeds: [P, D]. Returns (tokens [entry_length], length scalar).
    """
    P = prefix_embeds.shape[0]
    max_len = P + entry_length
    temp = temperature if temperature > 0 else 1.0
    logits0, cache = _prefill(params, cfg, prefix_embeds[None], max_len)

    def pick(logits):
        # The reference nucleus-filters then takes argmax (`generate.py:128`);
        # the filter never removes the top-probability token (the shifted
        # cumulative mask always keeps index 0), so the net behavior is plain
        # argmax of the temperature-scaled logits.
        return jnp.argmax(logits / temp).astype(jnp.int32)

    first = pick(logits0[0])
    tokens = jnp.zeros((entry_length,), jnp.int32).at[0].set(first)
    stopped0 = (first == stop_token) | (first == alt_stop_token)

    def step(carry, i):
        tokens, stopped, cache = carry
        # a step that emits the stop token still writes it: the reference
        # appends the stop token before breaking (`generate.py:135-139`), so
        # "wrote" is the PRE-update stopped flag, not the post-update one
        wrote = ~stopped
        prev = tokens[i - 1]
        logits, cache = _decode_step(params, cfg, cache, params["wte"][prev][None, None, :])
        nxt = pick(logits[0])
        tokens = tokens.at[i].set(jnp.where(stopped, 0, nxt))
        stopped = stopped | (nxt == stop_token) | (nxt == alt_stop_token)
        return (tokens, stopped, cache), wrote

    def step_w(carry):
        i, inner, n_wrote = carry
        inner, wrote = step(inner, i)
        return (i + 1, inner, n_wrote + wrote.astype(jnp.int32))

    def cond_w(carry):  # early exit at the stop token
        i, inner, _ = carry
        return (i < entry_length) & ~inner[1]

    _, (tokens, _, _), n_wrote = jax.lax.while_loop(
        cond_w, step_w, (jnp.int32(1), (tokens, stopped0, cache), jnp.int32(0))
    )
    length = 1 + n_wrote
    return tokens, length


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------


def convert_gpt2_state_dict(sd: dict, n_head: Optional[int] = None):
    """HF ``GPT2LMHeadModel`` state dict -> param pytree + config.

    HF Conv1D weights are already stored input-major [in, out]; no transpose.
    Head count is not recorded in the state dict — inferred from the embedding
    width for the released sizes; pass ``n_head`` for custom configs.
    """
    get = lambda k: np.asarray(sd[k], np.float32)
    pref = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    layer_ids = sorted(
        {int(m.group(1)) for k in sd if (m := re.search(r"\bh\.(\d+)\.", k))}
    )
    L = len(layer_ids)

    def stack(fmt):
        return jnp.asarray(np.stack([get(f"{pref}h.{i}.{fmt}") for i in range(L)]))

    blocks = {
        "ln1_w": stack("ln_1.weight"),
        "ln1_b": stack("ln_1.bias"),
        "attn_w": stack("attn.c_attn.weight"),
        "attn_b": stack("attn.c_attn.bias"),
        "attn_proj_w": stack("attn.c_proj.weight"),
        "attn_proj_b": stack("attn.c_proj.bias"),
        "ln2_w": stack("ln_2.weight"),
        "ln2_b": stack("ln_2.bias"),
        "fc_w": stack("mlp.c_fc.weight"),
        "fc_b": stack("mlp.c_fc.bias"),
        "proj_w": stack("mlp.c_proj.weight"),
        "proj_b": stack("mlp.c_proj.bias"),
    }
    wte = jnp.asarray(get(f"{pref}wte.weight"))
    params = {
        "wte": wte,
        "wpe": jnp.asarray(get(f"{pref}wpe.weight")),
        "blocks": blocks,
        "lnf_w": jnp.asarray(get(f"{pref}ln_f.weight")),
        "lnf_b": jnp.asarray(get(f"{pref}ln_f.bias")),
    }
    D = wte.shape[1]
    heads = n_head or {768: 12, 1024: 16, 1280: 20, 1600: 25}.get(D, max(1, D // 64))
    cfg = GPT2Config(
        name=f"gpt2-converted-{D}",
        vocab_size=wte.shape[0],
        n_positions=params["wpe"].shape[0],
        n_embd=D,
        n_layer=L,
        n_head=heads,
    )
    return params, cfg
