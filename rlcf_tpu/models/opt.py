"""OPT causal decoder with prefix (query_embeds) conditioning, in pure JAX.

Functional rebuild of the reference's HF-OPT fork
(`caption/image_llm/models/modeling_opt.py`): ``query_embeds`` are
concatenated before the token embeddings (`modeling_opt.py:702-704`) and
positions are derived from the attention-mask cumsum with OPT's +2 offset, so
a learned prefix conditions generation. Generation follows
`caption/image_llm/models/generate_opt.py:6-85`: beam search (or nucleus
sampling) with EOS = the newline token, max 50 new tokens.

TPU-first structure: stacked decoder layers traversed with ``lax.scan``; the
whole beam search is one jitted ``lax.scan`` over a fixed token budget with a
static-shape KV cache and finished-beam masking (no dynamic shapes, no host
syncs per token).

OPT-125m: 12 layers, d=768, 12 heads, ffn 3072, ReLU, pre-LN
(do_layer_norm_before), tied lm head, no embed projection.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ffn: int = 3072
    max_positions: int = 2048
    pos_offset: int = 2  # OPTLearnedPositionalEmbedding offset
    pad_token_id: int = 1
    bos_token_id: int = 2
    eos_newline_id: int = 50118  # '\n' for the OPT tokenizer ("\n" eos, generate_opt.py:53)
    # OPT-350m quirks (HF `word_embed_proj_dim` + `do_layer_norm_before`):
    # embeddings/prefixes live in a smaller projection space bridged by
    # project_in/project_out, blocks are POST-LN, and there is no final LN.
    word_embed_proj_dim: Optional[int] = None  # None -> == hidden (no projection)
    do_layer_norm_before: bool = True

    @property
    def embed_dim(self) -> int:
        """Input-embedding dim — what mappers/prefix_embeds must produce
        (`LLMModel.embedding_size`, `modules.py:205-207`)."""
        return self.word_embed_proj_dim or self.hidden


OPT_CONFIGS = {
    "opt-125m": OPTConfig(),
    "opt-350m": OPTConfig(hidden=1024, n_layers=24, n_heads=16, ffn=4096,
                          word_embed_proj_dim=512, do_layer_norm_before=False),
    "opt-1.3b": OPTConfig(hidden=2048, n_layers=24, n_heads=32, ffn=8192),
    "opt-2.7b": OPTConfig(hidden=2560, n_layers=32, n_heads=32, ffn=10240),
    "test-tiny-opt": OPTConfig(vocab_size=256, hidden=32, n_layers=2, n_heads=2, ffn=64, max_positions=128, eos_newline_id=3),
    "test-tiny-opt-350m": OPTConfig(vocab_size=256, hidden=32, n_layers=2, n_heads=2, ffn=64,
                                    max_positions=128, eos_newline_id=3,
                                    word_embed_proj_dim=16, do_layer_norm_before=False),
}


def init_opt_params(rng, cfg: OPTConfig, dtype=jnp.float32):
    ks = jax.random.split(rng, 8)
    D, F, L = cfg.hidden, cfg.ffn, cfg.n_layers
    std = 0.02
    shape = lambda *s: (L,) + s
    norm = lambda k, s: (jax.random.normal(k, s) * std).astype(dtype)
    blocks = {
        "ln1_w": jnp.ones(shape(D), dtype),
        "ln1_b": jnp.zeros(shape(D), dtype),
        "q_w": norm(ks[0], shape(D, D)),
        "q_b": jnp.zeros(shape(D), dtype),
        "k_w": norm(jax.random.fold_in(ks[0], 1), shape(D, D)),
        "k_b": jnp.zeros(shape(D), dtype),
        "v_w": norm(jax.random.fold_in(ks[0], 2), shape(D, D)),
        "v_b": jnp.zeros(shape(D), dtype),
        "out_w": norm(ks[1], shape(D, D)),
        "out_b": jnp.zeros(shape(D), dtype),
        "ln2_w": jnp.ones(shape(D), dtype),
        "ln2_b": jnp.zeros(shape(D), dtype),
        "fc1_w": norm(ks[2], shape(D, F)),
        "fc1_b": jnp.zeros(shape(F), dtype),
        "fc2_w": norm(ks[3], shape(F, D)),
        "fc2_b": jnp.zeros(shape(D), dtype),
    }
    E = cfg.embed_dim
    params = {
        "embed_tokens": norm(ks[4], (cfg.vocab_size, E)),
        "embed_positions": norm(ks[5], (cfg.max_positions + cfg.pos_offset, D)),
        "blocks": blocks,
    }
    if cfg.do_layer_norm_before:  # HF: final_layer_norm exists only pre-LN
        params["final_ln_w"] = jnp.ones((D,), dtype)
        params["final_ln_b"] = jnp.zeros((D,), dtype)
    if E != D:
        params["project_in"] = norm(ks[6], (E, D))
        params["project_out"] = norm(ks[7], (D, E))
    return params


def _ln(x, w, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


# ---------------------------------------------------------------------------
# Weight-only int8 (decode weight stream)
# ---------------------------------------------------------------------------


def _w(p, name, dt):
    """Weight fetch with optional int8 weight-only dequant.

    Quantized entries are {"q8": int8, "sc": f32 per-output-channel scales}
    (see ``quantize_opt_params``). The dequant multiply fuses into the
    consuming dot's operand read on TPU, so HBM streams the int8 bytes —
    the point of the scheme: cached decode is weight-stream-bound, and int8
    halves the bytes/token vs bf16."""
    v = p[name]
    if isinstance(v, dict):
        return (v["q8"].astype(jnp.float32) * v["sc"]).astype(dt)
    return v


def _embed_rows(params, tokens, dt):
    """Embedding lookup supporting int8 rows (per-row scales)."""
    v = params["embed_tokens"]
    if isinstance(v, dict):
        return (v["q8"][tokens].astype(jnp.float32) * v["sc"][tokens][..., None]).astype(dt)
    return v[tokens]


def quantize_opt_params(params):
    """Weight-only int8 quantization of the decode weight stream.

    Symmetric per-output-channel scales for the block matrices and
    projections; per-row scales for the tied embedding/LM-head matrix (one
    scale vector serves both the lookup and the ``x @ W.T`` head, where it
    applies per output column). LayerNorms, biases, and positional
    embeddings stay in full precision (<1% of bytes).

    OPT-IN, generation-path only: logits move by the quantization error, so
    sampled/beam tokens may differ from full precision — the CE/update path
    keeps full-precision weights. The reference has no equivalent; this is a
    TPU serving optimization (decode streams all weights each token)."""

    def q(w, axis):
        w32 = np.asarray(w, np.float32)
        sc = np.max(np.abs(w32), axis=axis, keepdims=True) / 127.0
        sc = np.maximum(sc, 1e-12)
        q8 = np.clip(np.rint(w32 / sc), -127, 127).astype(np.int8)
        return {"q8": jnp.asarray(q8), "sc": jnp.asarray(np.squeeze(sc, axis=axis))}

    out = dict(params)
    blocks = dict(params["blocks"])
    for name in ("q_w", "k_w", "v_w", "out_w", "fc1_w", "fc2_w"):
        blocks[name] = q(blocks[name], axis=1)  # [L, in, out] -> sc [L, out]
    out["blocks"] = blocks
    out["embed_tokens"] = q(params["embed_tokens"], axis=1)  # [V, E] -> sc [V]
    for name in ("project_in", "project_out"):
        if name in params:
            out[name] = q(params[name], axis=0)  # [in, out] -> sc [out]
    return out


def _attn(x, p, cfg: OPTConfig, mask_bias, kv=None):
    """Self-attention; OPT scales q before the dot product.

    kv: optional (k_cache, v_cache) [B, H, T_cache, hd] to attend over
    (decode mode: x is the new token(s) only).
    """
    B, T, D = x.shape
    H = cfg.n_heads
    hd = D // H
    q = (x @ _w(p, "q_w", x.dtype) + p["q_b"]) * (hd**-0.5)
    k = x @ _w(p, "k_w", x.dtype) + p["k_b"]
    v = x @ _w(p, "v_w", x.dtype) + p["v_b"]
    split = lambda t: t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    q, k_new, v_new = split(q), split(k), split(v)
    if kv is not None:
        k_all, v_all = kv
    else:
        k_all, v_all = k_new, v_new
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_all, preferred_element_type=jnp.float32)
    logits = logits + mask_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v_all, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    return out @ _w(p, "out_w", x.dtype) + p["out_b"], (k_new, v_new)


def _mlp(x, p):
    return jax.nn.relu(x @ _w(p, "fc1_w", x.dtype) + p["fc1_b"]) @ _w(p, "fc2_w", x.dtype) + p["fc2_b"]


def _layer(x, p, cfg, mask_bias, kv=None):
    """OPTDecoderLayer: pre-LN (125m/1.3b/...) or post-LN (350m)."""
    if cfg.do_layer_norm_before:
        h, kv_new = _attn(_ln(x, p["ln1_w"], p["ln1_b"]), p, cfg, mask_bias, kv)
        x = x + h
        h = _mlp(_ln(x, p["ln2_w"], p["ln2_b"]), p)
        return x + h, kv_new
    h, kv_new = _attn(x, p, cfg, mask_bias, kv)
    x = _ln(x + h, p["ln1_w"], p["ln1_b"])
    return _ln(x + _mlp(x, p), p["ln2_w"], p["ln2_b"]), kv_new


def _embed_in(params, x):
    """Proj-space embeddings -> hidden space (`modeling_opt.py` project_in)."""
    if "project_in" in params:
        return jnp.dot(x, _w(params, "project_in", x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    return x


def _head(params, cfg: OPTConfig, x):
    """Final LN (pre-LN models only) + project_out + tied lm head.

    Keyed on the PARAM's presence, not cfg: pre-LN checkpoints saved with
    HF's ``_remove_final_layer_norm`` quirk have pre-LN blocks but no final
    LN tensor."""
    if "final_ln_w" in params:
        x = _ln(x, params["final_ln_w"], params["final_ln_b"])
    if "project_out" in params:
        x = jnp.dot(x, _w(params, "project_out", x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    emb = params["embed_tokens"]
    if isinstance(emb, dict):
        # per-row scales apply per OUTPUT column of x @ W.T — the int8 bytes
        # stream from HBM, the dequant rides the dot epilogue
        logits = jnp.dot(x, emb["q8"].T.astype(x.dtype), preferred_element_type=jnp.float32)
        return logits * emb["sc"]
    return jnp.dot(x, emb.T, preferred_element_type=jnp.float32)


def _positions_from_mask(mask, offset):
    """OPTLearnedPositionalEmbedding: cumsum(mask)*mask - 1 + offset.

    No clamp before the offset: HF gives PAD positions raw id -1, i.e.
    embedding row ``offset - 1`` (= 1). Clamping -1 to 0 first would read row
    ``offset`` instead and shift every pad position's hidden state — pad CE
    terms count in the reference TTA loss, so this must match exactly.
    """
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=1) * mask.astype(jnp.int32) - 1
    return pos + offset


def forward(params, cfg: OPTConfig, tokens=None, prefix_embeds=None, attention_mask=None):
    """Teacher-forcing forward -> logits [B, P+T, V].

    ``prefix_embeds`` [B, P, D] are concatenated before the token embeddings
    (`modeling_opt.py:702-704`); ``attention_mask`` [B, P+T] marks valid
    positions (1) incl. the prefix.
    """
    embeds = []
    if prefix_embeds is not None:
        embeds.append(prefix_embeds)
    if tokens is not None:
        dt = prefix_embeds.dtype if prefix_embeds is not None else jnp.float32
        embeds.append(_embed_rows(params, tokens, dt))
    x = _embed_in(params, jnp.concatenate(embeds, axis=1))
    B, T, D = x.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, T), jnp.int32)
    pos = _positions_from_mask(attention_mask, cfg.pos_offset)
    x = x + params["embed_positions"][pos]

    causal = jnp.triu(jnp.full((T, T), -1e9, jnp.float32), k=1)
    pad_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)
    mask_bias = causal[None, None] + pad_bias

    def body(h, layer_params):
        h, _ = _layer(h, layer_params, cfg, mask_bias)
        return h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _head(params, cfg, x)


# ---------------------------------------------------------------------------
# Cached generation
# ---------------------------------------------------------------------------


def _prefill(params, cfg: OPTConfig, prefix_embeds):
    """Run the prefix through the decoder, building the prefix KV cache.

    Returns (logits_last [B, V], prefix_cache). Cache arrays are
    [L, B, H, P, hd] and IMMUTABLE afterwards: all beams/samples expanded
    from a prefix share it by reference — the decode step never copies,
    reorders, or pads it (beam reorder permutes beams of one image, and the
    per-image prefix K/V are identical across beams, so permuting them is a
    numeric no-op; skipping it cuts the dominant cache-reorder traffic).
    """
    B, P = prefix_embeds.shape[:2]
    mask = jnp.ones((B, P), jnp.int32)
    pos = _positions_from_mask(mask, cfg.pos_offset)
    x = _embed_in(params, prefix_embeds) + params["embed_positions"][pos]
    causal = jnp.triu(jnp.full((P, P), -1e9, jnp.float32), k=1)[None, None]

    def body(h, layer_params):
        h, kv = _layer(h, layer_params, cfg, causal)
        return h, kv

    x, (k_stack, v_stack) = jax.lax.scan(body, x, params["blocks"])
    logits_last = _head(params, cfg, x[:, -1:])[:, 0]
    return logits_last, (k_stack, v_stack)


def _init_gen_cache(cfg: OPTConfig, n_seqs: int, max_new: int, dtype):
    """Per-sequence cache for generated positions: [L, N, H, max_new, hd]."""
    hd = cfg.hidden // cfg.n_heads
    shape = (cfg.n_layers, n_seqs, cfg.n_heads, max_new, hd)
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _decode_step(params, cfg: OPTConfig, token, prefix_cache, gen_cache, t, expand: int):
    """One cached decode step with a shared prefix cache.

    token: [N] next tokens (N = B * expand sequences); prefix_cache holds
    [L, B, H, P, hd] (one entry per prefix, shared by ``expand`` sequences —
    attention reads it via a batched einsum, never materializing the
    expansion); gen_cache holds [L, N, H, G, hd] generated positions, written
    at slot ``t`` (absolute position P + t). Returns (logits [N, V],
    new gen_cache); the prefix cache is read-only.
    """
    k_pre, v_pre = prefix_cache
    k_gen, v_gen = gen_cache
    L, B, H, P, hd = k_pre.shape
    G = k_gen.shape[3]
    N = token.shape[0]
    E = expand
    D = cfg.hidden
    x = _embed_in(params, _embed_rows(params, token, k_pre.dtype)[:, None, :])  # [N, 1, D]
    x = x + params["embed_positions"][P + t + cfg.pos_offset][None, None, :]
    # generated-position mask: attend to gen slots [0, t] (prefix always valid)
    gen_bias = jnp.where((jnp.arange(G) <= t)[None, None, :], 0.0, -1e9).astype(jnp.float32)

    def body(carry, inp):
        h = carry
        layer_params, k_p, v_p, k_g, v_g = inp
        h_ln = _ln(h, layer_params["ln1_w"], layer_params["ln1_b"]) if cfg.do_layer_norm_before else h
        q = (h_ln @ _w(layer_params, "q_w", h.dtype) + layer_params["q_b"]) * (hd**-0.5)
        k_new = h_ln @ _w(layer_params, "k_w", h.dtype) + layer_params["k_b"]
        v_new = h_ln @ _w(layer_params, "v_w", h.dtype) + layer_params["v_b"]
        q = q.reshape(N, H, hd)
        k_new = k_new.reshape(N, 1, H, hd).transpose(0, 2, 1, 3)
        v_new = v_new.reshape(N, 1, H, hd).transpose(0, 2, 1, 3)
        k_g = jax.lax.dynamic_update_slice(k_g, k_new.astype(k_g.dtype), (0, 0, t, 0))
        v_g = jax.lax.dynamic_update_slice(v_g, v_new.astype(v_g.dtype), (0, 0, t, 0))
        # prefix attention: beams of one image share k_p/v_p — batched einsum
        # over the [B, E] split reads the prefix once per image, not per beam
        qe = q.reshape(B, E, H, hd)
        lg_pre = jnp.einsum("behd,bhpd->behp", qe, k_p, preferred_element_type=jnp.float32)
        lg_gen = jnp.einsum("nhd,nhgd->nhg", q, k_g, preferred_element_type=jnp.float32)
        lg = jnp.concatenate([lg_pre.reshape(N, H, P), lg_gen + gen_bias], axis=-1)
        probs = jax.nn.softmax(lg, axis=-1).astype(h.dtype)
        out_pre = jnp.einsum("behp,bhpd->behd", probs[:, :, :P].reshape(B, E, H, P), v_p,
                             preferred_element_type=jnp.float32)
        out_gen = jnp.einsum("nhg,nhgd->nhd", probs[:, :, P:], v_g,
                             preferred_element_type=jnp.float32)
        out = (out_pre.reshape(N, H, hd) + out_gen).astype(h.dtype).reshape(N, 1, D)
        out = out @ _w(layer_params, "out_w", h.dtype) + layer_params["out_b"]
        if cfg.do_layer_norm_before:
            h = h + out
            h2 = _mlp(_ln(h, layer_params["ln2_w"], layer_params["ln2_b"]), layer_params)
            return h + h2, (k_g, v_g)
        h = _ln(h + out, layer_params["ln1_w"], layer_params["ln1_b"])
        return _ln(h + _mlp(h, layer_params), layer_params["ln2_w"], layer_params["ln2_b"]), (k_g, v_g)

    x, (k_gen, v_gen) = jax.lax.scan(body, x, (params["blocks"], k_pre, v_pre, k_gen, v_gen))
    logits = _head(params, cfg, x)[:, 0]
    return logits, (k_gen, v_gen)


def beam_generate(
    params,
    cfg: OPTConfig,
    prefix_embeds,
    num_beams: int = 5,
    max_new_tokens: int = 50,
    min_length: int = 1,
    eos_id: Optional[int] = None,
    length_penalty: float = 1.0,
    num_return: Optional[int] = None,
    seg_len: Optional[int] = None,
):
    """Beam search conditioned on ``prefix_embeds`` [B, P, D].

    ``seg_len`` (when set) must be positive — validated up front because a
    negative value would otherwise size the generated-position cache at -1
    and loop forever building segment bounds.

    Returns (sequences [B, num_return, max_new_tokens] int32 padded with pad
    token after EOS, scores [B, num_return]). EOS defaults to the newline
    token (`generate_opt.py:53`); hypotheses are ranked by
    score / length^length_penalty like HF beam search.

    ``seg_len``: optional gen-cache segment bucketing — decode runs in
    ``seg_len``-token segments whose per-beam cache holds only the slots
    written so far (padded up segment by segment), so the beam reorder
    gather and the generated-position attention read scale with the ELAPSED
    tokens instead of ``max_new_tokens``. Outputs identical; compiles one
    decode body per segment size. None = single full-size cache.
    """
    if seg_len is not None and seg_len < 0:
        raise ValueError(f"seg_len must be positive (or None/0 = off), got {seg_len}")
    seg_len = seg_len or None  # 0 means off, like None
    eos = cfg.eos_newline_id if eos_id is None else eos_id
    num_return = num_return or num_beams
    B, P, D = prefix_embeds.shape
    NEG = -1e9

    # Prefill runs on the B prefixes ONCE; all K beams of an image share the
    # resulting prefix K/V by reference (see _prefill). Only the generated
    # positions get a per-beam cache — the only state beam reorder touches.
    K = num_beams
    logits0, prefix_cache = _prefill(params, cfg, prefix_embeds)  # [B, V]
    first_size = min(seg_len, max_new_tokens) if seg_len else max_new_tokens
    gen_cache = _init_gen_cache(cfg, B * K, first_size, prefix_cache[0].dtype)

    # beam state
    seqs = jnp.full((B, K, max_new_tokens), cfg.pad_token_id, jnp.int32)
    beam_scores = jnp.full((B, K), NEG, jnp.float32).at[:, 0].set(0.0)  # only beam 0 live initially
    finished = jnp.zeros((B, K), bool)

    def step(carry):
        step_idx, seqs, beam_scores, finished, gen_cache, logits = carry
        logp = jax.nn.log_softmax(logits.reshape(B, K, -1), axis=-1)  # [B, K, V]
        V = logp.shape[-1]
        # min-length: no EOS before min_length
        logp = jnp.where((step_idx < min_length) & (jnp.arange(V)[None, None] == eos), NEG, logp)
        # finished beams only extend with pad at no cost
        pad_only = jnp.full((V,), NEG).at[cfg.pad_token_id].set(0.0)
        cand = jnp.where(finished[..., None], beam_scores[..., None] + pad_only, beam_scores[..., None] + logp)
        flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)  # [B, K]
        src_beam = top_idx // V
        token = top_idx % V
        # reorder state
        seqs = jnp.take_along_axis(seqs, src_beam[..., None], axis=1)
        was_finished = jnp.take_along_axis(finished, src_beam, axis=1)
        seqs = seqs.at[:, :, step_idx].set(jnp.where(was_finished, cfg.pad_token_id, token))
        now_finished = was_finished | (token == eos)
        # gen-cache reorder: [L, B*K, H, G, hd] — gather beams within each
        # image; the shared prefix cache never moves
        def reorder(c):
            cL = c.reshape(c.shape[0], B, K, *c.shape[2:])
            cL = jnp.take_along_axis(cL, src_beam[None, :, :, None, None, None], axis=2)
            return cL.reshape(c.shape)

        gen_cache = (reorder(gen_cache[0]), reorder(gen_cache[1]))
        # next logits
        tok_flat = jnp.where(was_finished, cfg.pad_token_id, token).reshape(B * K)
        logits, gen_cache = _decode_step(params, cfg, tok_flat, prefix_cache, gen_cache, step_idx, K)
        return (step_idx + 1, seqs, top_scores, now_finished, gen_cache, logits)

    # while_loop with early exit: once every beam of every batch item has
    # emitted EOS, further steps only append pad at no score cost — identical
    # results, and captions finish at ~10-20 of the 50-token budget (each
    # decode step streams all OPT weights, so steps are the cost unit)
    def make_cond(bound):
        def cond(carry):
            step_idx, _, _, finished, _, _ = carry
            return (step_idx < bound) & ~jnp.all(finished)

        return cond

    init_logits = jnp.repeat(logits0, K, axis=0)  # [B*K, V]
    carry = (jnp.int32(0), seqs, beam_scores, finished, gen_cache, init_logits)
    if seg_len:
        bounds, b = [], 0
        while b < max_new_tokens:
            b = min(b + seg_len, max_new_tokens)
            bounds.append(b)
        for i, bound in enumerate(bounds):
            if i:  # grow the gen cache to the next segment's slot count
                step_idx, seqs_c, bs, fin, (k_g, v_g), lg = carry
                pad = [(0, 0), (0, 0), (0, 0), (0, bound - k_g.shape[3]), (0, 0)]
                carry = (step_idx, seqs_c, bs, fin, (jnp.pad(k_g, pad), jnp.pad(v_g, pad)), lg)
            carry = jax.lax.while_loop(make_cond(bound), step, carry)
        (_, seqs, beam_scores, finished, _, _) = carry
    else:
        (_, seqs, beam_scores, finished, _, _) = jax.lax.while_loop(
            make_cond(max_new_tokens), step, carry
        )

    # rank by normalized score
    lengths = jnp.sum(seqs != cfg.pad_token_id, axis=-1).clip(1)
    norm_scores = beam_scores / (lengths.astype(jnp.float32) ** length_penalty)
    order = jnp.argsort(-norm_scores, axis=1)[:, :num_return]
    seqs = jnp.take_along_axis(seqs, order[..., None], axis=1)
    out_scores = jnp.take_along_axis(norm_scores, order, axis=1)
    return seqs, out_scores


def nucleus_generate(
    params,
    cfg: OPTConfig,
    prefix_embeds,
    rng,
    num_captions: int = 5,
    max_new_tokens: int = 50,
    min_length: int = 1,
    top_p: float = 0.92,
    temperature: float = 1.0,
    eos_id: Optional[int] = None,
):
    """Nucleus sampling: num_captions independent samples per prefix."""
    eos = cfg.eos_newline_id if eos_id is None else eos_id
    B, P, D = prefix_embeds.shape
    K = num_captions
    # samples of one prefix share its K/V by reference — prefill B, decode B*K
    logits0, prefix_cache = _prefill(params, cfg, prefix_embeds)
    gen_cache = _init_gen_cache(cfg, B * K, max_new_tokens, prefix_cache[0].dtype)
    N = B * K
    seqs = jnp.full((N, max_new_tokens), cfg.pad_token_id, jnp.int32)
    finished = jnp.zeros((N,), bool)

    def sample_top_p(key, logits):
        logits = logits / temperature
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(sorted_probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)  # keep tokens until cum >= p
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        masked = jnp.where(logits < cutoff, -1e9, logits)
        return jax.random.categorical(key, masked, axis=-1)

    keys = jax.random.split(rng, max_new_tokens)

    def step(carry):
        step_idx, seqs, finished, gen_cache, logits = carry
        V = logits.shape[-1]
        logits = jnp.where((step_idx < min_length) & (jnp.arange(V)[None] == eos), -1e9, logits)
        token = sample_top_p(keys[step_idx], logits)
        token = jnp.where(finished, cfg.pad_token_id, token)
        seqs = seqs.at[:, step_idx].set(token)
        finished = finished | (token == eos)
        logits, gen_cache = _decode_step(params, cfg, token, prefix_cache, gen_cache, step_idx, K)
        return (step_idx + 1, seqs, finished, gen_cache, logits)

    def cond(carry):  # early exit: all samples hit EOS (identical output)
        step_idx, _, finished, _, _ = carry
        return (step_idx < max_new_tokens) & ~jnp.all(finished)

    (_, seqs, _, _, _) = jax.lax.while_loop(
        cond, step, (jnp.int32(0), seqs, finished, gen_cache, jnp.repeat(logits0, K, axis=0))
    )
    return seqs.reshape(B, K, max_new_tokens)


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------


# released OPT sizes: hidden -> attention heads (head_dim is NOT constant
# across the family: 64 up to 2.7b, 128 from 6.7b — never derive heads from
# hidden//64)
_OPT_N_HEADS = {768: 12, 1024: 16, 2048: 32, 2560: 32, 4096: 32, 5120: 40, 7168: 56, 9216: 72}


def convert_opt_state_dict(sd: Dict, dtype=np.float32, n_heads: Optional[int] = None) -> Tuple[dict, OPTConfig]:
    """HF OPT state dict -> (params, config). Accepts 'model.decoder.*' keys.

    ``n_heads``: head count override — HF state dicts don't record it; known
    released sizes are inferred, anything else must be passed explicitly.
    """

    def np_(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x, dtype=dtype)

    import re

    pre = "model.decoder." if any(k.startswith("model.decoder.") for k in sd) else "decoder."
    get = lambda k: np_(sd[pre + k])
    n_layers = len({m.group(1) for k in sd for m in [re.search(r"\.layers\.(\d+)\.", k)] if m})
    embed_dim = get("embed_tokens.weight").shape[1]
    # OPT-350m: embed_tokens live in word_embed_proj_dim and project_in maps
    # to the transformer width; its presence also implies post-LN blocks and
    # no decoder-level final_layer_norm (HF OPTConfig semantics).
    has_proj = (pre + "project_in.weight") in sd
    hidden = get("project_in.weight").shape[0] if has_proj else embed_dim
    has_final_ln = (pre + "final_layer_norm.weight") in sd
    vocab = get("embed_tokens.weight").shape[0]
    ffn = get("layers.0.fc1.weight").shape[0]
    max_pos = get("embed_positions.weight").shape[0] - 2
    if n_heads is None:
        n_heads = _OPT_N_HEADS.get(hidden)
        if n_heads is None:
            raise ValueError(
                f"cannot infer attention heads for hidden={hidden} (not a released "
                "OPT size); pass n_heads= explicitly to convert_opt_state_dict"
            )
    # Block layout: post-LN exists only in OPT-350m (the one size with an
    # embed projection). A missing decoder final_layer_norm WITHOUT a
    # projection is HF's _remove_final_layer_norm quirk — pre-LN blocks, just
    # no final LN (handled by _head keying on the param's presence).
    cfg = OPTConfig(vocab_size=vocab, hidden=hidden, n_layers=n_layers, ffn=ffn, max_positions=max_pos,
                    n_heads=n_heads,
                    word_embed_proj_dim=embed_dim if has_proj else None,
                    do_layer_norm_before=has_final_ln or not has_proj)

    T = np.transpose
    lay = lambda i, name: np_(sd[f"{pre}layers.{i}.{name}"])
    stack = lambda name, tr=lambda x: x: jnp.asarray(np.stack([tr(lay(i, name)) for i in range(n_layers)]))
    blocks = {
        "ln1_w": stack("self_attn_layer_norm.weight"),
        "ln1_b": stack("self_attn_layer_norm.bias"),
        "q_w": stack("self_attn.q_proj.weight", T),
        "q_b": stack("self_attn.q_proj.bias"),
        "k_w": stack("self_attn.k_proj.weight", T),
        "k_b": stack("self_attn.k_proj.bias"),
        "v_w": stack("self_attn.v_proj.weight", T),
        "v_b": stack("self_attn.v_proj.bias"),
        "out_w": stack("self_attn.out_proj.weight", T),
        "out_b": stack("self_attn.out_proj.bias"),
        "ln2_w": stack("final_layer_norm.weight"),
        "ln2_b": stack("final_layer_norm.bias"),
        "fc1_w": stack("fc1.weight", T),
        "fc1_b": stack("fc1.bias"),
        "fc2_w": stack("fc2.weight", T),
        "fc2_b": stack("fc2.bias"),
    }
    params = {
        "embed_tokens": jnp.asarray(get("embed_tokens.weight")),
        "embed_positions": jnp.asarray(get("embed_positions.weight")),
        "blocks": blocks,
    }
    if has_final_ln:
        params["final_ln_w"] = jnp.asarray(get("final_layer_norm.weight"))
        params["final_ln_b"] = jnp.asarray(get("final_layer_norm.bias"))
    if has_proj:
        params["project_in"] = jnp.asarray(T(get("project_in.weight")))
        params["project_out"] = jnp.asarray(T(get("project_out.weight")))
    return params, cfg
