"""OPT decoder: forward parity vs HF transformers, cached generation sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rlcf_tpu.models import opt as O

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture(scope="module")
def hf_tiny():
    from transformers import OPTConfig as HFConfig, OPTForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=256,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        ffn_dim=64,
        max_position_embeddings=128,
        do_layer_norm_before=True,
        word_embed_proj_dim=32,
        pad_token_id=1,
        bos_token_id=2,
        eos_token_id=3,
        activation_function="relu",
        dropout=0.0,
    )
    model = OPTForCausalLM(hf_cfg).eval()
    sd = model.state_dict()
    params, cfg = O.convert_opt_state_dict(sd, n_heads=2)
    cfg = O.OPTConfig(**{**cfg.__dict__, "eos_newline_id": 3})
    return model, params, cfg


def test_forward_parity_tokens(hf_tiny):
    model, params, cfg = hf_tiny
    tokens = np.array([[2, 5, 9, 100, 42], [2, 7, 7, 30, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(tokens)).logits.numpy()
    mine = np.asarray(O.forward(params, cfg, tokens=tokens.astype(np.int32)))
    np.testing.assert_allclose(mine, ref, rtol=2e-4, atol=2e-4)


def test_forward_parity_with_prefix(hf_tiny):
    """query_embeds path == HF with concatenated inputs_embeds."""
    model, params, cfg = hf_tiny
    rng = np.random.default_rng(0)
    prefix = rng.normal(size=(2, 3, 32)).astype(np.float32) * 0.1
    tokens = np.array([[2, 5, 9], [2, 7, 7]], dtype=np.int64)
    with torch.no_grad():
        tok_embeds = model.get_input_embeddings()(torch.from_numpy(tokens))
        embeds = torch.cat([torch.from_numpy(prefix), tok_embeds], dim=1)
        ref = model(inputs_embeds=embeds).logits.numpy()
    mine = np.asarray(O.forward(params, cfg, tokens=tokens.astype(np.int32), prefix_embeds=jnp.asarray(prefix)))
    np.testing.assert_allclose(mine, ref, rtol=2e-4, atol=2e-4)


def test_cached_decode_matches_full_forward(hf_tiny):
    """Prefill + N cached decode steps == teacher-forcing logits."""
    _, params, cfg = hf_tiny
    rng = np.random.default_rng(1)
    prefix = jnp.asarray(rng.normal(size=(2, 4, 32)).astype(np.float32) * 0.1)
    tokens = np.array([[5, 9, 100], [7, 30, 11]], dtype=np.int32)

    full = np.asarray(O.forward(params, cfg, tokens=tokens, prefix_embeds=prefix))  # [2, 7, V]

    logits, prefix_cache = O._prefill(params, cfg, prefix)
    np.testing.assert_allclose(np.asarray(logits), full[:, 3], rtol=1e-4, atol=1e-4)
    gen_cache = O._init_gen_cache(cfg, 2, 3, prefix_cache[0].dtype)
    for i in range(3):
        logits, gen_cache = O._decode_step(
            params, cfg, jnp.asarray(tokens[:, i]), prefix_cache, gen_cache, i, expand=1
        )
        np.testing.assert_allclose(np.asarray(logits), full[:, 4 + i], rtol=1e-4, atol=1e-4)


def test_beam_generate_shapes_and_determinism(hf_tiny):
    _, params, cfg = hf_tiny
    rng = np.random.default_rng(2)
    prefix = jnp.asarray(rng.normal(size=(2, 4, 32)).astype(np.float32) * 0.1)
    gen = jax.jit(
        lambda p, pe: O.beam_generate(p, cfg, pe, num_beams=3, max_new_tokens=8, num_return=3)
    )
    seqs, scores = gen(params, prefix)
    assert seqs.shape == (2, 3, 8)
    assert scores.shape == (2, 3)
    seqs2, _ = gen(params, prefix)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs2))
    # best beam first
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_greedy_matches_hf_generate(hf_tiny):
    """num_beams=1 == HF greedy generate over the same prefix embeddings."""
    model, params, cfg = hf_tiny
    rng = np.random.default_rng(3)
    prefix_np = rng.normal(size=(1, 4, 32)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = model.generate(
            inputs_embeds=torch.from_numpy(prefix_np), max_new_tokens=6,
            do_sample=False, num_beams=1, min_length=0, eos_token_id=999,
        ).numpy()
    seqs, _ = O.beam_generate(params, cfg, jnp.asarray(prefix_np), num_beams=1, max_new_tokens=6, min_length=0, eos_id=999)
    np.testing.assert_array_equal(np.asarray(seqs)[0, 0], ref[0])


def test_beam_matches_hf_beam_search(hf_tiny):
    """3-beam search returns HF's exact sequences in the same rank order."""
    model, params, cfg = hf_tiny
    rng = np.random.default_rng(3)
    prefix_np = rng.normal(size=(1, 4, 32)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = model.generate(
            inputs_embeds=torch.from_numpy(prefix_np), max_new_tokens=4,
            do_sample=False, num_beams=3, num_return_sequences=3, min_length=0,
            eos_token_id=999, early_stopping=False, length_penalty=1.0,
        ).numpy()
    seqs, _ = O.beam_generate(params, cfg, jnp.asarray(prefix_np), num_beams=3, max_new_tokens=4, min_length=0, eos_id=999)
    np.testing.assert_array_equal(np.asarray(seqs)[0], ref)


def test_eos_terminates_and_pads(hf_tiny):
    """Force EOS as the most likely token -> sequences stop and pad."""
    _, params, cfg = hf_tiny
    # bias the final-ln projection so eos wins: put a large embedding for eos
    boosted = dict(params)
    boosted["embed_tokens"] = params["embed_tokens"].at[3].mul(50.0)
    rng = np.random.default_rng(4)
    prefix = jnp.asarray(rng.normal(size=(1, 2, 32)).astype(np.float32) * 0.1)
    seqs, _ = O.beam_generate(boosted, cfg, prefix, num_beams=2, max_new_tokens=6, min_length=0)
    row = np.asarray(seqs)[0, 0]
    if 3 in row.tolist():
        k = row.tolist().index(3)
        assert (row[k + 1 :] == cfg.pad_token_id).all()


def test_nucleus_generate_shapes(hf_tiny):
    _, params, cfg = hf_tiny
    rng = np.random.default_rng(5)
    prefix = jnp.asarray(rng.normal(size=(2, 3, 32)).astype(np.float32) * 0.1)
    seqs = O.nucleus_generate(params, cfg, prefix, jax.random.PRNGKey(0), num_captions=4, max_new_tokens=6)
    assert seqs.shape == (2, 4, 6)
    # different rng -> different samples
    seqs2 = O.nucleus_generate(params, cfg, prefix, jax.random.PRNGKey(1), num_captions=4, max_new_tokens=6)
    assert (np.asarray(seqs) != np.asarray(seqs2)).any()


@pytest.fixture(scope="module")
def hf_tiny_350m():
    """OPT-350m-style quirks: word_embed_proj_dim != hidden, post-LN, no final LN."""
    from transformers import OPTConfig as HFConfig, OPTForCausalLM

    torch.manual_seed(1)
    hf_cfg = HFConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        ffn_dim=64, max_position_embeddings=128, do_layer_norm_before=False,
        word_embed_proj_dim=16, pad_token_id=1, bos_token_id=2, eos_token_id=3,
        activation_function="relu", dropout=0.0,
    )
    model = OPTForCausalLM(hf_cfg).eval()
    params, cfg = O.convert_opt_state_dict(model.state_dict(), n_heads=2)
    cfg = O.OPTConfig(**{**cfg.__dict__, "eos_newline_id": 3})
    assert cfg.word_embed_proj_dim == 16 and not cfg.do_layer_norm_before
    # the user-facing --llm config for this shape stays in sync with the fixture
    tiny = O.OPT_CONFIGS["test-tiny-opt-350m"]
    assert (tiny.hidden, tiny.word_embed_proj_dim, tiny.do_layer_norm_before) == (
        cfg.hidden, cfg.word_embed_proj_dim, cfg.do_layer_norm_before)
    return model, params, cfg


def test_350m_forward_parity_tokens(hf_tiny_350m):
    model, params, cfg = hf_tiny_350m
    tokens = np.array([[2, 5, 9, 100, 42], [2, 7, 7, 30, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(tokens)).logits.numpy()
    mine = np.asarray(O.forward(params, cfg, tokens=tokens.astype(np.int32)))
    np.testing.assert_allclose(mine, ref, rtol=2e-4, atol=2e-4)


def test_350m_forward_parity_with_prefix_and_mask(hf_tiny_350m):
    """Prefix embeds live in the PROJECTION space (16-d) like HF inputs_embeds."""
    model, params, cfg = hf_tiny_350m
    rng = np.random.default_rng(0)
    prefix = rng.normal(size=(2, 3, 16)).astype(np.float32) * 0.1
    tokens = np.array([[2, 5, 9, 1], [2, 7, 7, 7]], dtype=np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 1, 0], [1, 1, 1, 1, 1, 1, 1]], dtype=np.int64)
    with torch.no_grad():
        tok_embeds = model.get_input_embeddings()(torch.from_numpy(tokens))
        embeds = torch.cat([torch.from_numpy(prefix), tok_embeds], dim=1)
        ref = model(inputs_embeds=embeds, attention_mask=torch.from_numpy(mask)).logits.numpy()
    mine = np.asarray(O.forward(params, cfg, tokens=tokens.astype(np.int32),
                                prefix_embeds=jnp.asarray(prefix),
                                attention_mask=jnp.asarray(mask.astype(np.int32))))
    np.testing.assert_allclose(mine, ref, rtol=3e-4, atol=3e-4)


def test_350m_beam_matches_hf(hf_tiny_350m):
    model, params, cfg = hf_tiny_350m
    rng = np.random.default_rng(3)
    prefix_np = rng.normal(size=(1, 4, 16)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = model.generate(
            inputs_embeds=torch.from_numpy(prefix_np), max_new_tokens=4,
            do_sample=False, num_beams=3, num_return_sequences=3, min_length=0,
            eos_token_id=999, early_stopping=False, length_penalty=1.0,
        ).numpy()
    seqs, _ = O.beam_generate(params, cfg, jnp.asarray(prefix_np), num_beams=3, max_new_tokens=4, min_length=0, eos_id=999)
    np.testing.assert_array_equal(np.asarray(seqs)[0], ref)


# ---------------------------------------------------------------------------
# Weight-only int8 decode (opt-in serving optimization; no reference
# equivalent — the generation path may legally diverge within quant error)
# ---------------------------------------------------------------------------


def test_int8_quantized_forward_close_and_storage_int8(hf_tiny):
    _, params, cfg = hf_tiny
    qparams = O.quantize_opt_params(params)
    assert qparams["embed_tokens"]["q8"].dtype == jnp.int8
    assert qparams["blocks"]["fc1_w"]["q8"].dtype == jnp.int8
    # quantized bytes ~halve the big-matrix stream (int8 vs f32 here)
    rng = np.random.default_rng(4)
    prefix = jnp.asarray(rng.normal(size=(2, 4, 32)).astype(np.float32) * 0.1)
    tokens = np.array([[5, 9, 100], [7, 30, 11]], dtype=np.int32)
    full = np.asarray(O.forward(params, cfg, tokens=tokens, prefix_embeds=prefix))
    quant = np.asarray(O.forward(qparams, cfg, tokens=tokens, prefix_embeds=prefix))
    # per-channel symmetric int8: logits within ~1% of the logit scale
    scale = np.maximum(np.abs(full).max(), 1e-3)
    assert np.max(np.abs(quant - full)) / scale < 0.02


def test_int8_quantized_beam_runs_and_mostly_matches(hf_tiny):
    _, params, cfg = hf_tiny
    qparams = O.quantize_opt_params(params)
    rng = np.random.default_rng(5)
    prefix = jnp.asarray(rng.normal(size=(2, 4, 32)).astype(np.float32) * 0.1)
    seqs_f, _ = O.beam_generate(params, cfg, prefix, num_beams=3, max_new_tokens=6, num_return=3)
    seqs_q, _ = O.beam_generate(qparams, cfg, prefix, num_beams=3, max_new_tokens=6, num_return=3)
    assert seqs_q.shape == seqs_f.shape
    # tokens may flip near decision boundaries; demand broad agreement
    agree = float(np.mean(np.asarray(seqs_q) == np.asarray(seqs_f)))
    assert agree > 0.6, f"quantized beam diverged too far (agreement {agree:.2f})"


def test_int8_quantized_350m_forward_close(hf_tiny_350m):
    _, params, cfg = hf_tiny_350m
    qparams = O.quantize_opt_params(params)
    assert qparams["project_in"]["q8"].dtype == jnp.int8
    tokens = np.array([[2, 5, 9, 100, 42]], dtype=np.int32)
    full = np.asarray(O.forward(params, cfg, tokens=tokens))
    quant = np.asarray(O.forward(qparams, cfg, tokens=tokens))
    scale = np.maximum(np.abs(full).max(), 1e-3)
    assert np.max(np.abs(quant - full)) / scale < 0.03


def test_beam_generate_segmented_cache_identical(hf_tiny):
    """seg_len gen-cache bucketing changes traffic, not results."""
    _, params, cfg = hf_tiny
    rng = np.random.default_rng(6)
    prefix = jnp.asarray(rng.normal(size=(2, 4, 32)).astype(np.float32) * 0.1)
    base_s, base_sc = O.beam_generate(params, cfg, prefix, num_beams=3, max_new_tokens=11, num_return=3)
    for seg in (4, 5, 11, 16):
        seg_s, seg_sc = O.beam_generate(
            params, cfg, prefix, num_beams=3, max_new_tokens=11, num_return=3, seg_len=seg
        )
        np.testing.assert_array_equal(np.asarray(seg_s), np.asarray(base_s))
        np.testing.assert_allclose(np.asarray(seg_sc), np.asarray(base_sc), rtol=1e-6)


def test_beam_generate_rejects_negative_seg_len():
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from rlcf_tpu.models import opt as O

    cfg = O.OPT_CONFIGS["test-tiny-opt"]
    params = O.init_opt_params(jax.random.PRNGKey(0), cfg)
    prefix = jnp.zeros((1, 2, cfg.embed_dim), jnp.float32)
    with _pytest.raises(ValueError, match="seg_len"):
        O.beam_generate(params, cfg, prefix, num_beams=2, max_new_tokens=4, seg_len=-1)
