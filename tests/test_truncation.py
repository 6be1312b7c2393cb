"""Exact-math sequence truncation: bit-identical pooled text features."""

import jax
import jax.numpy as jnp
import numpy as np

from rlcf_tpu.core import prompt as P
from rlcf_tpu.models import clip as C
from rlcf_tpu.tasks.classification import compute_class_features, truncate_tokens
from rlcf_tpu.tokenizer import tokenize


def small_clip():
    cfg = C.get_config("test-small")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_truncate_tokens_preserves_eot():
    toks = tokenize(["a photo of a dog.", "a photo of a siamese cat."])
    tr = truncate_tokens(toks)
    assert tr.shape[1] < 77 and tr.shape[1] % 8 == 0
    np.testing.assert_array_equal(tr.argmax(-1), toks.argmax(-1))


def test_truncated_text_features_equal_full():
    params, cfg = small_clip()
    prompts = ["a photo of a dog.", "a photo of a goldfish.", "a photo of a great white shark."]
    toks = tokenize(prompts)
    full = np.asarray(C.encode_text(params, cfg, toks.astype(np.int32)))
    trunc = np.asarray(C.encode_text(params, cfg, truncate_tokens(toks).astype(np.int32)))
    np.testing.assert_allclose(trunc, full, rtol=1e-5, atol=1e-6)


def test_prompt_state_truncated_matches_plain_encoding():
    """Spliced+truncated prompt features == full-77 plain text encoding."""
    params, cfg = small_clip()
    names = ["dog", "goldfish", "great white shark"]
    pt = P.build_prompt_state(params, names, ctx_init="a photo of a")
    assert pt.fixed_embed.shape[1] < 77
    spliced = P.splice_prompts(pt.ctx0, pt)
    via_state = np.asarray(C.encode_text_embeds(params, cfg, spliced, pt.eot_idx))
    toks = tokenize([f"a photo of a {n}." for n in names])
    full = np.asarray(C.encode_text(params, cfg, toks.astype(np.int32)))
    np.testing.assert_allclose(via_state, full, rtol=1e-5, atol=1e-6)


def test_class_features_match_full_context():
    params, cfg = small_clip()
    names = ["dog", "cat", "bird"]
    feats = np.asarray(compute_class_features(params, cfg, names))
    toks = tokenize([f"a photo of a {n}." for n in names])
    full = np.asarray(C.encode_text(params, cfg, toks.astype(np.int32)))
    full = full / np.linalg.norm(full, axis=-1, keepdims=True)
    np.testing.assert_allclose(feats, full.astype(np.float32), rtol=1e-5, atol=1e-6)
