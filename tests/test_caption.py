"""Caption stack: mapper parity, GPT-2 tokenizer, trainer, TTA driver."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlcf_tpu.models import mappers as M
from rlcf_tpu.models import opt as O
from rlcf_tpu.tasks import caption as Cap
from rlcf_tpu.tokenizer_gpt2 import Gpt2Tokenizer
from rlcf_tpu.core.reward import ClipReward, RewardConfig
from rlcf_tpu.models import clip as C

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


# ---------------------------------------------------------------------------
# mapper parity
# ---------------------------------------------------------------------------


def test_transformer_mapper_parity():
    path = os.path.join(FIXTURES, "golden_mapper_transformer.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixture missing (regenerate: see tests/conftest.py)")
    data = np.load(path)
    sd = {k[4:]: data[k] for k in data.files if k.startswith("sd::")}
    cfg = M.MapperConfig("transformer", clip_dim=16, llm_dim=24, prefix_length=5, clip_length=3, num_layers=2)
    params = M.convert_mapper_state_dict(sd, cfg)
    out = np.asarray(M.mapper_forward(params, cfg, jnp.asarray(data["x"])))
    np.testing.assert_allclose(out, data["out"], rtol=2e-4, atol=2e-5)


def test_mlp_mapper_parity():
    path = os.path.join(FIXTURES, "golden_mapper_mlp.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixture missing (regenerate: see tests/conftest.py)")
    data = np.load(path)
    sd = {k[4:]: data[k] for k in data.files if k.startswith("sd::")}
    cfg = M.MapperConfig("mlp", clip_dim=16, llm_dim=24, prefix_length=5)
    params = M.convert_mapper_state_dict(sd, cfg)
    out = np.asarray(M.mapper_forward(params, cfg, jnp.asarray(data["x"])))
    np.testing.assert_allclose(out, data["out"], rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_encoder_decoder_mapper_shapes():
    cfg = M.MapperConfig("transformer_encoder_decoder", clip_dim=16, llm_dim=24, prefix_length=5, clip_length=3, num_layers=2, enc_dec_width=32, n_heads=8)
    params = M.init_mapper_params(jax.random.PRNGKey(0), cfg)
    out = M.mapper_forward(params, cfg, jnp.zeros((2, 16)))
    assert out.shape == (2, 5, 24)


# ---------------------------------------------------------------------------
# GPT-2 tokenizer
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tok_files(tmp_path_factory):
    """Synthetic byte-level vocab: all single bytes + a few merges."""
    d = tmp_path_factory.mktemp("tok")
    from rlcf_tpu.tokenizer_gpt2 import _byte_to_unicode

    b2u = _byte_to_unicode()
    vocab = {"<pad>": 1, "</s>": 2}
    next_id = 4
    for ch in b2u.values():
        if ch not in vocab:
            vocab[ch] = next_id
            next_id += 1
    merges = ["t h", "th e", "Ġ t", "Ġt he"]
    for m in merges:
        vocab["".join(m.split())] = next_id
        next_id += 1
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version\n" + "\n".join(merges) + "\n")
    return str(d / "vocab.json"), str(d / "merges.txt")


@pytest.fixture(scope="module")
def tiny_gpt2_tok(tok_files):
    return Gpt2Tokenizer(*tok_files)


def test_gpt2_tokenizer_roundtrip(tiny_gpt2_tok):
    tok = tiny_gpt2_tok
    ids = tok.encode("the cat")
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == "the cat"
    # merges applied: "the" collapses
    assert len(ids) < 2 + len("the cat")


def test_gpt2_batch_encode_padding(tiny_gpt2_tok):
    ids, mask = tiny_gpt2_tok.batch_encode(["the", "the cat sat"], pad_to=12)
    assert ids.shape == (2, 12) and mask.shape == (2, 12)
    assert mask[0].sum() < mask[1].sum()
    assert (ids[0][mask[0] == 0] == 1).all()


def test_gpt2_matches_hf_gpt2_tokenizer(tok_files, tiny_gpt2_tok):
    """Exact-id parity vs transformers GPT2Tokenizer on the same tiny vocab."""
    from transformers import GPT2Tokenizer

    hf = GPT2Tokenizer(*tok_files)
    for text in ["the cat", "hello there", "a theory of things", " the  the "]:
        ref = hf.encode(text)
        mine = tiny_gpt2_tok.encode(text, add_bos=False)
        assert mine == ref, text


# ---------------------------------------------------------------------------
# caption model + trainer + TTA
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_caption():
    ocfg = O.OPT_CONFIGS["test-tiny-opt"]
    mcfg = M.MapperConfig("transformer", clip_dim=16, llm_dim=32, prefix_length=4, clip_length=2, num_layers=1, n_heads=2)
    ccfg = Cap.CaptionModelConfig(mapper=mcfg, opt=ocfg)
    params = Cap.init_caption_params(jax.random.PRNGKey(0), ccfg)
    return params, ccfg


def test_caption_forward_shapes(tiny_caption):
    params, ccfg = tiny_caption
    clip_emb = np.zeros((2, 16), np.float32)
    tokens = np.array([[2, 5, 9], [2, 8, 3]], dtype=np.int32)
    logits = Cap.caption_forward(params, ccfg, jnp.asarray(clip_emb), jnp.asarray(tokens))
    assert logits.shape == (2, 4 + 3, ccfg.opt.vocab_size)


def test_caption_ce_ignores_id_zero(tiny_caption):
    params, ccfg = tiny_caption
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4 + 3, ccfg.opt.vocab_size)).astype(np.float32))
    t1 = jnp.asarray(np.array([[2, 5, 9]], dtype=np.int32))
    t0 = jnp.asarray(np.array([[2, 5, 0]], dtype=np.int32))
    l1 = float(Cap.caption_ce(logits, t1, 4))
    l0 = float(Cap.caption_ce(logits, t0, 4))
    assert l1 != l0  # masked position dropped from mean


def test_supervised_training_reduces_loss(tiny_caption):
    params, ccfg = tiny_caption
    tcfg = Cap.TrainConfig(lr=1e-2, warmup_steps=1, total_steps=1000, epochs=3, cap_model="ClipCap")
    rng = np.random.default_rng(0)
    prefix = rng.normal(size=(8, 16)).astype(np.float32)
    tokens = rng.integers(4, 250, size=(8, 6)).astype(np.int32)
    tokens[:, 0] = 2
    mask = np.ones((8, 4 + 6), np.int32)

    def data():
        yield prefix, tokens, mask

    new_params, losses = Cap.train_caption_model(params, ccfg, tcfg, data)
    assert losses[-1] < losses[0]


def test_noise_injection_properties():
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32))
    out = Cap.noise_injection(rng, x, variance=0.016)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5)
    assert np.abs(np.asarray(out) - np.asarray(x / jnp.linalg.norm(x, axis=-1, keepdims=True))).max() > 1e-3
    same = Cap.noise_injection(rng, x, variance=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))


def test_mapper_checkpoint_roundtrip(tiny_caption, tmp_path):
    params, ccfg = tiny_caption
    path = str(tmp_path / "ckpt.npz")
    Cap.save_mapper_checkpoint(path, params["mapper"], epoch=7)
    loaded, epoch = Cap.load_mapper_checkpoint(path, params["mapper"])
    assert epoch == 7
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), loaded, params["mapper"]
    )


@pytest.mark.slow
def test_caption_tta_end_to_end(tiny_caption, tiny_gpt2_tok):
    params, ccfg = tiny_caption
    # tiny CLIP reward
    rcfg = C.ClipConfig("tiny-reward", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), rcfg), rcfg, RewardConfig(sample_k=3))
    tta = Cap.CaptionTTA(
        params, ccfg, reward, tiny_gpt2_tok, tta_steps=2, lr=1e-3, sample_k=3, max_new_tokens=6, token_pad_len=10
    )
    image = np.random.default_rng(0).normal(size=(32, 32, 3)).astype(np.float32)
    clip_emb = np.random.default_rng(1).normal(size=(16,)).astype(np.float32)
    trace = []
    caption = tta.adapt_image(image, clip_emb, trace=trace)
    assert isinstance(caption, str)
    assert len(trace) == 2 and len(trace[0]) == 3  # K sampled captions per step
    # deterministic reruns (pure reset semantics)
    caption2 = tta.adapt_image(image, clip_emb)
    assert caption == caption2


def test_caption_predict_only(tiny_caption, tiny_gpt2_tok):
    params, ccfg = tiny_caption
    rcfg = C.ClipConfig("tiny-reward", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), rcfg), rcfg, RewardConfig(sample_k=3))
    tta = Cap.CaptionTTA(params, ccfg, reward, tiny_gpt2_tok, tta_steps=0, sample_k=3, max_new_tokens=6)
    caps = tta.predict_only(np.zeros((2, 16), np.float32))
    assert len(caps) == 2


def test_caption_ce_matches_torch_reference_formula(tiny_caption):
    """The TTA loss slice matches the reference computation
    (`capdec_tta.py:119-124`): CE(logits[P-1:-1], tokens, ignore_index=0,
    reduction='none').mean(-1) weighted by rewards."""
    import torch
    import torch.nn.functional as F

    params, ccfg = tiny_caption
    P = ccfg.prefix_length
    rng = np.random.default_rng(0)
    K, T, V = 3, 6, ccfg.opt.vocab_size
    logits = rng.normal(size=(K, P + T, V)).astype(np.float32)
    tokens = rng.integers(0, V, size=(K, T)).astype(np.int64)
    tokens[0, -1] = 0  # exercise ignore_index
    rewards = rng.normal(size=(K,)).astype(np.float32)

    t_logits = torch.from_numpy(logits)[:, P - 1 : -1]
    all_loss = F.cross_entropy(
        t_logits.reshape(-1, V), torch.from_numpy(tokens).flatten(), ignore_index=0, reduction="none"
    ).reshape(K, -1)
    ref = torch.mean(torch.from_numpy(rewards) * all_loss.mean(dim=-1)).item()

    per_caption = Cap.caption_ce(jnp.asarray(logits), jnp.asarray(tokens.astype(np.int32)), P, per_sample=True)
    mine = float(jnp.mean(jnp.asarray(rewards) * per_caption))
    assert abs(mine - ref) < 1e-5


def test_caption_ce_unequal_lengths_matches_torch(tiny_caption):
    """Reference-exact per-caption CE when captions have UNEQUAL lengths: the
    reference pads K captions only to their longest (HF ``padding=True``, pad
    id 1, ignore_index=0) and means over that length; our fixed static pad
    must reproduce it via valid_mask (the round-1 version divided by the full
    static length and counted pad-1 CE past the group's longest caption)."""
    import torch
    import torch.nn.functional as F

    params, ccfg = tiny_caption
    P = ccfg.prefix_length
    rng = np.random.default_rng(1)
    K, V = 3, ccfg.opt.vocab_size
    PAD = 1
    lengths = [3, 6, 4]  # unequal; longest = 6
    L_ref = max(lengths)
    L_fixed = 10  # our static pad length (> L_ref)

    # reference layout: padded to longest with pad id 1
    tokens_ref = np.full((K, L_ref), PAD, np.int64)
    for i, l in enumerate(lengths):
        tokens_ref[i, :l] = rng.integers(3, V, size=(l,))
    logits_ref = rng.normal(size=(K, P + L_ref, V)).astype(np.float32)
    rewards = rng.normal(size=(K,)).astype(np.float32)

    t_logits = torch.from_numpy(logits_ref)[:, P - 1 : -1]
    all_loss = F.cross_entropy(
        t_logits.reshape(-1, V), torch.from_numpy(tokens_ref).flatten(), ignore_index=0, reduction="none"
    ).reshape(K, -1)
    ref = torch.mean(torch.from_numpy(rewards) * all_loss.mean(dim=-1)).item()

    # our layout: same logits/tokens padded out to L_fixed, mask from lengths
    tokens_fix = np.full((K, L_fixed), PAD, np.int32)
    tokens_fix[:, :L_ref] = tokens_ref
    logits_fix = rng.normal(size=(K, P + L_fixed, V)).astype(np.float32)
    logits_fix[:, : P + L_ref - 1] = logits_ref[:, : P + L_ref - 1]
    mask = (np.arange(L_fixed)[None, :] < np.asarray(lengths)[:, None]).astype(np.int32)

    per_caption = Cap.caption_ce(
        jnp.asarray(logits_fix), jnp.asarray(tokens_fix), P, per_sample=True, valid_mask=jnp.asarray(mask)
    )
    mine = float(jnp.mean(jnp.asarray(rewards) * per_caption))
    assert abs(mine - ref) < 1e-5


@pytest.mark.slow
def test_caption_tta_batched_matches_single(tiny_caption, tiny_gpt2_tok):
    """adapt_batch == adapt_image per element (beam path is deterministic)."""
    params, ccfg = tiny_caption
    rcfg = C.ClipConfig("tiny-reward", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), rcfg), rcfg, RewardConfig(sample_k=3))
    tta = Cap.CaptionTTA(
        params, ccfg, reward, tiny_gpt2_tok, tta_steps=2, lr=1e-3, sample_k=3, max_new_tokens=6, token_pad_len=10
    )
    r = np.random.default_rng(0)
    images = r.normal(size=(2, 32, 32, 3)).astype(np.float32)
    embs = r.normal(size=(2, 16)).astype(np.float32)
    singles = [tta.adapt_image(images[i], embs[i]) for i in range(2)]
    batched = tta.adapt_batch(images, embs)
    assert batched == singles


@pytest.mark.slow
def test_caption_tta_momentum_updates_anchor(tiny_caption, tiny_gpt2_tok):
    """Momentum EMA (CAP_TTA `custom_models.py:57-71`): each image's adapted
    mapper folds into the EMA; the episode anchor re-bases every update_freq
    images, so subsequent captions can change while staying deterministic."""
    params, ccfg = tiny_caption
    rcfg = C.ClipConfig("tiny-reward", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), rcfg), rcfg, RewardConfig(sample_k=3))
    tta = Cap.CaptionTTA(
        params, ccfg, reward, tiny_gpt2_tok, tta_steps=2, lr=5e-2, sample_k=3, max_new_tokens=6,
        token_pad_len=30, momentum_update=True, update_freq=1, update_w=1.0, momentum=0.5,
    )
    image = np.random.default_rng(0).normal(size=(32, 32, 3)).astype(np.float32)
    clip_emb = np.random.default_rng(1).normal(size=(16,)).astype(np.float32)
    anchor0 = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(), tta.momentum_state.reset_params)
    tta.adapt_image(image, clip_emb)
    assert tta.momentum_state.counter == 0  # update_freq=1 -> re-anchored
    moved = jax.tree_util.tree_reduce(
        max,
        jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()), tta.momentum_state.reset_params, anchor0
        ),
    )
    assert moved > 0.0  # anchor absorbed the adapted mapper

    # batched path folds through the same fused scan
    tta2 = Cap.CaptionTTA(
        params, ccfg, reward, tiny_gpt2_tok, tta_steps=1, lr=5e-2, sample_k=3, max_new_tokens=6,
        token_pad_len=30, momentum_update=True, update_freq=2, update_w=1.0, momentum=0.5,
    )
    imgs = np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32)
    embs = np.random.default_rng(3).normal(size=(2, 16)).astype(np.float32)
    caps = tta2.adapt_batch(imgs, embs)
    assert len(caps) == 2
    assert tta2.momentum_state.counter == 0  # 2 folds -> re-anchor fired


def test_decode_retokenize_pads_to_32_bucket(tiny_caption, tiny_gpt2_tok):
    """_decode_and_retokenize pads to the 32-token bucket above the group's
    longest caption (capped at token_pad_len), not to the full worst-case
    budget — the CE update's cost is linear in the padded length."""
    params, ccfg = tiny_caption
    rcfg = C.ClipConfig("tiny-reward", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), rcfg), rcfg, RewardConfig(sample_k=3))
    tta = Cap.CaptionTTA(
        params, ccfg, reward, tiny_gpt2_tok, tta_steps=1, lr=1e-3, sample_k=3, max_new_tokens=6,
        token_pad_len=96,
    )
    tok = tiny_gpt2_tok
    # short captions -> the first (32) bucket despite token_pad_len=96
    seqs = np.full((3, 8), tok.pad_id, np.int32)
    for i, t in enumerate(["the cat", "a hat", "the"]):
        ids = tok.encode(t)
        seqs[i, : len(ids)] = ids
    texts, opt_tokens, opt_mask, clip_tokens = tta._decode_and_retokenize(seqs)
    longest = int(opt_mask.sum(axis=-1).max())
    assert opt_tokens.shape[1] == 32 and opt_tokens.shape[1] >= longest
    assert opt_mask.shape == opt_tokens.shape
    assert clip_tokens.shape[1] == 77  # CLIP side stays at its own budget
    # pad fill past each caption is pad_id with mask 0
    assert (np.asarray(opt_tokens)[0][np.asarray(opt_mask)[0] == 0] == tok.pad_id).all()
    # cap: a tiny explicit budget still wins over the bucket
    tta_small = Cap.CaptionTTA(
        params, ccfg, reward, tiny_gpt2_tok, tta_steps=1, lr=1e-3, sample_k=3, max_new_tokens=6,
        token_pad_len=10,
    )
    _, toks_small, mask_small, _ = tta_small._decode_and_retokenize(seqs)
    assert toks_small.shape[1] == 10 and mask_small.shape[1] == 10


def test_long_caption_never_truncates(tiny_caption, tiny_gpt2_tok):
    """A retokenized caption longer than token_pad_len must round-trip
    UNCLIPPED: the bucket grows past the configured cap (one extra compiled
    update-step shape) with a warning — the reference pads to longest and
    never computes CE on a truncated caption (`capdec_tta.py:111-119`)."""
    import warnings

    params, ccfg = tiny_caption
    rcfg = C.ClipConfig("tiny-reward", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), rcfg), rcfg, RewardConfig(sample_k=3))
    tta = Cap.CaptionTTA(
        params, ccfg, reward, tiny_gpt2_tok, tta_steps=1, lr=1e-3, sample_k=3, max_new_tokens=6,
        token_pad_len=10,
    )
    tok = tiny_gpt2_tok
    long_text = "a very long winded caption about a dog " * 3  # ~60+ byte tokens
    ids = tok.encode(long_text)
    assert len(ids) >= 60
    seqs = np.full((2, len(ids) + 2), tok.pad_id, np.int32)
    seqs[0, : len(ids)] = ids
    seqs[1, :3] = tok.encode("cat")[:3]
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        texts, opt_tokens, opt_mask, _ = tta._decode_and_retokenize(seqs)
    assert any("exceeds token_pad_len" in str(w.message) for w in rec)
    longest = int(opt_mask.sum(axis=-1).max())
    assert longest >= 60  # nothing was clipped
    assert opt_tokens.shape[1] >= longest
    assert opt_tokens.shape[1] % 32 == 0  # grown to the covering 32-bucket
    # the long caption's ids survive intact under its mask
    row = np.asarray(opt_tokens)[0][np.asarray(opt_mask)[0] == 1]
    np.testing.assert_array_equal(row, tok.encode(texts[0]))


def test_caption_ce_invariant_to_pad_past_longest(tiny_caption):
    """Any pad length >= the group's longest caption yields the identical
    per-sample CE (the masked-mean divides by the batch-longest length and
    drops positions past it) — the invariant that makes 32-token bucketing in
    _decode_and_retokenize exact rather than approximate."""
    params, ccfg = tiny_caption
    P = ccfg.prefix_length
    rng = np.random.default_rng(7)
    K, V, PAD = 3, ccfg.opt.vocab_size, 1
    lengths = [3, 6, 4]  # longest = 6
    L1, L2 = 8, 20  # two pad budgets, both >= longest

    tokens2 = np.full((K, L2), PAD, np.int32)
    for i, l in enumerate(lengths):
        tokens2[i, :l] = rng.integers(3, V, size=(l,))
    tokens1 = tokens2[:, :L1]
    mask2 = (np.arange(L2)[None, :] < np.asarray(lengths)[:, None]).astype(np.int32)
    mask1 = mask2[:, :L1]
    logits2 = rng.normal(size=(K, P + L2, V)).astype(np.float32)
    logits1 = logits2[:, : P + L1]

    ce1 = Cap.caption_ce(jnp.asarray(logits1), jnp.asarray(tokens1), P, per_sample=True, valid_mask=jnp.asarray(mask1))
    ce2 = Cap.caption_ce(jnp.asarray(logits2), jnp.asarray(tokens2), P, per_sample=True, valid_mask=jnp.asarray(mask2))
    np.testing.assert_allclose(np.asarray(ce1), np.asarray(ce2), rtol=1e-6)


def test_caption_tta_quantized_decode_runs(tiny_caption, tiny_gpt2_tok):
    """int8 weight-only decode: generation works and the CE/update path keeps
    full-precision weights (decode_params differ from params['opt'])."""
    params, ccfg = tiny_caption
    rcfg = C.ClipConfig("tiny-reward", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), rcfg), rcfg, RewardConfig(sample_k=3))
    tta = Cap.CaptionTTA(
        params, ccfg, reward, tiny_gpt2_tok, tta_steps=1, lr=1e-3, sample_k=3,
        max_new_tokens=6, token_pad_len=10, quantize_decode=True,
    )
    import jax.numpy as jnp
    assert isinstance(tta.decode_params["embed_tokens"], dict)
    assert tta.decode_params["embed_tokens"]["q8"].dtype == jnp.int8
    assert not isinstance(tta.params["opt"]["embed_tokens"], dict)  # updates stay fp
    image = np.random.default_rng(0).normal(size=(32, 32, 3)).astype(np.float32)
    clip_emb = np.random.default_rng(1).normal(size=(16,)).astype(np.float32)
    caption = tta.adapt_image(image, clip_emb)
    assert isinstance(caption, str)
    caps = tta.adapt_batch(np.stack([image, image]), np.stack([clip_emb, clip_emb]))
    assert len(caps) == 2 and caps[0] == caps[1]
