"""GPT-2/OPT tokenizer asset discovery (env var, bundled dir, HF cache)."""

import json
import os

import pytest

from rlcf_tpu import tokenizer_gpt2 as TG


def _write_assets(d, gpt2_sized=False):
    os.makedirs(d, exist_ok=True)
    b2u = TG._byte_to_unicode()
    vocab = {"<pad>": 1, "</s>": 2}
    nid = 4
    for ch in b2u.values():
        if ch not in vocab:
            vocab[ch] = nid
            nid += 1
    if gpt2_sized:
        # pad to the real GPT-2 vocab size + a known byte-level token so the
        # HF-cache validation (`_is_gpt2_vocab`) accepts the fixture
        vocab["Ġthe"] = nid
        nid += 1
        while len(vocab) < 50257:
            vocab[f"tok{nid}"] = nid
            nid += 1
    with open(os.path.join(d, "vocab.json"), "w") as fh:
        json.dump(vocab, fh)
    with open(os.path.join(d, "merges.txt"), "w") as fh:
        fh.write("#version\n")
    return os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")


def test_env_var_discovery(tmp_path, monkeypatch):
    v, m = _write_assets(str(tmp_path))
    monkeypatch.setenv("RLCF_GPT2_VOCAB", v)
    monkeypatch.setenv("RLCF_GPT2_MERGES", m)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "nohf"))
    assert TG.find_tokenizer_assets() == (v, m)
    tok = TG.load_gpt2_tokenizer()
    assert tok.decode(tok.encode("hello")) == "hello"


def test_hf_cache_discovery(tmp_path, monkeypatch):
    snap = tmp_path / "hub" / "models--facebook--opt-125m" / "snapshots" / "abc123"
    v, m = _write_assets(str(snap), gpt2_sized=True)
    monkeypatch.delenv("RLCF_GPT2_VOCAB", raising=False)
    monkeypatch.delenv("RLCF_GPT2_MERGES", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    found = TG.find_tokenizer_assets()
    assert found == (v, m)


def test_hf_cache_rejects_clip_vocab(tmp_path, monkeypatch):
    """A cached CLIP snapshot ships vocab.json+merges.txt for CLIP's 49k BPE
    (word-final `</w>`, no byte-level tokens); discovery must not accept it —
    a CLIP-tokenized OPT prompt is silent garbage."""
    snap = tmp_path / "hub" / "models--openai--clip-vit-base-patch32" / "snapshots" / "s1"
    os.makedirs(str(snap))
    clip_vocab = {f"w{i}</w>": i for i in range(49408)}
    with open(snap / "vocab.json", "w") as fh:
        json.dump(clip_vocab, fh)
    with open(snap / "merges.txt", "w") as fh:
        fh.write("#version\n")
    monkeypatch.delenv("RLCF_GPT2_VOCAB", raising=False)
    monkeypatch.delenv("RLCF_GPT2_MERGES", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    if TG.find_tokenizer_assets() is not None:
        # only the bundled-assets dir may legitimately resolve here
        found_v, _ = TG.find_tokenizer_assets()
        assert "clip" not in found_v
    # with a real OPT snapshot beside it, the OPT one wins
    v, m = _write_assets(str(tmp_path / "hub" / "models--facebook--opt-125m" / "snapshots" / "s2"), gpt2_sized=True)
    assert TG.find_tokenizer_assets() == (v, m)


def test_missing_assets_error_is_actionable(tmp_path, monkeypatch):
    monkeypatch.delenv("RLCF_GPT2_VOCAB", raising=False)
    monkeypatch.delenv("RLCF_GPT2_MERGES", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty"))
    if TG.find_tokenizer_assets() is not None:
        pytest.skip("bundled assets present (fetch tool was run)")
    with pytest.raises(FileNotFoundError, match="fetch_tokenizer_assets"):
        TG.load_gpt2_tokenizer()


def test_explicit_paths_take_precedence(tmp_path, monkeypatch):
    v, m = _write_assets(str(tmp_path / "explicit"))
    _write_assets(str(tmp_path / "env"))
    monkeypatch.setenv("RLCF_GPT2_VOCAB", str(tmp_path / "env" / "vocab.json"))
    monkeypatch.setenv("RLCF_GPT2_MERGES", str(tmp_path / "env" / "merges.txt"))
    tok = TG.load_gpt2_tokenizer(v, m)
    assert tok.encode("a", add_bos=False)  # loads fine from the explicit pair
