import json
import os

import numpy as np
import pytest

from rlcf_tpu.tokenizer import ClipTokenizer, get_tokenizer, tokenize

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def tok() -> ClipTokenizer:
    return get_tokenizer()


def test_vocab_constants(tok):
    assert tok.vocab_size == 49408
    assert tok.sot_id == 49406
    assert tok.eot_id == 49407


def test_golden_token_ids(tok):
    """Exact id parity with the reference OpenAI tokenizer on fixture strings."""
    with open(os.path.join(FIXTURES, "golden_tokens.json")) as fh:
        golden = json.load(fh)
    for text, ids in zip(golden["texts"], golden["ids"]):
        assert tok.encode(text) == ids, text


def test_decode_roundtrip(tok):
    # BPE decode re-inserts a space before punctuation ("cat ."), same as the
    # reference decoder — roundtrip on punctuation-free text.
    for text in ["three sheep on grass", "hello world", "test time adaptation"]:
        ids = tok.encode(text)
        assert tok.decode(ids).strip() == text


def test_tokenize_padding_and_markers(tok):
    arr = tokenize(["a photo of a dog."])
    assert arr.shape == (1, 77)
    assert arr.dtype == np.int32
    assert arr[0, 0] == tok.sot_id
    n = len(tok.encode("a photo of a dog."))
    assert arr[0, n + 1] == tok.eot_id
    assert (arr[0, n + 2 :] == 0).all()
    # argmax over the row finds EOT (ids are all < eot), the property CLIP's
    # text pooling relies on.
    assert arr[0].argmax() == n + 1


def test_tokenize_truncation(tok):
    long_text = "word " * 200
    with pytest.raises(RuntimeError):
        tokenize([long_text])
    arr = tokenize([long_text], truncate=True)
    assert arr.shape == (1, 77)
    assert arr[0, -1] == tok.eot_id


def test_case_insensitive(tok):
    assert tok.encode("A Photo OF a CAT.") == tok.encode("a photo of a cat.")
