"""CLIP byte-pair-encoding tokenizer (host-side, pure Python).

Behavioral parity target: the OpenAI CLIP ``SimpleTokenizer`` vendored by the
reference (``TPT/clip/simple_tokenizer.py:62``, ``TPT/clip/clip.py:197-233``):
lower-cased, whitespace-collapsed text is split by the CLIP regex, each piece is
byte-mapped to printable unicode and merged with the 48k learned BPE merges, and
``tokenize`` wraps token ids with <|startoftext|>/<|endoftext|> padded to a fixed
context length of 77.

The merge table is the public OpenAI vocabulary artifact shipped as package data
(``assets/bpe_simple_vocab_16e6.txt.gz``).

Differences from the reference: the reference calls ``ftfy.fix_text`` for
mojibake repair; ftfy is not a dependency here, so normalization is
``html.unescape`` (applied twice, as the reference does) plus NFC unicode
normalization — identical behavior for all well-formed input text.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import unicodedata
from typing import Iterable, List, Sequence, Union

import numpy as np
import regex as re

CONTEXT_LENGTH = 77

_WORD_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


def _vocab_asset_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets", "bpe_simple_vocab_16e6.txt.gz")


@functools.lru_cache()
def _byte_to_unicode() -> dict:
    """Map raw bytes to printable unicode chars (GPT-2 scheme, reversible)."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    mapped = printable[:]
    offset = 0
    for byte in range(256):
        if byte not in printable:
            printable.append(byte)
            mapped.append(256 + offset)
            offset += 1
    return {b: chr(c) for b, c in zip(printable, mapped)}


def _normalize_text(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = unicodedata.normalize("NFC", text)
    text = re.sub(r"\s+", " ", text).strip()
    return text


class ClipTokenizer:
    """BPE tokenizer producing OpenAI-CLIP-compatible token ids (vocab 49408)."""

    def __init__(self, vocab_path: str | None = None):
        vocab_path = vocab_path or _vocab_asset_path()
        self._b2u = _byte_to_unicode()
        self._u2b = {u: b for b, u in self._b2u.items()}

        with gzip.open(vocab_path, "rt", encoding="utf-8") as fh:
            lines = fh.read().split("\n")
        # Header line + exactly 48894 merges used by the released CLIP vocab.
        merge_lines = lines[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in merge_lines]

        base = list(self._b2u.values())
        tokens: List[str] = base + [t + "</w>" for t in base]
        tokens.extend("".join(m) for m in merges)
        tokens.extend(["<|startoftext|>", "<|endoftext|>"])

        self.token_to_id = {tok: i for i, tok in enumerate(tokens)}
        self.id_to_token = {i: tok for tok, i in self.token_to_id.items()}
        self._merge_rank = {m: i for i, m in enumerate(merges)}
        self._cache = {
            "<|startoftext|>": ("<|startoftext|>",),
            "<|endoftext|>": ("<|endoftext|>",),
        }
        self.sot_id = self.token_to_id["<|startoftext|>"]
        self.eot_id = self.token_to_id["<|endoftext|>"]
        self.vocab_size = len(tokens)

    def _apply_bpe(self, piece: str) -> tuple:
        cached = self._cache.get(piece)
        if cached is not None:
            return cached
        symbols = tuple(piece[:-1]) + (piece[-1] + "</w>",)
        if len(symbols) == 1:
            self._cache[piece] = symbols
            return symbols
        while len(symbols) > 1:
            # Find the lowest-rank adjacent pair still mergeable.
            best_rank = None
            best_pair = None
            for pair in zip(symbols[:-1], symbols[1:]):
                rank = self._merge_rank.get(pair)
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank, best_pair = rank, pair
            if best_pair is None:
                break
            first, second = best_pair
            merged: List[str] = []
            i = 0
            n = len(symbols)
            while i < n:
                if i < n - 1 and symbols[i] == first and symbols[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(symbols[i])
                    i += 1
            symbols = tuple(merged)
        self._cache[piece] = symbols
        return symbols

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = _normalize_text(text).lower()
        for word in re.findall(_WORD_PATTERN, text):
            mapped = "".join(self._b2u[b] for b in word.encode("utf-8"))
            ids.extend(self.token_to_id[sym] for sym in self._apply_bpe(mapped))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.id_to_token[int(i)] for i in ids)
        raw = bytearray(self._u2b[ch] for ch in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


@functools.lru_cache()
def get_tokenizer() -> ClipTokenizer:
    return ClipTokenizer()


def tokenize(
    texts: Union[str, Sequence[str]],
    context_length: int = CONTEXT_LENGTH,
    truncate: bool = False,
) -> np.ndarray:
    """Tokenize text(s) into an int32 [N, context_length] array.

    Mirrors the reference's ``clip.tokenize`` (``TPT/clip/clip.py:197-233``):
    <sot> ids <eot>, zero padding; over-length sequences raise unless
    ``truncate``, in which case the last position is forced to <eot>.
    """
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for row, text in enumerate(texts):
        ids = [tok.sot_id] + tok.encode(text) + [tok.eot_id]
        if len(ids) > context_length:
            if not truncate:
                raise RuntimeError(f"Input {text!r} is too long for context length {context_length}")
            ids = ids[:context_length]
            ids[-1] = tok.eot_id
        out[row, : len(ids)] = ids
    return out
