"""GPT-2 byte-level BPE tokenizer (for OPT captioning), loaded from files.

The OPT models use the GPT-2 byte-level BPE with OPT special tokens
(pad=1 ``<pad>``, bos=eos=2 ``</s>``); the HF tokenizer prepends BOS. No
vocabulary is bundled (the assets ship with OPT checkpoints — supply
``vocab.json`` + ``merges.txt`` paths); tests build tiny synthetic vocabs.

Reference usage: `caption/capdec_tta.py:111-119` (padding + attention mask),
`caption/image_llm/models/generate_opt.py:53` (newline EOS lookup).
"""

from __future__ import annotations

import functools
import json
from typing import Iterable, List, Sequence, Tuple

import numpy as np
import regex as re

_GPT2_PATTERN = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


@functools.lru_cache()
def _byte_to_unicode():
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


class Gpt2Tokenizer:
    """Byte-level BPE with OPT conventions (BOS prepended, pad=1)."""

    def __init__(self, vocab_path: str, merges_path: str, bos_id: int = 2, pad_id: int = 1):
        with open(vocab_path) as fh:
            self.token_to_id = json.load(fh)
        self.id_to_token = {v: k for k, v in self.token_to_id.items()}
        with open(merges_path) as fh:
            lines = [ln for ln in fh.read().split("\n") if ln and not ln.startswith("#")]
        self._ranks = {tuple(ln.split()): i for i, ln in enumerate(lines)}
        self._b2u = _byte_to_unicode()
        self._u2b = {u: b for b, u in self._b2u.items()}
        self._cache: dict = {}
        self.bos_id = bos_id
        self.pad_id = pad_id

    def _bpe(self, piece: str) -> Tuple[str, ...]:
        cached = self._cache.get(piece)
        if cached is not None:
            return cached
        symbols = tuple(piece)
        while len(symbols) > 1:
            best = None
            best_rank = None
            for pair in zip(symbols[:-1], symbols[1:]):
                r = self._ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = pair, r
            if best is None:
                break
            first, second = best
            out: List[str] = []
            i = 0
            while i < len(symbols):
                if i < len(symbols) - 1 and symbols[i] == first and symbols[i + 1] == second:
                    out.append(first + second)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = tuple(out)
        self._cache[piece] = symbols
        return symbols

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids: List[int] = [self.bos_id] if add_bos else []
        for word in re.findall(_GPT2_PATTERN, text):
            mapped = "".join(self._b2u[b] for b in word.encode("utf-8"))
            for sym in self._bpe(mapped):
                tid = self.token_to_id.get(sym)
                if tid is not None:
                    ids.append(tid)
        return ids

    def decode(self, ids: Iterable[int], skip_special: bool = True) -> str:
        toks = []
        for i in ids:
            i = int(i)
            if skip_special and i in (self.bos_id, self.pad_id):
                continue
            tok = self.id_to_token.get(i)
            if tok is not None:
                toks.append(tok)
        text = "".join(toks)
        raw = bytearray(self._u2b[ch] for ch in text if ch in self._u2b)
        return raw.decode("utf-8", errors="replace")

    def batch_encode(self, texts: Sequence[str], pad_to: int | None = None):
        """-> (ids [N, L] int32 padded with pad_id, mask [N, L] int32)."""
        encoded = [self.encode(t) for t in texts]
        L = pad_to or max(len(e) for e in encoded)
        ids = np.full((len(texts), L), self.pad_id, np.int32)
        mask = np.zeros((len(texts), L), np.int32)
        for i, e in enumerate(encoded):
            e = e[:L]
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        return ids, mask

    def batch_decode(self, ids_batch, stop_id: int | None = None) -> List[str]:
        out = []
        for row in np.asarray(ids_batch):
            row = row.tolist()
            if stop_id is not None and stop_id in row:
                row = row[: row.index(stop_id)]
            out.append(self.decode(row).strip())
        return out
