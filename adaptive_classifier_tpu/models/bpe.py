"""First-party byte-level BPE tokenizer (GPT-2 family algorithm).

ModernBERT-class checkpoints tokenize with byte-level BPE.  The adapter in
``hf_tokenizer_adapter.py`` uses the installed Rust runtime when present;
this module is the first-party implementation — byte-to-unicode mapping,
GPT-2 pre-tokenization scanner, greedy merge application — so the framework
has no hard dependency on a foreign tokenizer runtime (the reference depends
on HF's Rust tokenizers for everything, classifier.py:85).

Parity with the Rust implementation is tested token-for-token on BPE models
trained locally (tests/test_bpe.py).
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte↔unicode mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _is_letter(ch: str) -> bool:
    return ch.isalpha()


def _is_number(ch: str) -> bool:
    return ch.isnumeric()


def _is_space(ch: str) -> bool:
    return ch.isspace()


def gpt2_pretokenize(text: str) -> List[str]:
    """Scanner equivalent of the GPT-2 regex:
    ``'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+``
    """
    out: List[str] = []
    i, n = 0, len(text)
    contractions = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")
    while i < n:
        ch = text[i]
        if ch == "'":
            matched = False
            for c in contractions:
                if text.startswith(c, i):
                    out.append(c)
                    i += len(c)
                    matched = True
                    break
            if matched:
                continue
        # " ?\p{L}+" / " ?\p{N}+" / " ?[^\s\p{L}\p{N}]+"
        j = i
        prefix = ""
        if ch == " " and i + 1 < n and not _is_space(text[i + 1]):
            prefix = " "
            j = i + 1
            ch = text[j]
        if not _is_space(ch):
            if _is_letter(ch):
                k = j
                while k < n and _is_letter(text[k]):
                    k += 1
            elif _is_number(ch):
                k = j
                while k < n and _is_number(text[k]):
                    k += 1
            else:
                k = j
                while k < n and not (_is_space(text[k]) or _is_letter(text[k])
                                     or _is_number(text[k])):
                    k += 1
            out.append(prefix + text[j:k])
            i = k
            continue
        # whitespace runs: "\s+(?!\S)" or "\s+"
        k = i
        while k < n and _is_space(text[k]):
            k += 1
        if k < n and k - i > 1:
            # leave the final space to prefix the next token
            out.append(text[i : k - 1])
            i = k - 1
        else:
            out.append(text[i:k])
            i = k
    return out


class ByteLevelBPE:
    """Byte-level BPE encoder over a tokenizer.json vocab+merges."""

    def __init__(
        self,
        vocab: Dict[str, int],
        merges: Sequence[Tuple[str, str]],
        unk_token: Optional[str] = None,
        add_prefix_space: bool = False,
        specials: Optional[Dict[str, int]] = None,
    ):
        self.vocab = vocab
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_map = bytes_to_unicode()
        self.unk_id = vocab.get(unk_token) if unk_token else None
        self.add_prefix_space = add_prefix_space
        self.specials = specials or {}
        self.cls_id = self.specials.get("cls", 0)
        self.sep_id = self.specials.get("sep", 0)
        self.pad_id = self.specials.get("pad", 0)
        self._cache: Dict[str, List[str]] = {}

    @classmethod
    def from_tokenizer_json(cls, path: str) -> "ByteLevelBPE":
        p = Path(path)
        data = json.loads((p / "tokenizer.json").read_text()
                          if p.is_dir() else Path(path).read_text())
        model = data["model"]
        assert model["type"] == "BPE", model["type"]
        merges = [tuple(m.split(" ")) if isinstance(m, str) else tuple(m)
                  for m in model["merges"]]
        vocab = model["vocab"]
        specials = {}
        for tok in data.get("added_tokens", []):
            content = tok["content"]
            low = content.strip("[]<>|").lower()
            for key, names in (("cls", ("cls", "s")), ("sep", ("sep", "/s")),
                               ("pad", ("pad",)), ("unk", ("unk",))):
                if low in names:
                    specials[key] = tok["id"]
        pre = data.get("pre_tokenizer") or {}
        aps = bool(pre.get("add_prefix_space", False))
        return cls(vocab, merges, unk_token=model.get("unk_token"),
                   add_prefix_space=aps, specials=specials)

    def _bpe(self, token: str) -> List[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = list(token)
        while len(word) > 1:
            best = None
            best_rank = None
            for i in range(len(word) - 1):
                r = self.ranks.get((word[i], word[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best = i
            if best is None:
                break
            merged = word[best] + word[best + 1]
            word = word[:best] + [merged] + word[best + 2 :]
        self._cache[token] = word
        return word

    def encode_text(self, text: str) -> List[int]:
        if self.add_prefix_space and text and not text.startswith(" "):
            text = " " + text
        ids: List[int] = []
        for piece in gpt2_pretokenize(text):
            mapped = "".join(self.byte_map[b] for b in piece.encode("utf-8"))
            for sub in self._bpe(mapped):
                i = self.vocab.get(sub)
                if i is None:
                    if self.unk_id is not None:
                        ids.append(self.unk_id)
                else:
                    ids.append(i)
        return ids

    # -- WordPieceTokenizer-compatible batch interface -------------------
    def encode(self, text: str, max_length: int = 512) -> List[int]:
        body = self.encode_text(text)[: max_length - 2]
        return [self.cls_id] + body + [self.sep_id]

    @property
    def vocab_size(self) -> int:
        return max(len(self.vocab), max(self.specials.values(), default=0) + 1)

    def __call__(self, texts, max_length: int = 512, pad_to_multiple_of=None,
                 pad_to_length=None, pad_to_buckets=None):
        encoded = [self.encode(t, max_length=max_length) for t in texts]
        longest = max(len(e) for e in encoded)
        if pad_to_length is not None:
            longest = max(longest, pad_to_length)
        if pad_to_buckets:
            for b in sorted(pad_to_buckets):
                if longest <= b:
                    longest = b
                    break
        elif pad_to_multiple_of:
            m = pad_to_multiple_of
            longest = ((longest + m - 1) // m) * m
        longest = min(max(longest, 8), max(max_length, 8))
        ids = np.full((len(encoded), longest), self.pad_id, dtype=np.int32)
        mask = np.zeros((len(encoded), longest), dtype=np.int32)
        for i, e in enumerate(encoded):
            e = e[:longest]
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        return ids, mask
