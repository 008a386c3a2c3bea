"""Adapter over the HF Rust tokenizers runtime for non-WordPiece files.

BERT-family checkpoints tokenize through our first-party WordPiece
(models/tokenizer.py + native/wordpiece.cpp).  BPE checkpoints (ModernBERT's
``tokenizer.json``) use the installed Rust ``tokenizers`` runtime when
available — the same engine the reference relies on for all tokenization
(reference classifier.py:85).  Interface matches ``WordPieceTokenizer``:
``__call__`` → padded int32 ``(input_ids, attention_mask)``.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class HFTokenizerAdapter:
    def __init__(self, path: str):
        from tokenizers import Tokenizer

        p = Path(path)
        self._tok = Tokenizer.from_file(str(p / "tokenizer.json"))
        self._tok.no_padding()
        self._tok.no_truncation()

        # resolve special ids from tokenizer_config.json when present
        cls_tok, sep_tok, pad_tok = "[CLS]", "[SEP]", "[PAD]"
        cfg_file = p / "tokenizer_config.json"
        if cfg_file.exists():
            try:
                cfg = json.loads(cfg_file.read_text())

                def name(key, default):
                    v = cfg.get(key, default)
                    return v.get("content") if isinstance(v, dict) else (v or default)

                cls_tok = name("cls_token", cls_tok)
                sep_tok = name("sep_token", sep_tok)
                pad_tok = name("pad_token", pad_tok)
            except Exception:
                pass
        tid = self._tok.token_to_id
        self.cls_id = tid(cls_tok) if tid(cls_tok) is not None else 0
        self.sep_id = tid(sep_tok) if tid(sep_tok) is not None else 0
        self.pad_id = tid(pad_tok) if tid(pad_tok) is not None else 0
        self._post_processor_adds_specials = self._detect_postprocessor(p)

    def _detect_postprocessor(self, p: Path) -> bool:
        try:
            data = json.loads((p / "tokenizer.json").read_text())
            return data.get("post_processor") is not None
        except Exception:
            return False

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def encode(self, text: str, max_length: int = 512):
        enc = self._tok.encode(text)
        ids = list(enc.ids)
        if not self._post_processor_adds_specials:
            ids = [self.cls_id] + ids[: max_length - 2] + [self.sep_id]
        else:
            ids = ids[:max_length]
        return ids

    def __call__(
        self,
        texts: Sequence[str],
        max_length: int = 512,
        pad_to_multiple_of: Optional[int] = None,
        pad_to_length: Optional[int] = None,
        pad_to_buckets: Optional[Sequence[int]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
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


def try_load_hf_tokenizer(path: str):
    p = Path(path)
    if not (p / "tokenizer.json").exists():
        return None
    try:
        data = json.loads((p / "tokenizer.json").read_text())
        model_type = (data.get("model") or {}).get("type", "")
        if model_type == "WordPiece":
            return None  # first-party WordPiece handles these
    except Exception as e:
        logger.debug(f"tokenizer.json unreadable for {path}: {e}")
        return None
    try:
        return HFTokenizerAdapter(str(p))
    except Exception as e:
        logger.debug(f"Rust tokenizers runtime unavailable ({e}); "
                     f"falling back to first-party byte-level BPE")
    if model_type == "BPE":
        try:
            from .bpe import ByteLevelBPE

            return ByteLevelBPE.from_tokenizer_json(str(p))
        except Exception as e:
            logger.debug(f"first-party BPE load failed for {path}: {e}")
    return None
