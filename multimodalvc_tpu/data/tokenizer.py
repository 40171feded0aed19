"""Tokenizer wrappers: HF LLaMA tokenizer + self-contained char fallback.

The reference tokenizes labels and the constant instruction with the LLaMA
tokenizer (src/dataset.py:184-188,331-337).  ``load_tokenizer`` returns the
HF tokenizer when a local path/repo is resolvable; ``CharTokenizer`` is a
dependency-free stand-in with the same interface for tests and offline
development.
"""
from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence

logger = logging.getLogger(__name__)

INSTRUCTION_TEXT = "Focus on semantics, not voice characteristics"  # src/dataset.py:337


class CharTokenizer:
    """Byte-level tokenizer with LLaMA-compatible special-token slots."""

    def __init__(self, vocab_size: int = 512):
        self.vocab_size = max(vocab_size, 260)
        self.bos_token_id = 256
        self.eos_token_id = 257
        self.pad_token_id = 258

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = list(text.encode("utf-8"))
        return ([self.bos_token_id] if add_bos else []) + ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        data = bytes(i for i in ids if i < 256)
        return data.decode("utf-8", errors="ignore")

    def __call__(self, text: str):
        return {"input_ids": self.encode(text)}


class HFTokenizer:
    """Thin adapter over transformers.AutoTokenizer with LLaMA-3 specials."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path)
        self.bos_token_id = self.tok.bos_token_id
        self.eos_token_id = self.tok.eos_token_id
        pad = self.tok.convert_tokens_to_ids("<|finetune_right_pad_id|>")
        self.pad_token_id = pad if pad is not None and pad >= 0 else self.tok.eos_token_id
        self.vocab_size = len(self.tok)

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        return self.tok(text, add_special_tokens=add_bos)["input_ids"]

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self.tok.decode(ids, skip_special_tokens=skip_special_tokens)


def load_tokenizer(llm_path: Optional[str]):
    """HF tokenizer if loadable (local path or cached repo), else char-level."""
    if llm_path:
        try:
            return HFTokenizer(llm_path)
        except Exception as e:  # offline / missing files
            logger.warning("falling back to CharTokenizer (%s)", e)
    return CharTokenizer()
