"""Tokenizer adapters for the SD3 triple text encoder.

The reference loads CLIPTokenizer x2 + T5TokenizerFast from the SD3.5
checkpoint dir (initialize.py:322-336). Tokenizer vocab files are data
assets; this adapter loads them from a local path when present. Without
them, `SimpleTokenizer` provides a deterministic hash-bucket fallback so the
full prompt->ids->embeds path stays exercised in weightless environments.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class SimpleTokenizer:
    """Deterministic word-hash tokenizer (fallback; NOT CLIP/T5-compatible)."""

    vocab_size: int = 49408
    max_length: int = 77
    bos: int = 49406
    eos: int = 49407
    pad: Optional[int] = None  # default: eos (CLIP convention)

    def __call__(self, texts: List[str]) -> np.ndarray:
        pad = self.eos if self.pad is None else self.pad
        out = np.full((len(texts), self.max_length), pad, np.int32)
        for i, t in enumerate(texts):
            ids = [self.bos]
            for w in t.lower().split()[: self.max_length - 2]:
                h = int.from_bytes(hashlib.sha1(w.encode()).digest()[:4], "little")
                ids.append(h % (self.vocab_size - 1000))
            ids.append(self.eos)
            out[i, : len(ids)] = ids
        return out


class SD3Tokenizers:
    """CLIP x2 + T5 tokenization with the SD3 length conventions
    (77 CLIP tokens; 77 T5 at train / 256 at eval)."""

    def __init__(self, checkpoint_dir: Optional[str] = None, t5_length: int = 256):
        self.t5_length = t5_length
        self._hf = None
        if checkpoint_dir:
            from transformers import AutoTokenizer

            self._hf = (
                AutoTokenizer.from_pretrained(f"{checkpoint_dir}/tokenizer"),
                AutoTokenizer.from_pretrained(f"{checkpoint_dir}/tokenizer_2"),
                AutoTokenizer.from_pretrained(f"{checkpoint_dir}/tokenizer_3"),
            )
        else:
            self._clip = SimpleTokenizer()
            self._t5 = SimpleTokenizer(
                vocab_size=32128, max_length=t5_length, bos=3, eos=1, pad=0
            )

    def __call__(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        """texts -> (clip_ids (B, 77), t5_ids (B, t5_length))."""
        if self._hf is not None:
            tok_l, _, tok_t5 = self._hf
            clip = tok_l(
                texts, padding="max_length", max_length=77, truncation=True,
                return_tensors="np",
            ).input_ids.astype(np.int32)
            t5 = tok_t5(
                texts, padding="max_length", max_length=self.t5_length,
                truncation=True, return_tensors="np",
            ).input_ids.astype(np.int32)
            return clip, t5
        return self._clip(texts), self._t5(texts)
