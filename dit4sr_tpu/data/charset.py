"""OCR charset: 95 printable ASCII chars + pad index 96.

Equivalent of the reference's CTLABELS/encode/decode (initialize.py:33-55;
duplicated in dataloaders/utils.py:28-51)."""

from __future__ import annotations

from typing import List, Sequence

CTLABELS: List[str] = [chr(c) for c in range(32, 127)]  # ' ' .. '~' (95 chars)
VOC_SIZE = 96          # reference voc_size; index 96 is the pad/stop class
PAD_INDEX = 96
MAX_WORD_LEN = 25


def encode(word: str, max_len: int = MAX_WORD_LEN) -> List[int]:
    """Word -> fixed-length char ids, padded with PAD_INDEX."""
    out = []
    for i in range(max_len):
        if i < len(word):
            out.append(CTLABELS.index(word[i]))
        else:
            out.append(PAD_INDEX)
    return out


def decode(idxs: Sequence[int]) -> str:
    """Char ids -> word; stops at the first out-of-charset index."""
    s = ""
    for idx in idxs:
        if 0 <= idx < len(CTLABELS):
            s += CTLABELS[idx]
        else:
            return s
    return s


def is_valid_word(text: str, max_len: int = 26) -> bool:
    """The loader's filter: printable ASCII only, length < 26
    (dataloaders/utils.py:105-115)."""
    return all(32 <= ord(c) < 127 for c in text) and 0 < len(text) < max_len
