"""Dictionary-snap correction for OCR-guided sampling.

The reference corrects per-step OCR words with a VLM/LLM at chosen
iterations (pipeline_dit4sr.py:1288-1379, llava/llm_agent.py): the language
prior turns a garbled spot ("OPFN") into a plausible word ("OPEN"). In the
zero-asset probe the language prior is a closed vocabulary (the probe's
scene generator draws from data/textscenes.WORDS), so the correction is an
edit-distance snap: keep a decoded word only if some vocabulary entry is
within `max_dist` edits (case-insensitive), and replace it with that entry's
canonical casing. Words matching nothing are dropped — feeding hallucinated
strings to a word-compositional encoder would inject noise, not signal.
"""

from __future__ import annotations

from typing import List, Optional, Sequence


def edit_distance(a: str, b: str, limit: Optional[int] = None) -> int:
    """Levenshtein distance with an optional early-exit band."""
    if a == b:
        return 0
    if limit is not None and abs(len(a) - len(b)) > limit:
        return limit + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        if limit is not None and min(cur) > limit:
            return limit + 1
        prev = cur
    return prev[-1]


def snap_word(
    word: str, vocab: Sequence[str], max_dist: int = 2, min_len: int = 2
) -> Optional[str]:
    """Nearest vocabulary entry within max_dist (case-insensitive compare,
    canonical casing returned), else None."""
    if len(word) < min_len:
        return None
    wl = word.lower()
    best, best_d = None, max_dist + 1
    for v in vocab:
        d = edit_distance(wl, v.lower(), limit=best_d - 1)
        if d < best_d:
            best, best_d = v, d
            if d == 0:
                break
    return best


def snap_words(
    words: List[str], vocab: Sequence[str], max_dist: int = 2, min_len: int = 2
) -> List[str]:
    """Snap each word; drop non-matches and duplicates (order-preserving)."""
    out: List[str] = []
    for w in words:
        s = snap_word(w, vocab, max_dist=max_dist, min_len=min_len)
        if s is not None and s not in out:
            out.append(s)
    return out
