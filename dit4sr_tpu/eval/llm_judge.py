"""LLM-as-judge OCR accuracy scoring.

Rebuild of the reference's llm_eval_tair.py:5-190: an LLM classifies each
predicted word against the GT words into correct / partial / incorrect, per
denoising timestep. The LLM is pluggable (the reference hard-codes
Qwen3-14B-AWQ on GPU); any callable str -> str works, including a local HF
model or a rule-based fallback for environments without model weights.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional


JUDGE_PROMPT = """You are grading an OCR system. Ground-truth words: {gt}.
Predicted words: {pred}.
For each predicted word, classify it as one of: correct (exact match to a
ground-truth word, case-insensitive), partial (clearly a corrupted version of
a ground-truth word: small edit distance or substring), or incorrect.
Answer with one JSON object mapping each predicted word to its class."""


def rule_based_judge(prompt: str) -> str:
    """Deterministic fallback judge implementing the grading rubric directly
    (exact match -> correct; edit-distance<=2 or substring -> partial)."""
    m = re.search(r"Ground-truth words: \[(.*?)\]\.\nPredicted words: \[(.*?)\]\.", prompt, re.S)
    if not m:
        return "{}"
    parse = lambda s: [w.strip().strip("'\"") for w in s.split(",") if w.strip()]  # noqa: E731
    gt = [w.lower() for w in parse(m.group(1))]
    pred = parse(m.group(2))

    def edit_distance(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    out = {}
    for w in pred:
        wl = w.lower()
        if wl in gt:
            out[w] = "correct"
        elif any(
            edit_distance(wl, g) <= 2 or (len(wl) >= 3 and (wl in g or g in wl))
            for g in gt
        ):
            out[w] = "partial"
        else:
            out[w] = "incorrect"
    return json.dumps(out)


@dataclass
class OCRJudge:
    """Scores per-step OCR predictions. llm: prompt -> response."""

    llm: Callable[[str], str] = rule_based_judge

    def judge_step(self, gt_words: List[str], pred_words: List[str]) -> Dict[str, str]:
        prompt = JUDGE_PROMPT.format(gt=gt_words, pred=pred_words)
        try:
            resp = self.llm(prompt)
            match = re.search(r"\{.*\}", resp, re.S)
            return json.loads(match.group(0)) if match else {}
        except Exception:
            return {}

    def score_trajectory(
        self, gt_words: List[str], steps: List[List[str]]
    ) -> List[Dict[str, float]]:
        """Per-timestep correct/partial/incorrect rates
        (llm_eval_tair.py:60-110)."""
        out = []
        for pred_words in steps:
            classes = self.judge_step(gt_words, pred_words)
            n = max(1, len(pred_words))
            counts = {"correct": 0, "partial": 0, "incorrect": 0}
            for w in pred_words:
                counts[classes.get(w, "incorrect")] += 1
            out.append({k: v / n for k, v in counts.items()} | {"num_pred": len(pred_words)})
        return out
