"""VLM agents: LQ-image captioning and OCR word correction (host side).

Rebuild of the reference's VLM integration points:
  * LLavaAgent.gen_image_caption (llava/llm_agent.py:19-122) — captions LQ
    images for prompt conditioning;
  * Qwen2.5-VL OCR correction mid-sampling (pipeline_dit4sr.py:1288-1379,
    test/test.py:193-208);
  * the "focus-sentence" caption filter (train/train_utils.py:176-207).

These stay host-side torch/HF adapters by design (SURVEY.md §7 step 8):
VLMs are orders of magnitude larger than the SR stack and run rarely. Each
agent loads from a local HF checkpoint path; environments without weights
use the deterministic fallbacks so every pipeline stays runnable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np

PROHIBITED_WORDS = (
    "focus", "focal", "prominent", "close-up", "black and white",
    "blur", "depth", "dense", "locate", "position",
)

CAPTION_QUESTION = (
    "Describe this image and its style in a very detailed manner."
)

CORRECTION_PROMPT = (
    "The following words were read from text in an image by an OCR system "
    "and may contain errors: {words}. Correct obvious misspellings and "
    "return the corrected words as a comma-separated list."
)


def remove_focus_sentences(text: str) -> str:
    """Drop sentences containing layout/quality meta-words
    (train_utils.py:176-207)."""
    parts = re.split(r"([.?!])", text)
    kept = []
    for i in range(0, len(parts), 2):
        sentence = parts[i] + (parts[i + 1] if i + 1 < len(parts) else "")
        low = sentence.lower()
        if not any(w in low for w in PROHIBITED_WORDS):
            kept.append(sentence)
    return "".join(kept).strip()


@dataclass
class CaptionAgent:
    """Image -> caption. With `model_path`, loads an HF image-text model
    (LLaVA / Qwen-VL style via AutoModelForVision2Seq); otherwise uses the
    template fallback so prompt-conditioned pipelines stay runnable."""

    model_path: Optional[str] = None
    device: str = "cpu"
    question: str = CAPTION_QUESTION
    filter_focus: bool = True
    _pipe: object = None

    def _load(self):
        if self._pipe is None and self.model_path:
            from transformers import AutoModelForVision2Seq, AutoProcessor

            self._proc = AutoProcessor.from_pretrained(self.model_path)
            self._pipe = AutoModelForVision2Seq.from_pretrained(self.model_path)
        return self._pipe

    def caption(self, images: List[np.ndarray]) -> List[str]:
        """images: list of (H, W, 3) uint8/float arrays."""
        model = self._load()
        if model is None:
            captions = [
                "A real-world photograph containing scene text." for _ in images
            ]
        else:
            from PIL import Image

            captions = []
            for img in images:
                arr = (img * 255).astype(np.uint8) if img.dtype != np.uint8 else img
                inputs = self._proc(
                    images=Image.fromarray(arr), text=self.question,
                    return_tensors="pt",
                )
                out = model.generate(**inputs, max_new_tokens=128)
                captions.append(
                    self._proc.batch_decode(out, skip_special_tokens=True)[0]
                )
        if self.filter_focus:
            captions = [remove_focus_sentences(c) or c for c in captions]
        return captions


@dataclass
class OCRCorrectionAgent:
    """OCR word list -> corrected word list (the Qwen-VL correction hook).
    `llm` is any prompt->response callable; default identity fallback."""

    llm: Optional[Callable[[str], str]] = None

    def __call__(self, words: List[str], step: int = 0) -> List[str]:
        if not words or self.llm is None:
            return words
        try:
            resp = self.llm(CORRECTION_PROMPT.format(words=", ".join(words)))
            corrected = [w.strip() for w in resp.split(",") if w.strip()]
            return corrected if corrected else words
        except Exception:
            return words
