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


def save_tiny_vlm_checkpoint(path: str) -> str:
    """Write a TINY random-weight HF vision-to-text checkpoint (BLIP-style,
    ~200k params) + processor to `path`, entirely offline.

    Purpose: the zero-egress container ships no LLaVA/Qwen-VL weights, so
    the production CaptionAgent path (AutoProcessor -> generate -> decode,
    the exact API the reference drives in llava/llm_agent.py:69) could never
    be exercised — round-3 review called the VLM path "implemented but
    undemonstrated". This fixture makes the full HF plumbing testable: the
    captions are random-weight garbage, but every adapter line runs. NOT for
    production use — point model_path at a real checkpoint for that."""
    import os

    from transformers import (
        BertTokenizerFast,
        BlipConfig,
        BlipForConditionalGeneration,
        BlipImageProcessor,
        BlipProcessor,
        BlipTextConfig,
        BlipVisionConfig,
    )

    os.makedirs(path, exist_ok=True)
    vocab = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "a", "the", "image", "text", "sign", "photo", "scene", "##s",
    ]
    vocab_file = os.path.join(path, "vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=vocab_file)
    proc = BlipProcessor(
        image_processor=BlipImageProcessor(size={"height": 32, "width": 32}),
        tokenizer=tok,
    )
    text_cfg = BlipTextConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, encoder_hidden_size=32,
        bos_token_id=2, eos_token_id=3, pad_token_id=0, sep_token_id=3,
    )
    vision_cfg = BlipVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8,
    )
    model = BlipForConditionalGeneration(
        BlipConfig(text_config=text_cfg.to_dict(),
                   vision_config=vision_cfg.to_dict())
    )
    model.save_pretrained(path)
    proc.save_pretrained(path)
    return path


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


@dataclass
class VLMCorrectionAgent:
    """Vision-language OCR correction: the Qwen2.5-VL mid-sampling hook
    (pipeline_dit4sr.py:1288-1379, test/test.py:193-208) — the VLM sees the
    CURRENT decoded preview image alongside the OCR words and corrects them
    with visual context. Wire as OCRGuidedSampler's correct_fn with
    correct_with_image=True (the sampler decodes the preview at correction
    steps, like the reference). Without `model_path` the words pass through
    unchanged so pipelines stay runnable in weightless environments."""

    model_path: Optional[str] = None
    max_new_tokens: int = 64
    _model: object = None

    def _load(self):
        if self._model is None and self.model_path:
            from transformers import AutoModelForVision2Seq, AutoProcessor

            self._proc = AutoProcessor.from_pretrained(self.model_path)
            self._model = AutoModelForVision2Seq.from_pretrained(self.model_path)
        return self._model

    def __call__(
        self, words: List[str], step: int = 0, image: Optional[np.ndarray] = None
    ) -> List[str]:
        model = self._load()
        if not words or model is None or image is None:
            return words
        try:
            from PIL import Image

            arr = (
                (np.clip(image, 0.0, 1.0) * 255).astype(np.uint8)
                if image.dtype != np.uint8 else image
            )
            inputs = self._proc(
                images=Image.fromarray(arr),
                text=CORRECTION_PROMPT.format(words=", ".join(words)),
                return_tensors="pt",
            )
            out = model.generate(**inputs, max_new_tokens=self.max_new_tokens)
            resp = self._proc.batch_decode(out, skip_special_tokens=True)[0]
            corrected = [w.strip() for w in resp.split(",") if w.strip()]
            return corrected if corrected else words
        except Exception:
            return words
