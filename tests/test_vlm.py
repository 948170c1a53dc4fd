"""VLM agent tests: focus-sentence filter, correction hook, and the REAL
HF invocation path exercised against a locally-built tiny vision2seq
checkpoint (no network; reference llava/llm_agent.py:19-122 +
pipeline_dit4sr.py:1288-1379)."""

import os

import numpy as np
import pytest

from dit4sr_tpu.text.vlm import (
    CaptionAgent,
    OCRCorrectionAgent,
    remove_focus_sentences,
)


def test_remove_focus_sentences_drops_meta_words():
    text = (
        "A street at night. The focus is on a neon sign. "
        "People walk past shops."
    )
    out = remove_focus_sentences(text)
    assert "focus" not in out.lower()
    assert "street at night" in out
    assert "walk past shops" in out


def test_caption_fallback_without_weights():
    agent = CaptionAgent()
    caps = agent.caption([np.zeros((8, 8, 3), np.float32)])
    assert len(caps) == 1 and isinstance(caps[0], str) and caps[0]


def test_ocr_correction_agent_parses_llm_response():
    agent = OCRCorrectionAgent(llm=lambda prompt: "HELLO, WORLD")
    assert agent(["HELL0", "W0RLD"]) == ["HELLO", "WORLD"]
    # identity fallback without an llm, and on empty input
    assert OCRCorrectionAgent()(["x"]) == ["x"]
    assert agent([]) == []


@pytest.fixture(scope="module")
def tiny_vlm_ckpt(tmp_path_factory):
    """A complete local HF image-text checkpoint at toy size: wordpiece
    vocab + Blip processor + random-init BlipForConditionalGeneration."""
    torch = pytest.importorskip("torch")  # noqa: F841
    from transformers import (
        BertTokenizerFast,
        BlipConfig,
        BlipForConditionalGeneration,
        BlipImageProcessor,
        BlipProcessor,
        BlipTextConfig,
        BlipVisionConfig,
    )

    d = str(tmp_path_factory.mktemp("tiny_vlm"))
    vocab = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "a", "photo", "text", "the", "##s",
    ]
    vp = os.path.join(d, "vocab.txt")
    with open(vp, "w") as f:
        f.write("\n".join(vocab))
    proc = BlipProcessor(
        image_processor=BlipImageProcessor(size={"height": 32, "width": 32}),
        tokenizer=BertTokenizerFast(vocab_file=vp),
    )
    proc.save_pretrained(d)
    cfg = BlipConfig.from_text_vision_configs(
        BlipTextConfig(
            vocab_size=len(vocab), hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            encoder_hidden_size=16, max_position_embeddings=64,
            bos_token_id=2, eos_token_id=3, pad_token_id=0, sep_token_id=3,
        ),
        BlipVisionConfig(
            hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=32, image_size=32, patch_size=8,
        ),
    )
    BlipForConditionalGeneration(cfg).save_pretrained(d)
    return d


@pytest.mark.slow
def test_caption_real_hf_invocation(tiny_vlm_ckpt):
    """End-to-end through AutoProcessor + AutoModelForVision2Seq.generate —
    the exact code path a real LLaVA/Qwen-VL checkpoint takes."""
    agent = CaptionAgent(model_path=tiny_vlm_ckpt, question="a photo")
    caps = agent.caption([np.random.rand(48, 48, 3).astype(np.float32)])
    assert len(caps) == 1
    assert isinstance(caps[0], str)
