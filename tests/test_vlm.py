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
    """A complete local HF image-text checkpoint at toy size (the shipped
    fixture helper: wordpiece vocab + Blip processor + random-init
    BlipForConditionalGeneration)."""
    pytest.importorskip("torch")
    from dit4sr_tpu.text.vlm import save_tiny_vlm_checkpoint

    return save_tiny_vlm_checkpoint(str(tmp_path_factory.mktemp("tiny_vlm")))


@pytest.mark.slow
def test_caption_real_hf_invocation(tiny_vlm_ckpt):
    """End-to-end through AutoProcessor + AutoModelForVision2Seq.generate —
    the exact code path a real LLaVA/Qwen-VL checkpoint takes."""
    agent = CaptionAgent(model_path=tiny_vlm_ckpt, question="a photo")
    caps = agent.caption([np.random.rand(48, 48, 3).astype(np.float32)])
    assert len(caps) == 1
    assert isinstance(caps[0], str)


@pytest.mark.slow
def test_vlm_correction_mid_sampling(tiny_vlm_ckpt):
    """The Qwen-VL analogue demonstrated IN the sampling loop: the
    OCR-guided sampler decodes a preview image at correction steps and a
    real HF vision2seq model consumes (preview, words) through generate —
    reference pipeline_dit4sr.py:1288-1379."""
    import jax
    import jax.numpy as jnp

    from dit4sr_tpu.config import (
        SamplerConfig, SchedulerConfig, mmdit_tiny, vae_tiny,
    )
    from dit4sr_tpu.config import testr_tiny as make_testr_tiny
    from dit4sr_tpu.models.mmdit import init_mmdit
    from dit4sr_tpu.models.testr.detector import TextSpotter
    from dit4sr_tpu.models.vae import AutoencoderKL
    from dit4sr_tpu.pipelines.ocr_guided import OCRGuidedSampler
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline
    from dit4sr_tpu.text.vlm import VLMCorrectionAgent

    mcfg = mmdit_tiny(
        in_channels=4, out_channels=4, sample_size=8,
        feat_extract_layers=(0, 1), feat_extract="hq+control",
    )
    vcfg = vae_tiny()
    mmdit, mparams = init_mmdit(jax.random.PRNGKey(0), mcfg, text_len=8)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), vcfg.dtype))
    testr_cfg = make_testr_tiny(
        num_feature_levels=2, num_dit_layers=2, dit_dim=mcfg.inner_dim // 4 * 2,
    )
    spotter = TextSpotter(testr_cfg, feat_hw=(4, 4))
    tparams = spotter.init(
        jax.random.PRNGKey(2), jnp.zeros((2, 1, 4, 4, testr_cfg.dit_dim))
    )
    pipe = SRPipeline(
        mmdit, vae, mcfg, vcfg, SchedulerConfig(),
        SamplerConfig(num_inference_steps=3, align_method="nofix"),
    )

    def encode_fn(prompts):
        rng = np.random.default_rng(1)
        return (
            jnp.asarray(rng.normal(size=(len(prompts), 8, mcfg.joint_attention_dim)),
                        jnp.float32),
            jnp.asarray(rng.normal(size=(len(prompts), mcfg.pooled_projection_dim)),
                        jnp.float32),
        )

    seen = []
    agent = VLMCorrectionAgent(model_path=tiny_vlm_ckpt)

    def correct_fn(words, step, image=None):
        seen.append((step, None if image is None else image.shape))
        # force a nonempty word list so the VLM generate path always runs
        return agent(words or ["SIGN"], step, image=image)

    sampler = OCRGuidedSampler(
        pipe, spotter, encode_fn,
        correct_fn=correct_fn, correct_steps=(0, 1),
        correct_with_image=True, threshold=0.0,
    )
    params = {"mmdit": mparams, "vae": vparams, "testr": tparams}
    lq = jnp.asarray(np.random.default_rng(5).uniform(size=(1, 32, 32, 3)),
                     jnp.float32)
    img = sampler(params, jax.random.PRNGKey(3), lq, ["p"])
    assert np.isfinite(np.asarray(img)).all()
    # corrections ran with decoded previews at both steps
    assert [s for s, _ in seen] == [0, 1]
    assert all(shape == (32, 32, 3) for _, shape in seen)
