"""End-to-end tiny-pipeline tests: LQ image -> SR image under jit."""

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import (
    SamplerConfig,
    SchedulerConfig,
    mmdit_tiny,
    vae_tiny,
)
from dit4sr_tpu.models.mmdit import init_mmdit
from dit4sr_tpu.models.vae import AutoencoderKL
from dit4sr_tpu.ops.color_fix import adain_color_fix, wavelet_color_fix
from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline, bicubic_upscale

TEXT_LEN = 8


def _pipeline(sampler_kw=None):
    mcfg = mmdit_tiny(in_channels=4, out_channels=4, sample_size=8)
    vcfg = vae_tiny()
    mmdit, mparams = init_mmdit(jax.random.PRNGKey(0), mcfg, text_len=TEXT_LEN)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), vcfg.dtype))
    scfg = SamplerConfig(
        num_inference_steps=2, align_method="adain", **(sampler_kw or {})
    )
    pipe = SRPipeline(mmdit, vae, mcfg, vcfg, SchedulerConfig(), scfg)
    return pipe, {"mmdit": mparams, "vae": vparams}


def _text_inputs(b=1):
    rng = np.random.default_rng(0)
    txt = jnp.asarray(rng.normal(size=(b, TEXT_LEN, 24)), jnp.float32)
    pool = jnp.asarray(rng.normal(size=(b, 16)), jnp.float32)
    return txt, pool


def test_end_to_end_shapes_and_determinism():
    pipe, params = _pipeline()
    txt, pool = _text_inputs()
    lq = jnp.asarray(np.random.default_rng(2).uniform(size=(1, 32, 32, 3)), jnp.float32)
    fn = pipe.jit()
    out1 = fn(params, jax.random.PRNGKey(42), lq, txt, pool)
    out2 = fn(params, jax.random.PRNGKey(42), lq, txt, pool)
    assert out1.shape == (1, 32, 32, 3)
    assert float(out1.min()) >= 0.0 and float(out1.max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_lr_start_point():
    pipe, params = _pipeline({"start_point": "lr"})
    txt, pool = _text_inputs()
    lq = jnp.asarray(np.random.default_rng(2).uniform(size=(1, 32, 32, 3)), jnp.float32)
    out = pipe(params, jax.random.PRNGKey(0), lq, txt, pool)
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_path():
    pipe, params = _pipeline({"guidance_scale": 3.0})
    txt, pool = _text_inputs()
    lq = jnp.asarray(np.random.default_rng(2).uniform(size=(1, 32, 32, 3)), jnp.float32)
    out = pipe(
        params, jax.random.PRNGKey(0), lq, txt, pool,
        neg_text_embeds=jnp.zeros_like(txt), neg_pooled_embeds=jnp.zeros_like(pool),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_prompt_feedback_loop_matches_scan_when_static():
    """Host-loop sampler with constant prompts must equal the scan sampler."""
    pipe, params = _pipeline()
    txt, pool = _text_inputs()
    lq = jnp.asarray(np.random.default_rng(2).uniform(size=(1, 32, 32, 3)), jnp.float32)
    out_scan = pipe(params, jax.random.PRNGKey(7), lq, txt, pool)
    out_host = pipe.sample_with_prompt_feedback(
        params, jax.random.PRNGKey(7), lq, lambda i, ocr: (txt, pool)
    )
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_host), atol=1e-5
    )


def test_color_fix_ops():
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    src = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)) * 0.5, jnp.float32)
    fixed = adain_color_fix(tgt, src)
    np.testing.assert_allclose(
        np.asarray(fixed.mean(axis=(1, 2))), np.asarray(src.mean(axis=(1, 2))),
        atol=0.05,
    )
    wfixed = wavelet_color_fix(tgt, src)
    assert wfixed.shape == tgt.shape
    assert np.isfinite(np.asarray(wfixed)).all()


def test_bicubic_upscale():
    lq = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 8, 8, 3)), jnp.float32)
    up = bicubic_upscale(lq, 4)
    assert up.shape == (1, 32, 32, 3)
    assert float(up.min()) >= 0.0 and float(up.max()) <= 1.0


def test_cfg_host_loop_and_tiled_paths():
    """CFG must work on the host-loop and tiled paths too (round-1 ADVICE:
    these crashed at trace time with jnp.concatenate([None, ...]))."""
    pipe, params = _pipeline({"guidance_scale": 3.0, "latent_tiled_size": 4,
                              "latent_tiled_overlap": 2})
    txt, pool = _text_inputs()
    neg_t, neg_p = jnp.zeros_like(txt), jnp.zeros_like(pool)
    lq = jnp.asarray(
        np.random.default_rng(2).uniform(size=(1, 32, 32, 3)), jnp.float32
    )

    out_scan = pipe(params, jax.random.PRNGKey(7), lq, txt, pool,
                    neg_text_embeds=neg_t, neg_pooled_embeds=neg_p)
    out_host = pipe.sample_with_prompt_feedback(
        params, jax.random.PRNGKey(7), lq, lambda i, ocr: (txt, pool),
        neg_text_embeds=neg_t, neg_pooled_embeds=neg_p,
    )
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_host), atol=1e-5
    )

    out_tiled = pipe.call_tiled(
        params, jax.random.PRNGKey(7), lq, txt, pool,
        neg_text_embeds=neg_t, neg_pooled_embeds=neg_p,
    )
    assert np.isfinite(np.asarray(out_tiled)).all()


def test_cfg_without_neg_embeds_raises():
    pipe, params = _pipeline({"guidance_scale": 3.0})
    txt, pool = _text_inputs()
    lq = jnp.asarray(
        np.random.default_rng(2).uniform(size=(1, 32, 32, 3)), jnp.float32
    )
    import pytest

    with pytest.raises(ValueError, match="neg_text_embeds"):
        pipe(params, jax.random.PRNGKey(0), lq, txt, pool)
