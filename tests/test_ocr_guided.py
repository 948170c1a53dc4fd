"""OCR-guided sampling loop: end-to-end tiny run with prompt feedback."""

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import (
    SamplerConfig,
    SchedulerConfig,
    mmdit_tiny,
    vae_tiny,
)
from dit4sr_tpu.config import testr_tiny as make_testr_tiny
from dit4sr_tpu.models.mmdit import init_mmdit
from dit4sr_tpu.models.testr.detector import TextSpotter
from dit4sr_tpu.models.vae import AutoencoderKL
from dit4sr_tpu.pipelines.ocr_guided import OCRGuidedSampler
from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline

TEXT_LEN = 8


def test_ocr_guided_sampling_runs():
    mcfg = mmdit_tiny(
        in_channels=4, out_channels=4, sample_size=8,
        feat_extract_layers=(0, 1), feat_extract="hq+control",
    )
    vcfg = vae_tiny()
    mmdit, mparams = init_mmdit(jax.random.PRNGKey(0), mcfg, text_len=TEXT_LEN)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), vcfg.dtype))

    # hq+control -> 2 streams; latent 4x4 -> token grid 2x2 -> feat maps 4x4
    testr_cfg = make_testr_tiny(
        num_feature_levels=2, num_dit_layers=2, dit_dim=mcfg.inner_dim // 4 * 2,
    )
    spotter = TextSpotter(testr_cfg, feat_hw=(4, 4))
    feats0 = jnp.zeros((2, 1, 4, 4, testr_cfg.dit_dim), jnp.float32)
    tparams = spotter.init(jax.random.PRNGKey(2), feats0)

    pipe = SRPipeline(
        mmdit, vae, mcfg, vcfg, SchedulerConfig(),
        SamplerConfig(num_inference_steps=3, align_method="nofix"),
    )

    calls = []

    def encode_prompt_fn(prompts):
        calls.append(list(prompts))
        rng = np.random.default_rng(len(calls))
        return (
            jnp.asarray(rng.normal(size=(len(prompts), TEXT_LEN, mcfg.joint_attention_dim)), jnp.float32),
            jnp.asarray(rng.normal(size=(len(prompts), mcfg.pooled_projection_dim)), jnp.float32),
        )

    sampler = OCRGuidedSampler(pipe, spotter, encode_prompt_fn)
    params = {"mmdit": mparams, "vae": vparams, "testr": tparams}
    lq = jnp.asarray(np.random.default_rng(5).uniform(size=(1, 32, 32, 3)), jnp.float32)

    img, ocr_log = sampler(
        params, jax.random.PRNGKey(3), lq, ["initial prompt"], return_ocr_log=True
    )
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()
    # prompt re-encoded after each non-final step: 1 initial + 2 feedback
    assert len(calls) == 3
    assert len(ocr_log) == 2
    # ocr log contains per-step decoded words (possibly empty) and scores
    assert ocr_log[0].scores.shape == (1, testr_cfg.num_queries)


def test_spot_every_cadence_matches_per_step_latents():
    """spot_every > 1 runs a cheaper no-extraction step between spotting
    steps. When no words are ever kept (fixed prompts throughout), the
    latent trajectory must be IDENTICAL to per-step spotting — the plain
    step is the same math minus feature extraction."""
    mcfg = mmdit_tiny(
        in_channels=4, out_channels=4, sample_size=8,
        feat_extract_layers=(0, 1), feat_extract="hq+control",
    )
    vcfg = vae_tiny()
    mmdit, mparams = init_mmdit(jax.random.PRNGKey(0), mcfg, text_len=TEXT_LEN)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), vcfg.dtype))
    testr_cfg = make_testr_tiny(
        num_feature_levels=2, num_dit_layers=2, dit_dim=mcfg.inner_dim // 4 * 2,
    )
    spotter = TextSpotter(testr_cfg, feat_hw=(4, 4))
    feats0 = jnp.zeros((2, 1, 4, 4, testr_cfg.dit_dim), jnp.float32)
    tparams = spotter.init(jax.random.PRNGKey(2), feats0)
    pipe = SRPipeline(
        mmdit, vae, mcfg, vcfg, SchedulerConfig(),
        SamplerConfig(num_inference_steps=4, align_method="nofix"),
    )

    def encode_fixed(prompts):
        # deterministic in len only -> re-encodes are bit-identical, so the
        # trajectory difference can only come from the step math itself
        rng = np.random.default_rng(7)
        return (
            jnp.asarray(rng.normal(size=(len(prompts), TEXT_LEN,
                                         mcfg.joint_attention_dim)), jnp.float32),
            jnp.asarray(rng.normal(size=(len(prompts),
                                         mcfg.pooled_projection_dim)), jnp.float32),
        )

    params = {"mmdit": mparams, "vae": vparams, "testr": tparams}
    lq = jnp.asarray(np.random.default_rng(5).uniform(size=(1, 32, 32, 3)),
                     jnp.float32)
    # threshold=1.1: nothing kept, prompts never rewritten
    s1 = OCRGuidedSampler(pipe, spotter, encode_fixed, threshold=1.1)
    s3 = OCRGuidedSampler(pipe, spotter, encode_fixed, threshold=1.1,
                          spot_every=3)
    img1 = s1(params, jax.random.PRNGKey(3), lq, ["p"])
    img3 = s3(params, jax.random.PRNGKey(3), lq, ["p"])
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img3),
                               rtol=0, atol=0)


def test_ocr_guided_cfg_runs():
    """TSM with CFG (the reference's val configs run guidance > 1 with TSM;
    round-1 silently ignored guidance_scale on this path)."""
    mcfg = mmdit_tiny(
        in_channels=4, out_channels=4, sample_size=8,
        feat_extract_layers=(0, 1), feat_extract="hq+control",
    )
    vcfg = vae_tiny()
    mmdit, mparams = init_mmdit(jax.random.PRNGKey(0), mcfg, text_len=TEXT_LEN)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), vcfg.dtype))
    testr_cfg = make_testr_tiny(
        num_feature_levels=2, num_dit_layers=2, dit_dim=mcfg.inner_dim // 4 * 2,
    )
    spotter = TextSpotter(testr_cfg, feat_hw=(4, 4))
    feats0 = jnp.zeros((2, 1, 4, 4, testr_cfg.dit_dim), jnp.float32)
    tparams = spotter.init(jax.random.PRNGKey(2), feats0)

    pipe = SRPipeline(
        mmdit, vae, mcfg, vcfg, SchedulerConfig(),
        SamplerConfig(
            num_inference_steps=2, align_method="nofix", guidance_scale=8.0
        ),
    )

    def encode_prompt_fn(prompts):
        rng = np.random.default_rng(sum(len(p) for p in prompts) + 1)
        return (
            jnp.asarray(rng.normal(size=(len(prompts), TEXT_LEN, mcfg.joint_attention_dim)), jnp.float32),
            jnp.asarray(rng.normal(size=(len(prompts), mcfg.pooled_projection_dim)), jnp.float32),
        )

    sampler = OCRGuidedSampler(pipe, spotter, encode_prompt_fn)
    params = {"mmdit": mparams, "vae": vparams, "testr": tparams}
    lq = jnp.asarray(np.random.default_rng(5).uniform(size=(1, 32, 32, 3)), jnp.float32)
    img = sampler(params, jax.random.PRNGKey(3), lq, ["a sign"])
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_vote_accumulates_and_filters_one_off_words():
    """Temporal voting (vote_frac): a word injected at every spotting step
    must survive into the final belief; a word injected once must be voted
    out once enough steps accumulate; belief is ranked by vote count."""
    mcfg = mmdit_tiny(
        in_channels=4, out_channels=4, sample_size=8,
        feat_extract_layers=(0, 1), feat_extract="hq+control",
    )
    vcfg = vae_tiny()
    mmdit, mparams = init_mmdit(jax.random.PRNGKey(0), mcfg, text_len=TEXT_LEN)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), vcfg.dtype))
    testr_cfg = make_testr_tiny(
        num_feature_levels=2, num_dit_layers=2, dit_dim=mcfg.inner_dim // 4 * 2,
    )
    spotter = TextSpotter(testr_cfg, feat_hw=(4, 4))
    feats0 = jnp.zeros((2, 1, 4, 4, testr_cfg.dit_dim), jnp.float32)
    tparams = spotter.init(jax.random.PRNGKey(2), feats0)
    n = 6
    pipe = SRPipeline(
        mmdit, vae, mcfg, vcfg, SchedulerConfig(),
        SamplerConfig(num_inference_steps=n, align_method="nofix"),
    )

    prompts_seen = []

    def encode_fixed(prompts):
        prompts_seen.append(list(prompts))
        rng = np.random.default_rng(7)
        return (
            jnp.asarray(rng.normal(size=(len(prompts), TEXT_LEN,
                                         mcfg.joint_attention_dim)), jnp.float32),
            jnp.asarray(rng.normal(size=(len(prompts),
                                         mcfg.pooled_projection_dim)), jnp.float32),
        )

    # threshold=1.1 keeps nothing from the spotter; correct_fn injects a
    # controlled read per step: REAL every step, junk<i> once each
    inject = lambda words, i: ["REAL", f"junk{i}"]
    sampler = OCRGuidedSampler(
        pipe, spotter, encode_fixed, caption_style="tag",
        correct_fn=inject, correct_steps=tuple(range(n)),
        threshold=1.1, vote_frac=0.5,
    )
    params = {"mmdit": mparams, "vae": vparams, "testr": tparams}
    lq = jnp.asarray(np.random.default_rng(5).uniform(size=(1, 32, 32, 3)),
                     jnp.float32)
    _, log = sampler(params, jax.random.PRNGKey(3), lq, ["init"],
                     return_ocr_log=True)
    assert len(log) == n - 1
    # first spotting step: need = max(1, .5*1) = 1 -> both words believed
    assert log[0].voted_texts == [["REAL", "junk0"]]
    # final belief: REAL has n-1 votes, each junk has 1 < 0.5*(n-1)
    assert log[-1].voted_texts == [["REAL"]]
    # the rewritten prompt is built from the belief, not the raw step read
    assert "junk3" not in " ".join(prompts_seen[-1])
    assert "REAL" in " ".join(prompts_seen[-1])

    # vote_topk caps the belief at the K highest-vote words (tie: first seen)
    sampler_k = OCRGuidedSampler(
        pipe, spotter, encode_fixed, caption_style="tag",
        correct_fn=lambda words, i: ["AAA", "BBB"] if i else ["AAA"],
        correct_steps=tuple(range(n)),
        threshold=1.1, vote_frac=0.15, vote_topk=1,
    )
    _, log_k = sampler_k(params, jax.random.PRNGKey(3), lq, ["init"],
                         return_ocr_log=True)
    # AAA seen every step, BBB from step 1 on -> AAA outranks, cap keeps it
    assert log_k[-1].voted_texts == [["AAA"]]


def test_vote_none_is_reference_parity():
    """vote_frac=None must leave voted_texts unset and prompts per-step."""
    mcfg = mmdit_tiny(
        in_channels=4, out_channels=4, sample_size=8,
        feat_extract_layers=(0, 1), feat_extract="hq+control",
    )
    vcfg = vae_tiny()
    mmdit, mparams = init_mmdit(jax.random.PRNGKey(0), mcfg, text_len=TEXT_LEN)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), vcfg.dtype))
    testr_cfg = make_testr_tiny(
        num_feature_levels=2, num_dit_layers=2, dit_dim=mcfg.inner_dim // 4 * 2,
    )
    spotter = TextSpotter(testr_cfg, feat_hw=(4, 4))
    feats0 = jnp.zeros((2, 1, 4, 4, testr_cfg.dit_dim), jnp.float32)
    tparams = spotter.init(jax.random.PRNGKey(2), feats0)
    pipe = SRPipeline(
        mmdit, vae, mcfg, vcfg, SchedulerConfig(),
        SamplerConfig(num_inference_steps=3, align_method="nofix"),
    )

    def encode_fixed(prompts):
        rng = np.random.default_rng(7)
        return (
            jnp.asarray(rng.normal(size=(len(prompts), TEXT_LEN,
                                         mcfg.joint_attention_dim)), jnp.float32),
            jnp.asarray(rng.normal(size=(len(prompts),
                                         mcfg.pooled_projection_dim)), jnp.float32),
        )

    sampler = OCRGuidedSampler(pipe, spotter, encode_fixed, threshold=1.1)
    params = {"mmdit": mparams, "vae": vparams, "testr": tparams}
    lq = jnp.asarray(np.random.default_rng(5).uniform(size=(1, 32, 32, 3)),
                     jnp.float32)
    _, log = sampler(params, jax.random.PRNGKey(3), lq, ["p"],
                     return_ocr_log=True)
    assert all(r.voted_texts is None for r in log)
