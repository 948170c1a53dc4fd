"""MMDiT structural/behavioral tests.

Encodes the reference contracts from SURVEY.md §3.4: token layout, zero-init
control branches acting as identity at init, variant stream counts, feature
extraction shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dit4sr_tpu.config import mmdit_tiny
from dit4sr_tpu.models.mmdit import MMDiT, init_mmdit


def _inputs(cfg, batch=2, size=16, text_len=12, seed=0):
    rng = np.random.default_rng(seed)
    lat = jnp.asarray(rng.normal(size=(batch, size, size, cfg.in_channels)), cfg.dtype)
    ctrl = jnp.asarray(rng.normal(size=(batch, size, size, cfg.in_channels)), cfg.dtype)
    txt = jnp.asarray(
        rng.normal(size=(batch, text_len, cfg.joint_attention_dim)), cfg.dtype
    )
    pool = jnp.asarray(rng.normal(size=(batch, cfg.pooled_projection_dim)), cfg.dtype)
    t = jnp.asarray(rng.uniform(0, 1000, size=(batch,)), jnp.float32)
    return lat, ctrl, txt, pool, t


def test_forward_shape():
    cfg = mmdit_tiny()
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    lat, ctrl, txt, pool, t = _inputs(cfg)
    out, feats = model.apply(params, lat, ctrl, txt, pool, t)
    assert out.shape == lat.shape
    assert feats is None


def test_zero_init_control_is_identity():
    """With zero-init branches, the control stream must not affect the hq
    output at init: two different LQ latents, same noisy latent -> same output
    (the whole point of the zero-init design, attention.py:426-431)."""
    cfg = mmdit_tiny()
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    lat, ctrl, txt, pool, t = _inputs(cfg)
    ctrl2 = ctrl + 3.0
    out1, _ = model.apply(params, lat, ctrl, txt, pool, t)
    out2, _ = model.apply(params, lat, ctrl2, txt, pool, t)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_text_does_affect_output():
    cfg = mmdit_tiny()
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    lat, ctrl, txt, pool, t = _inputs(cfg)
    out1, _ = model.apply(params, lat, ctrl, txt, pool, t)
    out2, _ = model.apply(params, lat, ctrl, txt * 0.5, pool, t)
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


@pytest.mark.parametrize(
    "streams,couplings",
    [
        (("hq", "control", "ocr"), (("control", "hq"), ("ocr", "hq"))),
        (
            ("hq", "control", "ocr"),
            (("control", "hq"), ("ocr", "hq"), ("hq", "ocr")),
        ),
    ],
)
def test_ocr_variants_forward(streams, couplings):
    cfg = mmdit_tiny(streams=streams, ffn_couplings=couplings, feat_extract="ocr")
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    lat, ctrl, txt, pool, t = _inputs(cfg)
    out, _ = model.apply(params, lat, ctrl, txt, pool, t)
    assert out.shape == lat.shape
    # zero-init still holds with three streams
    out2, _ = model.apply(params, lat, ctrl + 1.0, txt, pool, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_feature_extraction_shapes():
    cfg = mmdit_tiny(feat_extract_layers=(0, 1), feat_extract="hq+control")
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    lat, ctrl, txt, pool, t = _inputs(cfg)
    out, feats = model.apply(params, lat, ctrl, txt, pool, t, extract_features=True)
    n_tokens = (16 // cfg.patch_size) ** 2
    # hq+control slice: 2 streams worth of tokens per layer
    assert feats.shape == (2, 2, 2 * n_tokens, cfg.inner_dim)


def test_text_mask_equivalence():
    """Padding text with masked tokens must not change the output."""
    cfg = mmdit_tiny()
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    lat, ctrl, txt, pool, t = _inputs(cfg, text_len=12)
    mask = jnp.ones((2, 12), dtype=bool)
    out_ref, _ = model.apply(params, lat, ctrl, txt, pool, t, text_mask=mask)

    pad = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 4, cfg.joint_attention_dim)),
        cfg.dtype,
    )
    txt_padded = jnp.concatenate([txt, pad], axis=1)
    mask_padded = jnp.concatenate([mask, jnp.zeros((2, 4), bool)], axis=1)
    out_pad, _ = model.apply(params, lat, ctrl, txt_padded, pool, t, text_mask=mask_padded)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_pad), atol=2e-5)


def test_out_proj_surgery():
    cfg = mmdit_tiny()
    _, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    attn = params["params"]["blocks_0"]["attn"]
    np.testing.assert_array_equal(
        np.asarray(attn["to_out"]["kernel"]),
        np.asarray(attn["to_out_control"]["kernel"]),
    )
    # control q/k/v start at zero
    assert float(jnp.abs(attn["to_q_control"]["kernel"]).max()) == 0.0
