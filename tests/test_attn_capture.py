"""Attention-map visualization harness test."""

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import mmdit_tiny
from dit4sr_tpu.models.mmdit import MMDiT, init_mmdit


def test_attention_capture():
    cfg = mmdit_tiny(capture_attention=True)
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=6)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, 16, 16, cfg.in_channels)), cfg.dtype)
    txt = jnp.asarray(rng.normal(size=(1, 6, cfg.joint_attention_dim)), cfg.dtype)
    pool = jnp.asarray(rng.normal(size=(1, cfg.pooled_projection_dim)), cfg.dtype)
    t = jnp.zeros((1,), jnp.float32)

    (out, _), inter = model.apply(
        params, lat, lat, txt, pool, t, mutable=["intermediates"]
    )
    probs = inter["intermediates"]["blocks_0"]["attn"]["attn_probs"][0]
    n_img = (16 // cfg.patch_size) ** 2
    total = 2 * n_img + 6  # hq + control + text tokens
    assert probs.shape == (1, cfg.num_attention_heads, total, total)
    # rows are probability distributions
    np.testing.assert_allclose(
        np.asarray(probs.sum(-1)), 1.0, rtol=1e-4, atol=1e-4
    )
    # capture must not change the output vs the plain xla path
    cfg2 = mmdit_tiny(capture_attention=False, attn_impl="xla")
    model2 = MMDiT(cfg2)
    out2, _ = model2.apply(params, lat, lat, txt, pool, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)
