"""VAE shape/behavior tests (tiny config; 8x spatial compression contract)."""

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import vae_tiny
from dit4sr_tpu.models.vae import AutoencoderKL, scale_latent, unscale_latent


def _vae(cfg):
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, 32, 32, 3), cfg.dtype)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_encode_decode_shapes():
    cfg = vae_tiny()
    model, params = _vae(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)), cfg.dtype)
    mean, logvar = model.apply(params, x, method=AutoencoderKL.encode)
    assert mean.shape == (1, 4, 4, cfg.latent_channels)
    assert logvar.shape == mean.shape
    img = model.apply(params, mean, method=AutoencoderKL.decode)
    assert img.shape == x.shape


def test_latent_scaling_roundtrip():
    cfg = vae_tiny()
    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 4)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(unscale_latent(scale_latent(z, cfg), cfg)),
        np.asarray(z),
        rtol=1e-5,
        atol=1e-6,
    )


def test_stochastic_vs_mode_sampling():
    cfg = vae_tiny()
    model, params = _vae(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)), cfg.dtype)
    out_mode, mean, logvar = model.apply(params, x, rng=None)
    out_rng, _, _ = model.apply(params, x, rng=jax.random.PRNGKey(1))
    assert out_mode.shape == out_rng.shape == x.shape
    assert np.isfinite(np.asarray(out_rng)).all()
