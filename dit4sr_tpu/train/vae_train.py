"""Minimal AutoencoderKL reconstruction trainer.

The reference never trains its VAE (it ships SD3.5's, initialize.py:311) —
this exists so the framework can produce a WORKING autoencoder with zero
weight assets: the self-contained quality probe (scripts/quality_probe.py)
trains a small VAE on synthetic text scenes, then measures end-to-end SR
quality through it. Objective: pixel MSE + tiny KL (the standard VAE-for-
diffusion recipe minus the adversarial/perceptual terms, which need
pretrained discriminator/VGG weights we don't have).

Also provides `measure_latent_stats` to calibrate VAEConfig.scaling_factor /
shift_factor for a freshly trained VAE — diffusion training assumes unit-ish
latent scale (the reference inherits SD3.5's 1.5305/0.0609 constants).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dit4sr_tpu.config import VAEConfig
from dit4sr_tpu.models.vae import AutoencoderKL


def make_vae_train_step(vae: AutoencoderKL, lr: float = 1e-3,
                        kl_weight: float = 1e-6):
    """Returns (tx, jitted step). step(params, opt_state, rng, images) ->
    (params, opt_state, metrics)."""
    tx = optax.adamw(lr, b1=0.9, b2=0.99)

    def loss_fn(params, rng, x):
        recon, mean, logvar = vae.apply(params, x, rng)
        mean = mean.astype(jnp.float32)
        logvar = logvar.astype(jnp.float32)
        mse = jnp.mean((recon.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        kl = 0.5 * jnp.mean(mean**2 + jnp.exp(logvar) - 1.0 - logvar)
        return mse + kl_weight * kl, (mse, kl)

    @jax.jit
    def step(params, opt_state, rng, x):
        (loss, (mse, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rng, x
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"vae_loss": loss, "vae_mse": mse, "vae_kl": kl}

    return tx, step


def train_vae(
    rng: jax.Array,
    cfg: VAEConfig,
    images: np.ndarray,          # (N, H, W, 3) float32 [0,1]
    steps: int,
    batch_size: int = 8,
    lr: float = 1e-3,
    log_every: int = 100,
    logger=None,
):
    """Train from scratch on an in-memory image bank; returns params."""
    vae = AutoencoderKL(cfg)
    params = vae.init(rng, jnp.zeros((1,) + images.shape[1:], cfg.dtype))
    tx, step = make_vae_train_step(vae, lr=lr)
    opt_state = jax.jit(tx.init)(params)
    np_rng = np.random.default_rng(0)
    for i in range(steps):
        idx = np_rng.integers(0, len(images), batch_size)
        # the SR pipeline feeds the VAE [-1, 1] (encode_image); train there
        x = jnp.asarray(images[idx], cfg.dtype) * 2.0 - 1.0
        params, opt_state, metrics = step(
            params, opt_state, jax.random.fold_in(rng, i), x
        )
        if logger is not None and (i % log_every == 0 or i == steps - 1):
            logger.log(i, metrics)
    return params


def measure_latent_stats(
    cfg: VAEConfig, params, images: np.ndarray, rng: jax.Array
) -> Tuple[float, float]:
    """(scaling_factor, shift_factor) so scale_latent() yields ~N(0,1):
    scaling = 1/std(latent mean), shift = mean(latent mean)."""
    vae = AutoencoderKL(cfg)

    @jax.jit
    def enc(p, x):
        mean, _ = vae.apply(p, x, method=AutoencoderKL.encode)
        return mean

    zs = enc(params, jnp.asarray(images, cfg.dtype) * 2.0 - 1.0)
    z = np.asarray(zs, np.float32)
    return float(1.0 / (z.std() + 1e-6)), float(z.mean())
