"""SD3 AutoencoderKL (16-channel latent) in flax, NHWC.

Rebuild of the VAE the reference loads from stable-diffusion-3.5-medium
(initialize.py:311; encode at train_dit4sr.py:204-214, decode at
pipeline_dit4sr.py:1598-1605). Architecture is the standard SD KL autoencoder:
resnet stacks with GroupNorm(32)+SiLU, stride-2 downsample convs, a single
mid-block self-attention at the bottleneck, nearest-up + conv decoder.

Param names mirror the diffusers checkpoint tree (down_blocks_i/resnets_j/...)
so torch->jax weight conversion (utils/weights.py) is a mechanical rename.

GroupNorm statistics run in fp32. Latent scaling follows the SD3 convention:
  encode: z = (sample - shift_factor) * scaling_factor
  decode: x = decoder(z / scaling_factor + shift_factor)
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dit4sr_tpu.config import VAEConfig


# Trace-time tile-sync state for cross-tile GroupNorm statistic aggregation
# (the reference's vaehook.GroupNormParam, utils/vaehook.py:458-534: every
# tile of an image normalizes with statistics gathered over ALL its tiles,
# so tiles cannot drift in tone/contrast). The reference executes tiles in
# layer-lockstep through a task queue to make this possible; here the tiled
# VAE already stacks every tile into ONE batched call, so a GroupNorm that
# pools its statistics over the tile axis reproduces the behavior with no
# scheduler at all. The flag is consumed at trace time (a static constant of
# the jitted program), set via the `tile_sync_group_norm` context manager
# around the traced apply.
_TILE_SYNC_STACK: list = [(1, None)]


@contextmanager
def tile_sync_group_norm(num_tiles: int, weights=None):
    """Within this context, group_norm pools statistics over the leading
    tile axis: inputs are (T*B, H, W, C) stacked tile-major (tile t of image
    b at row t*B + b, utils/tiling.extract_tiles) and every GroupNorm
    normalizes image b's tiles with their COMMON mean/var.

    `weights` (T,) optionally weights each tile's contribution to the pooled
    statistics — a tile replicated k times (the sharded path's cyclic
    padding) gets weight 1/k so the pooled moments stay EXACTLY those of the
    unpadded tile set."""
    _TILE_SYNC_STACK.append((int(num_tiles), weights))
    try:
        yield
    finally:
        _TILE_SYNC_STACK.pop()


def group_norm(x: jnp.ndarray, num_groups: int, scale, bias, eps=1e-6):
    """GroupNorm over NHWC with fp32 statistics (optionally pooled across
    tiles of the same image — see tile_sync_group_norm)."""
    b, h, w, c = x.shape
    t, tw = _TILE_SYNC_STACK[-1]
    x32 = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    if t > 1 and b % t == 0:
        xt = x32.reshape(t, b // t, h, w, num_groups, c // num_groups)
        if tw is None:
            mean = jnp.mean(xt, axis=(0, 2, 3, 5), keepdims=True)
            var = jnp.var(xt, axis=(0, 2, 3, 5), keepdims=True)
        else:
            w6 = tw.astype(jnp.float32).reshape(t, 1, 1, 1, 1, 1)
            denom = jnp.sum(tw.astype(jnp.float32)) * (h * w * (c // num_groups))
            mean = jnp.sum(xt * w6, axis=(0, 2, 3, 5), keepdims=True) / denom
            var = jnp.sum(
                jnp.square(xt - mean) * w6, axis=(0, 2, 3, 5), keepdims=True
            ) / denom
        xt = (xt - mean) * jax.lax.rsqrt(var + eps)
        x32 = xt.reshape(b, h, w, c)
    else:
        mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(x32, axis=(1, 2, 4), keepdims=True)
        x32 = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    return (x32 * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


class GroupNorm(nn.Module):
    num_groups: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return group_norm(x, self.num_groups, scale, bias)


class ResnetBlock(nn.Module):
    out_channels: int
    num_groups: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda name: nn.Conv(  # noqa: E731
            self.out_channels, (3, 3), padding=1,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        h = GroupNorm(self.num_groups, self.param_dtype, name="norm1")(x)
        h = conv("conv1")(nn.silu(h))
        h = GroupNorm(self.num_groups, self.param_dtype, name="norm2")(h)
        h = conv("conv2")(nn.silu(h))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1),
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="conv_shortcut",
            )(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention at the bottleneck. Routed through
    ops.attention so the 64x64-latent case (4096 tokens) uses the Pallas
    flash kernel on TPU instead of materializing 4096^2 fp32 logits."""

    num_groups: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from dit4sr_tpu.ops.attention import attention

        b, h, w, c = x.shape
        y = GroupNorm(self.num_groups, self.param_dtype, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        dense = lambda name: nn.Dense(  # noqa: E731
            c, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q, k, v = dense("to_q")(y), dense("to_k")(y), dense("to_v")(y)
        out = attention(q[:, None], k[:, None], v[:, None])[:, 0]
        y = dense("to_out")(out.astype(x.dtype))
        return x + y.reshape(b, h, w, c)


class MidBlock(nn.Module):
    num_groups: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = ResnetBlock(c, self.num_groups, self.dtype, self.param_dtype, name="resnets_0")(x)
        x = AttnBlock(self.num_groups, self.dtype, self.param_dtype, name="attentions_0")(x)
        x = ResnetBlock(c, self.num_groups, self.dtype, self.param_dtype, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) -> (B, H/8, W/8, 2*latent)
        cfg = self.cfg
        ch = cfg.block_out_channels
        x = nn.Conv(
            ch[0], (3, 3), padding=1,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="conv_in",
        )(x)
        for i, c in enumerate(ch):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(
                    c, cfg.norm_num_groups, cfg.dtype, cfg.param_dtype,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(x)
            if i < len(ch) - 1:
                # SD uses asymmetric (0,1) padding on the stride-2 downsample
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    c, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name=f"down_blocks_{i}_downsample",
                )(x)
        x = MidBlock(cfg.norm_num_groups, cfg.dtype, cfg.param_dtype, name="mid_block")(x)
        x = GroupNorm(cfg.norm_num_groups, cfg.param_dtype, name="conv_norm_out")(x)
        x = nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="conv_out",
        )(nn.silu(x))
        return x


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):  # (B, h, w, latent) -> (B, 8h, 8w, 3)
        cfg = self.cfg
        ch = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(
            ch[0], (3, 3), padding=1,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="conv_in",
        )(z)
        x = MidBlock(cfg.norm_num_groups, cfg.dtype, cfg.param_dtype, name="mid_block")(x)
        for i, c in enumerate(ch):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock(
                    c, cfg.norm_num_groups, cfg.dtype, cfg.param_dtype,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(x)
            if i < len(ch) - 1:
                b, h, w, cc = x.shape
                x = jax.image.resize(x, (b, 2 * h, 2 * w, cc), "nearest")
                x = nn.Conv(
                    c, (3, 3), padding=1,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name=f"up_blocks_{i}_upsample",
                )(x)
        x = GroupNorm(cfg.norm_num_groups, cfg.param_dtype, name="conv_norm_out")(x)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=1,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="conv_out",
        )(nn.silu(x))
        return x


class AutoencoderKL(nn.Module):
    """encode() returns (mean, logvar); use `sample`/`scale_latent` helpers."""

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z)

    def __call__(self, x, rng: Optional[jax.Array] = None):
        mean, logvar = self.encode(x)
        z = sample_latent(mean, logvar, rng)
        return self.decode(z), mean, logvar


def sample_latent(mean, logvar, rng: Optional[jax.Array] = None):
    if rng is None:
        return mean
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    eps = jax.random.normal(rng, mean.shape, jnp.float32)
    return (mean.astype(jnp.float32) + std * eps).astype(mean.dtype)


def scale_latent(z: jnp.ndarray, cfg: VAEConfig) -> jnp.ndarray:
    """Raw posterior sample -> model space (train_dit4sr.py:207)."""
    return (z - cfg.shift_factor) * cfg.scaling_factor


def unscale_latent(z: jnp.ndarray, cfg: VAEConfig) -> jnp.ndarray:
    """Model space -> decoder input (pipeline_dit4sr.py:1602)."""
    return z / cfg.scaling_factor + cfg.shift_factor
