"""Patch / positional / timestep embeddings for the MMDiT.

Equivalent surface to what the torch reference pulls from diffusers
(PatchEmbed, CombinedTimestepTextProjEmbeddings — reference
model_dit4sr/transformer_sd3.py:87-98), rebuilt for TPU:

  * patchify is a reshape + one big Linear over (p*p*C) instead of a strided
    conv — identical math, feeds the MXU as a single [B*N, p*p*C] x
    [p*p*C, D] matmul;
  * the 2D sincos table is precomputed in fp32 at module setup over the
    pos_embed_max_size grid and center-cropped per call (static shapes).
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn


def sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """Standard MAE-style 1D sin-cos embedding: [sin(pos*w), cos(pos*w)]."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_2d(embed_dim: int, grid_size: int, base_size: int) -> np.ndarray:
    """2D sin-cos table over a (grid_size, grid_size) patch grid.

    Matches the diffusers convention the SD3.5 checkpoints were trained with
    (positions rescaled by base_size/grid_size; x-coordinate grid fills the
    first half of the channel dim): returns (grid_size**2, embed_dim) fp32.
    """
    scale = base_size / grid_size
    coords = np.arange(grid_size, dtype=np.float64) * scale
    # xy-indexed meshgrid: wx varies fastest along the flattened row order
    wx, hy = np.meshgrid(coords, coords)  # each (grid, grid), row-major h, col w
    emb_x = sincos_1d(embed_dim // 2, wx)
    emb_y = sincos_1d(embed_dim // 2, hy)
    return np.concatenate([emb_x, emb_y], axis=1).astype(np.float32)


def patchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """NHWC image -> (B, N, p*p*C) tokens in row-major patch order."""
    return rearrange(
        x, "b (h p) (w q) c -> b (h w) (p q c)", p=patch_size, q=patch_size
    )


def unpatchify(x: jnp.ndarray, h: int, w: int, patch_size: int) -> jnp.ndarray:
    """(B, N, p*p*C) tokens -> NHWC image. Inverse of the reference's einops
    unpatchify 'b (H W) (pH pW d) -> b d (H pH) (W pW)' (transformer_sd3.py:391),
    but emitting NHWC."""
    return rearrange(
        x, "b (h w) (p q c) -> b (h p) (w q) c", h=h, w=w, p=patch_size, q=patch_size
    )


class PatchEmbed(nn.Module):
    """Patchify + linear projection + cropped 2D sincos position embedding.

    The same module embeds every image-token stream (hq latent, LQ control
    latent, OCR copy) — the reference reuses one PatchEmbed for all streams
    (transformer_sd3.py:326-331).
    """

    patch_size: int
    in_channels: int
    embed_dim: int
    pos_embed_max_size: int
    base_size: int  # sample_size // patch_size
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        self.proj = nn.Dense(
            self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="proj"
        )
        self.pos_table = jnp.asarray(
            sincos_2d(self.embed_dim, self.pos_embed_max_size, self.base_size)
        )

    def cropped_pos_embed(self, h: int, w: int) -> jnp.ndarray:
        """Center-crop the (max, max) table to an (h, w) patch grid."""
        m = self.pos_embed_max_size
        top = (m - h) // 2
        left = (m - w) // 2
        table = self.pos_table.reshape(m, m, self.embed_dim)
        return table[top : top + h, left : left + w].reshape(1, h * w, self.embed_dim)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        _, H, W, _ = x.shape
        h, w = H // self.patch_size, W // self.patch_size
        tokens = self.proj(patchify(x, self.patch_size))
        pos = self.cropped_pos_embed(h, w)
        return (tokens + pos.astype(tokens.dtype)).astype(self.dtype)


def timestep_sinusoidal(t: jnp.ndarray, dim: int = 256) -> jnp.ndarray:
    """SD3 timestep featurization: 256-dim sinusoid, cos-first, freq shift 0.

    `t` is the flow-matching timestep in [0, 1000] (= sigma * 1000)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class MLPEmbedder(nn.Module):
    """linear -> silu -> linear, the shape of both TimestepEmbedding and
    PixArtAlphaTextProjection in the reference stack."""

    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_1",
        )(x)
        x = nn.silu(x)
        return nn.Dense(
            self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_2",
        )(x)


class TimeTextEmbed(nn.Module):
    """CombinedTimestepTextProjEmbeddings: sinusoid(t) -> MLP, pooled text ->
    MLP, summed (reference transformer_sd3.py:95-97)."""

    embedding_dim: int
    pooled_projection_dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, timestep: jnp.ndarray, pooled: jnp.ndarray) -> jnp.ndarray:
        t_feat = timestep_sinusoidal(timestep, 256)
        t_emb = MLPEmbedder(
            self.embedding_dim, self.embedding_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="timestep_embedder",
        )(t_feat.astype(self.dtype))
        p_emb = MLPEmbedder(
            self.embedding_dim, self.embedding_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="text_embedder",
        )(pooled.astype(self.dtype))
        return t_emb + p_emb
