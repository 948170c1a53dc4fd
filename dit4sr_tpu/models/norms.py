"""Adaptive layer norms and RMS qk-norm for the MMDiT.

Equivalents of the diffusers modules the reference consumes
(AdaLayerNormZero, SD35AdaLayerNormZeroX, AdaLayerNormContinuous, RMSNorm —
reference model_dit4sr/attention.py:25). LayerNorm statistics are computed in
fp32 regardless of the compute dtype; modulation projections keep the
checkpoint layout (one Dense of 6x/9x/2x dim applied to silu(temb)).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Non-affine LayerNorm with fp32 statistics."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def bcast_mod(v: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Broadcast a (B, D) modulation vector against a (B, ..., D) tensor of
    arbitrary rank (the MMDiT carries streams on their own axis)."""
    return v.reshape(v.shape[0], *(1,) * (ndim - 2), v.shape[-1])


class RMSNorm(nn.Module):
    """RMSNorm with learned scale over the trailing dim (qk-norm in SD3.5)."""

    dim: int
    eps: float = 1e-6
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.dim,), self.param_dtype)
        x32 = x.astype(jnp.float32)
        rms = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps)
        return (x32 * rms).astype(x.dtype) * scale.astype(x.dtype)


class AdaLayerNormZero(nn.Module):
    """AdaLN-Zero: temb -> silu -> Dense(6*dim); returns the modulated input
    plus (gate_msa, shift_mlp, scale_mlp, gate_mlp)."""

    dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray):
        mod = nn.Dense(
            6 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear"
        )(nn.silu(temb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            mod, 6, axis=-1
        )
        normed = layer_norm(x)
        b = lambda v: bcast_mod(v, x.ndim)  # noqa: E731
        out = normed * (1 + b(scale_msa)) + b(shift_msa)
        return out, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroX(nn.Module):
    """SD3.5 dual-attention AdaLN (SD35AdaLayerNormZeroX): 9 modulation
    chunks; the extra (shift2, scale2, gate2) drive the second attention."""

    dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray):
        mod = nn.Dense(
            9 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear"
        )(nn.silu(temb))
        (
            shift_msa, scale_msa, gate_msa,
            shift_mlp, scale_mlp, gate_mlp,
            shift_msa2, scale_msa2, gate_msa2,
        ) = jnp.split(mod, 9, axis=-1)
        normed = layer_norm(x)
        b = lambda v: bcast_mod(v, x.ndim)  # noqa: E731
        out = normed * (1 + b(scale_msa)) + b(shift_msa)
        out2 = normed * (1 + b(scale_msa2)) + b(shift_msa2)
        return out, gate_msa, shift_mlp, scale_mlp, gate_mlp, out2, gate_msa2


class AdaLayerNormContinuous(nn.Module):
    """temb -> silu -> Dense(2*dim) -> (scale, shift); norm(x)*(1+scale)+shift.
    Used for the final norm and the last block's context norm."""

    dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(
            2 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear"
        )(nn.silu(temb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        return (
            layer_norm(x) * (1 + bcast_mod(scale, x.ndim)) + bcast_mod(shift, x.ndim)
        )
