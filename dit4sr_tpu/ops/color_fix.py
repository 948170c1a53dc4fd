"""Color-transfer post-processing: AdaIN and wavelet color fix in JAX.

Equivalent of the reference's utils/wavelet_color_fix.py (adain :14-27,
wavelet :30-43,75-121): after SR, low-frequency color statistics are
transplanted from the (upscaled) LQ input onto the generated output.

All images are NHWC float in [0, 1] (the reference works on PIL -> [-1,1]
tensors; the math is affine-equivalent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def adain_color_fix(target: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """Match per-channel mean/std of `target` to `source` (NHWC)."""
    t32, s32 = target.astype(jnp.float32), source.astype(jnp.float32)
    t_mean = jnp.mean(t32, axis=(1, 2), keepdims=True)
    t_std = jnp.std(t32, axis=(1, 2), keepdims=True)
    s_mean = jnp.mean(s32, axis=(1, 2), keepdims=True)
    s_std = jnp.std(s32, axis=(1, 2), keepdims=True)
    out = (t32 - t_mean) / (t_std + 1e-5) * s_std + s_mean
    return jnp.clip(out, 0.0, 1.0).astype(target.dtype)


def _dilated_blur(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """3x3 binomial blur with dilation `radius` (à trous wavelet step),
    depthwise over NHWC."""
    k1 = jnp.asarray([1.0, 2.0, 1.0], jnp.float32) / 4.0
    kernel = jnp.outer(k1, k1)  # (3, 3)
    c = x.shape[-1]
    kernel = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
    pad = radius
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        kernel,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(radius, radius),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def wavelet_decomposition(x: jnp.ndarray, levels: int = 5):
    """À trous wavelet split into (high_freq, low_freq)."""
    high = jnp.zeros_like(x, dtype=jnp.float32)
    low = x.astype(jnp.float32)
    for i in range(levels):
        radius = 2 ** i
        blurred = _dilated_blur(low, radius)
        high = high + (low - blurred)
        low = blurred
    return high, low


def wavelet_color_fix(
    target: jnp.ndarray, source: jnp.ndarray, levels: int = 5
) -> jnp.ndarray:
    """Output's high frequencies + LQ source's low frequencies (NHWC)."""
    t_high, _ = wavelet_decomposition(target, levels)
    _, s_low = wavelet_decomposition(source, levels)
    out = t_high + s_low
    return jnp.clip(out, 0.0, 1.0).astype(target.dtype)


def apply_color_fix(target, source, method: str):
    if method == "adain":
        return adain_color_fix(target, source)
    if method == "wavelet":
        return wavelet_color_fix(target, source)
    if method in ("nofix", "none", None):
        return target
    raise ValueError(f"unknown align_method: {method}")
