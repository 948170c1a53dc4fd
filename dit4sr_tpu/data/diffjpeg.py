"""Differentiable(-shaped) JPEG round-trip in JAX.

Device-side equivalent of basicsr's DiffJPEG (basicsr/utils/diffjpeg.py:
26-500), used inside the degradation pipeline (dataloaders/utils.py:414,
:479-491; the reference runs it with differentiable=False, i.e. hard
rounding). Pipeline: RGB -> YCbCr, 2x2 chroma subsampling, 8x8 block DCT,
quality-scaled quantization (round), dequantize, inverse DCT, chroma
upsample, RGB.

Quality follows the libjpeg convention:
  factor = 5000/q for q < 50 else 200 - 2q ; table' = clip(round(table *
  factor / 100), 1, 255).

All shapes static; H and W must be multiples of 16. Everything is batched
einsum/reshape — MXU/VPU friendly, no gather.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# standard JPEG luma/chroma quantization tables (Annex K)
Y_TABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.float32,
)
C_TABLE = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    np.float32,
)


def _dct_matrix() -> np.ndarray:
    """8-point DCT-II basis, orthonormal (D @ x gives DCT coefficients)."""
    d = np.zeros((8, 8), np.float64)
    for k in range(8):
        for n in range(8):
            d[k, n] = np.cos(np.pi * k * (2 * n + 1) / 16)
    d *= np.sqrt(2.0 / 8.0)
    d[0] *= 1.0 / np.sqrt(2.0)
    return d.astype(np.float32)


_DCT = _dct_matrix()


def quality_to_factor(quality: jnp.ndarray) -> jnp.ndarray:
    """libjpeg quality scaling; quality in [1, 100]."""
    return jnp.where(quality < 50, 5000.0 / quality, 200.0 - 2.0 * quality) / 100.0


def _blockify(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) -> (B, H/8*W/8, 8, 8)."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, -1, 8, 8)


def _unblockify(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h, w)


def _dct2(blocks: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("ij,bnjk,lk->bnil", _DCT, blocks, _DCT)


def _idct2(coefs: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("ji,bnjk,kl->bnil", _DCT, coefs, _DCT)


def rgb_to_ycbcr(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC RGB [0,255] -> YCbCr [0,255] (JFIF)."""
    m = jnp.asarray(
        [
            [0.299, 0.587, 0.114],
            [-0.168736, -0.331264, 0.5],
            [0.5, -0.418688, -0.081312],
        ],
        x.dtype,
    )
    out = jnp.einsum("bhwc,dc->bhwd", x, m)
    return out + jnp.asarray([0.0, 128.0, 128.0], x.dtype)


def ycbcr_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    x = x - jnp.asarray([0.0, 128.0, 128.0], x.dtype)
    m = jnp.asarray(
        [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]],
        x.dtype,
    )
    return jnp.einsum("bhwc,dc->bhwd", x, m)


def jpeg_compress(
    image: jnp.ndarray, quality: jnp.ndarray, differentiable: bool = False
) -> jnp.ndarray:
    """JPEG round-trip. image: (B, H, W, 3) in [0,1]; quality: (B,) in [1,100].

    differentiable=True uses the cubic soft-rounding from the DiffJPEG paper
    (round(x) + (x - round(x))^3); the reference uses hard rounding at train
    time (dataloaders/utils.py:366 constructs DiffJPEG(differentiable=False)).
    """
    b, h, w, _ = image.shape
    assert h % 16 == 0 and w % 16 == 0, "JPEG needs H, W multiples of 16"
    x = jnp.clip(image.astype(jnp.float32), 0.0, 1.0) * 255.0
    ycc = rgb_to_ycbcr(x)
    y = ycc[..., 0]
    cb = ycc[..., 1]
    cr = ycc[..., 2]

    # 4:2:0 chroma subsampling (2x2 mean)
    def down(c):
        return c.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    cb_d, cr_d = down(cb), down(cr)

    factor = quality_to_factor(quality)[:, None, None, None]  # (B,1,1,1)

    def roundfn(v):
        r = jnp.round(v)
        if differentiable:
            return r + (v - r) ** 3
        return r

    def code(chan, table):
        blocks = _blockify(chan) - 128.0
        coefs = _dct2(blocks)
        q = jnp.clip(jnp.round(table[None, None] * factor), 1.0, 255.0)
        quant = roundfn(coefs / q)
        return _idct2(quant * q) + 128.0

    yq = _unblockify(code(y, jnp.asarray(Y_TABLE)), h, w)
    cbq = _unblockify(code(cb_d, jnp.asarray(C_TABLE)), h // 2, w // 2)
    crq = _unblockify(code(cr_d, jnp.asarray(C_TABLE)), h // 2, w // 2)

    def up(c):
        # libjpeg-style "fancy" (triangular) chroma upsampling
        return jax.image.resize(c, (b, h, w), "linear", antialias=False)

    out = jnp.stack([yq, up(cbq), up(crq)], axis=-1)
    return jnp.clip(ycbcr_to_rgb(out) / 255.0, 0.0, 1.0)
