"""Blur-kernel synthesis for Real-ESRGAN-style degradations (host side).

Numpy reimplementation of the published Real-ESRGAN kernel families the
reference pulls from basicsr (basicsr/data/degradations.py: bivariate
Gaussian :85-176, random mixed kernels :337, circular sinc :440), sampled
per-item in the dataset (reference basicsr/data/pho_realesrgan_dataset.py:
224-277) and shipped to the device as (21, 21) tensors.

Kernel math (standard, from the Real-ESRGAN paper):
  * (an)isotropic Gaussian            exp(-0.5 x^T S^-1 x)
  * generalized Gaussian              exp(-0.5 (x^T S^-1 x)^beta)
  * plateau                           1 / (1 + (x^T S^-1 x)^beta)
  * circular low-pass (sinc)          wc * J1(wc r) / (2 pi r)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Sequence, Tuple

import numpy as np
from scipy.special import j1 as bessel_j1

KERNEL_PAD = 21
KERNEL_RANGE = tuple(2 * v + 1 for v in range(3, 11))  # 7..21


def _mesh(size: int) -> np.ndarray:
    ax = np.arange(-(size // 2), size // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    return np.stack([xx, yy], -1)  # (k, k, 2)


def _sigma_matrix(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    d = np.array([[sig_x ** 2, 0.0], [0.0, sig_y ** 2]])
    u = np.array(
        [[math.cos(theta), -math.sin(theta)], [math.sin(theta), math.cos(theta)]]
    )
    return u @ d @ u.T


def bivariate_gaussian(
    size: int, sig_x: float, sig_y: float, theta: float, isotropic: bool = False
) -> np.ndarray:
    if isotropic:
        sig_y, theta = sig_x, 0.0
    inv = np.linalg.inv(_sigma_matrix(sig_x, sig_y, theta))
    xy = _mesh(size)
    q = np.einsum("ijk,kl,ijl->ij", xy, inv, xy)
    k = np.exp(-0.5 * q)
    return k / k.sum()


def bivariate_generalized_gaussian(
    size: int, sig_x: float, sig_y: float, theta: float, beta: float,
    isotropic: bool = False,
) -> np.ndarray:
    if isotropic:
        sig_y, theta = sig_x, 0.0
    inv = np.linalg.inv(_sigma_matrix(sig_x, sig_y, theta))
    xy = _mesh(size)
    q = np.einsum("ijk,kl,ijl->ij", xy, inv, xy)
    k = np.exp(-0.5 * np.power(q, beta))
    return k / k.sum()


def bivariate_plateau(
    size: int, sig_x: float, sig_y: float, theta: float, beta: float,
    isotropic: bool = False,
) -> np.ndarray:
    if isotropic:
        sig_y, theta = sig_x, 0.0
    inv = np.linalg.inv(_sigma_matrix(sig_x, sig_y, theta))
    xy = _mesh(size)
    q = np.einsum("ijk,kl,ijl->ij", xy, inv, xy)
    k = 1.0 / (np.power(q, beta) + 1.0)
    return k / k.sum()


def circular_lowpass_kernel(omega_c: float, size: int, pad_to: int = 0) -> np.ndarray:
    """2D circular low-pass (sinc) filter; size must be odd."""
    assert size % 2 == 1
    ax = np.arange(size) - size // 2
    xx, yy = np.meshgrid(ax, ax)
    r = np.sqrt(xx ** 2 + yy ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = omega_c * bessel_j1(omega_c * r) / (2 * np.pi * r)
    k[size // 2, size // 2] = omega_c ** 2 / (4 * np.pi)
    k = k / k.sum()
    if pad_to > size:
        p = (pad_to - size) // 2
        k = np.pad(k, ((p, p), (p, p)))
    return k


@dataclass(frozen=True)
class KernelConfig:
    """First/second-stage kernel settings
    (pho_realesrgan_dataset.py:65-85)."""

    kernel_list: Tuple[str, ...] = (
        "iso", "aniso", "generalized_iso", "generalized_aniso",
        "plateau_iso", "plateau_aniso",
    )
    kernel_prob: Tuple[float, ...] = (0.45, 0.25, 0.12, 0.03, 0.12, 0.03)
    sinc_prob: float = 0.1
    blur_sigma: Tuple[float, float] = (0.2, 3.0)
    betag_range: Tuple[float, float] = (0.5, 4.0)
    betap_range: Tuple[float, float] = (1.0, 2.0)


KERNEL1_CFG = KernelConfig()
KERNEL2_CFG = KernelConfig(blur_sigma=(0.2, 1.5))
FINAL_SINC_PROB = 0.8


def random_mixed_kernel(rng: np.random.Generator, size: int, cfg: KernelConfig) -> np.ndarray:
    kind = rng.choice(len(cfg.kernel_list), p=np.asarray(cfg.kernel_prob))
    kind = cfg.kernel_list[kind]
    sig_x = rng.uniform(*cfg.blur_sigma)
    sig_y = rng.uniform(*cfg.blur_sigma)
    theta = rng.uniform(-math.pi, math.pi)
    if kind == "iso":
        return bivariate_gaussian(size, sig_x, sig_y, theta, isotropic=True)
    if kind == "aniso":
        return bivariate_gaussian(size, sig_x, sig_y, theta)
    if kind == "generalized_iso":
        beta = rng.uniform(*cfg.betag_range)
        return bivariate_generalized_gaussian(size, sig_x, sig_y, theta, beta, True)
    if kind == "generalized_aniso":
        beta = rng.uniform(*cfg.betag_range)
        return bivariate_generalized_gaussian(size, sig_x, sig_y, theta, beta)
    if kind == "plateau_iso":
        beta = rng.uniform(*cfg.betap_range)
        return bivariate_plateau(size, sig_x, sig_y, theta, beta, True)
    if kind == "plateau_aniso":
        beta = rng.uniform(*cfg.betap_range)
        return bivariate_plateau(size, sig_x, sig_y, theta, beta)
    raise ValueError(kind)


def _pad_to(k: np.ndarray, size: int = KERNEL_PAD) -> np.ndarray:
    p = (size - k.shape[0]) // 2
    return np.pad(k, ((p, p), (p, p))) if p > 0 else k


def sample_degradation_kernels(rng: np.random.Generator):
    """Per-item kernel triple (kernel1, kernel2, sinc), each (21, 21) fp32 —
    the dataset's kernel synthesis (pho_realesrgan_dataset.py:224-277)."""

    def stage_kernel(cfg: KernelConfig) -> np.ndarray:
        size = int(rng.choice(KERNEL_RANGE))
        if rng.uniform() < cfg.sinc_prob:
            lo = np.pi / 3 if size < 13 else np.pi / 5
            k = circular_lowpass_kernel(rng.uniform(lo, np.pi), size)
        else:
            k = random_mixed_kernel(rng, size, cfg)
        return _pad_to(k)

    kernel1 = stage_kernel(KERNEL1_CFG)
    kernel2 = stage_kernel(KERNEL2_CFG)

    if rng.uniform() < FINAL_SINC_PROB:
        size = int(rng.choice(KERNEL_RANGE))
        sinc = circular_lowpass_kernel(rng.uniform(np.pi / 3, np.pi), size, pad_to=KERNEL_PAD)
    else:
        sinc = np.zeros((KERNEL_PAD, KERNEL_PAD), np.float32)
        sinc[KERNEL_PAD // 2, KERNEL_PAD // 2] = 1.0  # identity pulse
    return (
        kernel1.astype(np.float32),
        kernel2.astype(np.float32),
        sinc.astype(np.float32),
    )


def gaussian_blur_kernel(size: int = 51, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel-compatible separable kernel (USM sharpening,
    basicsr img_process_util.py:65-72). sigma=0 -> cv2's implied sigma."""
    if sigma <= 0:
        sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8
    ax = np.arange(size) - (size - 1) / 2.0
    k1 = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k1 = k1 / k1.sum()
    return np.outer(k1, k1).astype(np.float32)
