"""NIQE (Natural Image Quality Evaluator) — no-reference metric.

Implemented from the published NIQE math (Mittal et al., "Making a
'Completely Blind' Image Quality Analyzer"): MSCN coefficients, AGGD moment
fits over 96x96 blocks at two scales, Mahalanobis distance to a pristine
multivariate-Gaussian model. The pristine model parameters (mu/cov fitted on
the original corpus) are a data asset loaded from `params_path` — e.g. the
`niqe_pris_params.npz` distributed with BasicSR (present in the reference
checkout); they are not code and are not vendored here.

Host-side numpy: NIQE is eval-only and block-ragged (sharp-block selection),
a poor fit for XLA static shapes.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np

_DEFAULT_PARAMS = "/root/reference/basicsr/metrics/niqe_pris_params.npz"

# precomputed gamma lookup for AGGD shape estimation
_GAM = np.arange(0.2, 10.001, 0.001)
_R_GAM = (
    np.exp(2 * np.vectorize(math.lgamma)(_GAM / 2 + 1))
    / (np.exp(np.vectorize(math.lgamma)(_GAM)) * np.exp(np.vectorize(math.lgamma)(_GAM + 2)))
) ** -1  # placeholder; replaced below


def _gamma(x):
    return np.exp(np.vectorize(math.lgamma)(x))


_R_GAM = _gamma(2.0 / _GAM) ** 2 / (_gamma(1.0 / _GAM) * _gamma(3.0 / _GAM))


def estimate_aggd(block: np.ndarray) -> Tuple[float, float, float]:
    """Asymmetric generalized Gaussian fit: returns (alpha, beta_l, beta_r)."""
    block = block.flatten()
    left = block[block < 0]
    right = block[block > 0]
    gam_l = math.sqrt(np.mean(left ** 2)) if left.size else 0.0
    gam_r = math.sqrt(np.mean(right ** 2)) if right.size else 0.0
    gammahat = gam_l / gam_r if gam_r > 0 else 1e6
    rhat = (np.mean(np.abs(block)) ** 2) / np.mean(block ** 2) if np.mean(block ** 2) > 0 else 0
    rhatnorm = rhat * (gammahat ** 3 + 1) * (gammahat + 1) / ((gammahat ** 2 + 1) ** 2)
    alpha = _GAM[np.argmin((_R_GAM - rhatnorm) ** 2)]
    const = math.sqrt(_gamma(1.0 / alpha) / _gamma(3.0 / alpha))
    beta_l = gam_l * const
    beta_r = gam_r * const
    return alpha, beta_l, beta_r


def _gauss_kernel(size: int = 7, sigma: float = 7.0 / 6.0) -> np.ndarray:
    ax = np.arange(size) - size // 2
    k = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k = np.outer(k, k)
    return k / k.sum()


def _mscn(img: np.ndarray, window: np.ndarray) -> np.ndarray:
    from scipy.ndimage import convolve

    mu = convolve(img, window, mode="nearest")
    sigma = np.sqrt(np.abs(convolve(img * img, window, mode="nearest") - mu * mu))
    return (img - mu) / (sigma + 1.0)


# ---------------------------------------------------------------------------
# MATLAB-compatible antialiased bicubic resize (NIQE's 0.5x downscale uses
# imresize with antialiasing; a plain bilinear resize shifts the score)
# ---------------------------------------------------------------------------


def _matlab_cubic(x: np.ndarray) -> np.ndarray:
    """MATLAB's bicubic kernel (Keys, a=-0.5)."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    return (1.5 * ax3 - 2.5 * ax2 + 1.0) * (ax <= 1.0) + (
        -0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0
    ) * ((ax > 1.0) & (ax < 2.0))


def _resize_weights(in_len: int, out_len: int, scale: float):
    """Per-output-pixel contribution weights/indices, antialiased for
    scale < 1 (the published MATLAB imresize algorithm)."""
    kernel_width = 4.0 / scale if scale < 1.0 else 4.0
    x = np.arange(1.0, out_len + 1.0)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - kernel_width / 2.0)
    p = int(math.ceil(kernel_width)) + 2
    idx = left[:, None] + np.arange(p)[None, :] - 1.0      # 0-based
    dist = u[:, None] - (idx + 1.0)
    w = scale * _matlab_cubic(dist * scale) if scale < 1.0 else _matlab_cubic(dist)
    w = w / w.sum(axis=1, keepdims=True)
    # symmetric (mirror) boundary, as MATLAB's aux index array
    idx = idx.astype(np.int64)
    idx = np.where(idx < 0, -idx - 1, idx)
    idx = np.where(idx >= in_len, 2 * in_len - idx - 1, idx)
    # drop columns that are zero for every output pixel
    keep = ~np.all(w == 0.0, axis=0)
    return w[:, keep], idx[:, keep]


def matlab_imresize(img: np.ndarray, scale: float) -> np.ndarray:
    """2D MATLAB-equivalent imresize(img, scale) with antialiasing."""
    h, w = img.shape
    oh, ow = int(math.ceil(h * scale)), int(math.ceil(w * scale))
    wr, ir = _resize_weights(h, oh, scale)
    tmp = np.einsum("op,opw->ow", wr, img[ir, :])
    wc, ic = _resize_weights(w, ow, scale)
    return np.einsum("op,hop->ho", wc, tmp[:, ic])


def _block_features(mscn: np.ndarray) -> np.ndarray:
    """18 AGGD features: MSCN + 4 pairwise-product orientations."""
    feats = []
    alpha, bl, br = estimate_aggd(mscn)
    feats += [alpha, (bl + br) / 2]
    shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]
    for dy, dx in shifts:
        shifted = np.roll(np.roll(mscn, dy, axis=0), dx, axis=1)
        pair = mscn * shifted
        alpha, bl, br = estimate_aggd(pair)
        mean = (br - bl) * (_gamma(2.0 / alpha) / _gamma(1.0 / alpha))
        feats += [alpha, mean, bl, br]
    return np.asarray(feats)


def niqe(
    image: np.ndarray,
    params_path: Optional[str] = None,
    block: int = 96,
) -> float:
    """image: (H, W, 3) or (H, W) float in [0, 1]. Lower is better."""
    params_path = params_path or os.environ.get("NIQE_PARAMS", _DEFAULT_PARAMS)
    data = np.load(params_path)
    mu_pris = data["mu_pris_param"].reshape(-1)
    cov_pris = data["cov_pris_param"]
    window = (
        data["gaussian_window"] if "gaussian_window" in data else _gauss_kernel()
    )

    if image.ndim == 3:
        # Y channel of YCbCr (the BT.601 convention NIQE models were fit on)
        img = (
            65.481 * image[..., 0] + 128.553 * image[..., 1] + 24.966 * image[..., 2]
        ) + 16.0
    else:
        img = image * 255.0
    # MATLAB consistency: the basicsr/pyiqa implementations round the Y image
    img = np.round(img.astype(np.float64))

    h, w = img.shape
    nbh, nbw = h // block, w // block
    if nbh == 0 or nbw == 0:
        raise ValueError(f"image too small for NIQE block size {block}")
    img = img[: nbh * block, : nbw * block]

    feats_scales = []
    for scale in (1, 2):
        mscn = _mscn(img, window)
        feats = []
        b = block // scale
        for i in range(nbh):
            for j in range(nbw):
                feats.append(_block_features(mscn[i * b : (i + 1) * b, j * b : (j + 1) * b]))
        feats_scales.append(np.stack(feats))
        if scale == 1:
            # antialiased MATLAB imresize, as basicsr (imresize(img/255, 0.5))
            img = matlab_imresize(img / 255.0, 0.5) * 255.0
    feats = np.concatenate(feats_scales, axis=1)  # (nblocks, 36)

    mu_dist = np.nanmean(feats, axis=0)
    good = feats[~np.isnan(feats).any(axis=1)]
    cov_dist = np.cov(good, rowvar=False)

    inv = np.linalg.pinv((cov_pris + cov_dist) / 2)
    d = mu_pris - mu_dist
    return float(np.sqrt(max(0.0, d @ inv @ d)))


def niqe_available(params_path: Optional[str] = None) -> bool:
    params_path = params_path or os.environ.get("NIQE_PARAMS", _DEFAULT_PARAMS)
    return os.path.exists(params_path)
