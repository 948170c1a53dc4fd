"""Image-quality metrics in JAX + a metric registry.

The reference pulls 8 metrics from pyiqa (test/test.py:162-169): psnr, ssim
(color), lpips, dists, niqe, musiq, maniqa, clipiqa. Here:
  * PSNR/SSIM are native JAX (jit-able, batched);
  * learned metrics (LPIPS and beyond) are registry entries that activate
    when their converted weights are present — zero-egress environments run
    the native subset and report the rest as unavailable.

All images NHWC float in [0, 1].
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B,) PSNR in dB over full images."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(1.0 / jnp.clip(mse, 1e-10))


def _fspecial_gauss(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    ax = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(ax ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B,) mean SSIM over channels (the reference's `ssimc` treats color
    channels independently and averages), standard 11x11 gaussian window."""
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    win = _fspecial_gauss()[:, :, None, None]
    c = a.shape[-1]
    kernel = jnp.tile(win, (1, 1, 1, c))

    def filt(x):
        # HIGHEST precision is load-bearing on TPU: the default MXU path
        # computes this conv in bf16, and the variance terms below are
        # differences of O(1) quantities — bf16 error (~6e-3) dwarfs
        # C2=9e-4, flipping denominators negative and producing |SSIM| >> 1.
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    # true variances are >= 0; clamp away residual cancellation error
    sa = jnp.maximum(filt(a * a) - mu_a2, 0.0)
    sb = jnp.maximum(filt(b * b) - mu_b2, 0.0)
    sab = filt(a * b) - mu_ab
    ssim_map = ((2 * mu_ab + C1) * (2 * sab + C2)) / (
        (mu_a2 + mu_b2 + C1) * (sa + sb + C2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def minmax_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Per-image min-max normalization (the reference computes a second
    'norm' variant of every metric, test/test.py:438-454)."""
    lo = x.min(axis=(1, 2, 3), keepdims=True)
    hi = x.max(axis=(1, 2, 3), keepdims=True)
    return (x - lo) / jnp.clip(hi - lo, 1e-6)


class MetricBank:
    """Registry of available metrics. Full-reference metrics take (pred, gt);
    no-reference metrics take (pred,)."""

    def __init__(self, weights_dir: Optional[str] = None):
        self.full_ref: Dict[str, Callable] = {"psnr": psnr, "ssim": ssim}
        self.no_ref: Dict[str, Callable] = {}
        self.unavailable = ["lpips", "dists", "niqe", "musiq", "maniqa", "clipiqa"]

        from dit4sr_tpu.eval.niqe import niqe as niqe_fn, niqe_available

        if niqe_available():
            self.no_ref["niqe"] = lambda pred: np.asarray(
                [niqe_fn(np.asarray(p)) for p in pred]
            )
            self.unavailable.remove("niqe")
        if weights_dir:
            self._try_load_learned(weights_dir)

    def _try_load_learned(self, weights_dir: str):
        """Activate learned metrics whose converted .npz weights exist.

        File names mirror the reference's pyiqa metric names
        (test/test.py:162-169): lpips_alex.npz, dists.npz, clipiqa.npz,
        maniqa.npz, musiq.npz."""
        import os

        def present(name):
            return os.path.exists(os.path.join(weights_dir, name))

        def path(name):
            return os.path.join(weights_dir, name)

        if present("lpips_alex.npz"):
            from dit4sr_tpu.eval.lpips import make_lpips

            self.full_ref["lpips"] = make_lpips(path("lpips_alex.npz"))
            self.unavailable.remove("lpips")
        if present("dists.npz"):
            from dit4sr_tpu.eval.dists import make_dists

            self.full_ref["dists"] = make_dists(path("dists.npz"))
            self.unavailable.remove("dists")
        if present("clipiqa.npz"):
            from dit4sr_tpu.eval.clipiqa import make_clipiqa

            self.no_ref["clipiqa"] = make_clipiqa(path("clipiqa.npz"))
            self.unavailable.remove("clipiqa")
        if present("maniqa.npz"):
            from dit4sr_tpu.eval.maniqa import make_maniqa

            self.no_ref["maniqa"] = make_maniqa(path("maniqa.npz"))
            self.unavailable.remove("maniqa")
        if present("musiq.npz"):
            from dit4sr_tpu.eval.musiq import make_musiq

            self.no_ref["musiq"] = make_musiq(path("musiq.npz"))
            self.unavailable.remove("musiq")

    def compute(self, pred: jnp.ndarray, gt: Optional[jnp.ndarray]) -> Dict[str, np.ndarray]:
        out = {}
        if gt is not None:
            for name, fn in self.full_ref.items():
                out[name] = np.asarray(fn(pred, gt))
                out[f"{name}_norm"] = np.asarray(
                    fn(minmax_normalize(pred), minmax_normalize(gt))
                )
        if min(pred.shape[1], pred.shape[2]) >= 96:  # NIQE block size
            for name, fn in self.no_ref.items():
                out[name] = np.asarray(fn(pred))
        return out
