"""DISTS (Deep Image Structure and Texture Similarity) in flax/JAX.

Full-reference IQA metric used by the reference through pyiqa
(test/test.py:162-169, metric name "dists"). Architecture per Ding et al.
2020 ("Image Quality Assessment: Unifying Structure and Texture Similarity")
and the official DISTS_pytorch implementation:

  * VGG16 conv features at 5 stages (relu1_2 / 2_2 / 3_3 / 4_3 / 5_3), with
    the max-pools replaced by L2-pooling (3x3 hann-window filter over x^2,
    stride 2, per-channel, sqrt at the end);
  * the input image itself is stage 0 (channels 3,64,128,256,512,512);
  * per stage, a luminance/structure term from spatial means and a
    texture term from spatial (co)variances, weighted by learned
    per-channel alpha/beta (jointly normalized to sum 1);
  * score = 1 - sum(alpha * S_structure + beta * S_texture)  (a distance;
    lower is better).

Weights: `convert_dists_torch` maps the official DISTS checkpoint
(state dict with stage{1..5}.<vgg_idx>.weight convs, OIHW, plus alpha/beta
(1, 1475, 1, 1)) into one .npz; `make_dists(path)` returns a jitted batched
metric. Inputs NHWC in [0, 1].
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Mapping

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 stage layout: (stage, [conv channel outs]); all convs 3x3 pad 1.
_STAGES: List[List[int]] = [[64, 64], [128, 128], [256, 256, 256],
                            [512, 512, 512], [512, 512, 512]]
_CHNS = [3, 64, 128, 256, 512, 512]  # per-feature-level channels incl. input

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _hann3() -> np.ndarray:
    """3x3 normalized hann window: np.hanning(5)[1:-1] outer product."""
    a = np.hanning(5)[1:-1]
    g = np.outer(a, a)
    return (g / g.sum()).astype(np.float32)


def _l2pool(x: jnp.ndarray) -> jnp.ndarray:
    """L2 pooling: sqrt(hann_conv(x^2)), stride 2, pad 1, per channel."""
    c = x.shape[-1]
    filt = jnp.asarray(_hann3())[:, :, None, None]
    kernel = jnp.tile(filt, (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x * x, kernel, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return jnp.sqrt(out + 1e-12)


def _conv3(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def vgg_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: NHWC in [0, 1]. Returns the 6 DISTS feature levels (incl. x)."""
    feats = [x]
    h = (x.astype(jnp.float32) - _MEAN) / _STD
    idx = 0
    for s, stage in enumerate(_STAGES):
        if s > 0:
            h = _l2pool(h)
        for _ in stage:
            h = jax.nn.relu(_conv3(h, params[f"conv{idx}_w"], params[f"conv{idx}_b"]))
            idx += 1
        feats.append(h)
    return feats


def dists_score(params: Dict, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a, b: NHWC in [0, 1]. Returns (B,) DISTS distance (lower = closer)."""
    fa = vgg_features(params, a.astype(jnp.float32))
    fb = vgg_features(params, b.astype(jnp.float32))
    alpha, beta = params["alpha"], params["beta"]  # (1475,) each
    w_sum = alpha.sum() + beta.sum()
    c1 = c2 = 1e-6
    total = 0.0
    off = 0
    for k, (xa, xb) in enumerate(zip(fa, fb)):
        ch = _CHNS[k]
        al = alpha[off:off + ch] / w_sum
        be = beta[off:off + ch] / w_sum
        off += ch
        xm = xa.mean(axis=(1, 2))  # (B, C)
        ym = xb.mean(axis=(1, 2))
        s1 = (2 * xm * ym + c1) / (xm * xm + ym * ym + c1)
        # clamp: true variances are >= 0, but the E[x^2]-mu^2 form can go
        # slightly negative via fp32 cancellation at VGG feature magnitudes
        # (same failure class as the TPU SSIM blowup, eval/metrics.py)
        xv = jnp.maximum((xa * xa).mean(axis=(1, 2)) - xm * xm, 0.0)
        yv = jnp.maximum((xb * xb).mean(axis=(1, 2)) - ym * ym, 0.0)
        cov = (xa * xb).mean(axis=(1, 2)) - xm * ym
        s2 = (2 * cov + c2) / (xv + yv + c2)
        total = total + (al * s1).sum(-1) + (be * s2).sum(-1)
    return 1.0 - total


def convert_dists_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Official DISTS checkpoint -> our param dict.

    Conv keys look like `stage{1..5}.{vgg_idx}.weight` (OIHW); `alpha` and
    `beta` are (1, 1475, 1, 1). L2-pool hann filters are fixed buffers and
    are regenerated, not read."""
    pat = re.compile(r"stage(\d+)\.(\d+)\.weight$")
    convs = []
    for k in sd:
        m = pat.search(k)
        if m and np.asarray(sd[k]).ndim == 4 and np.asarray(sd[k]).shape[-1] == 3:
            convs.append((int(m.group(1)), int(m.group(2)), k))
    convs.sort()
    n_expected = sum(len(s) for s in _STAGES)
    assert len(convs) == n_expected, f"expected {n_expected} convs, got {len(convs)}"
    out: Dict[str, np.ndarray] = {}
    for i, (_, _, k) in enumerate(convs):
        w = np.asarray(sd[k], np.float32)
        out[f"conv{i}_w"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        out[f"conv{i}_b"] = np.asarray(sd[k.replace(".weight", ".bias")], np.float32)
    out["alpha"] = np.asarray(sd["alpha"], np.float32).reshape(-1)
    out["beta"] = np.asarray(sd["beta"], np.float32).reshape(-1)
    assert out["alpha"].shape == (sum(_CHNS),)
    return out


def random_dists_params(rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Random-weight params with the right shapes (tests only)."""
    out: Dict[str, np.ndarray] = {}
    cin, idx = 3, 0
    for stage in _STAGES:
        for cout in stage:
            out[f"conv{idx}_w"] = rng.normal(0, 0.05, (3, 3, cin, cout)).astype(np.float32)
            out[f"conv{idx}_b"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)
            cin = cout
            idx += 1
    out["alpha"] = rng.uniform(0, 1, (sum(_CHNS),)).astype(np.float32)
    out["beta"] = rng.uniform(0, 1, (sum(_CHNS),)).astype(np.float32)
    return out


def make_dists(npz_path: str) -> Callable:
    params = {k: jnp.asarray(v) for k, v in np.load(npz_path).items()}

    def scorer(a, b):
        # fp32 precision: match the fp32 torch reference (TPU default is bf16)
        with jax.default_matmul_precision("float32"):
            return dists_score(params, a, b)

    return jax.jit(scorer)
