"""LPIPS (AlexNet backbone) in flax.

Perceptual distance used by the reference through pyiqa (test/test.py:165).
Architecture per Zhang et al. 2018: AlexNet conv features at 5 stages,
channel-unit-normalized, squared differences reduced by learned non-negative
1x1 linear heads, spatially averaged and summed.

Weights: `convert_lpips_torch` maps the official `lpips` pip package's state
dict into a single .npz; `make_lpips(path)` returns a jitted batched metric.
Without weights the metric stays unavailable (MetricBank reports it).
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature stages: (out_ch, kernel, stride, pad); maxpool between
_ALEX = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_STAGE_CH = [64, 192, 384, 256, 256]

# ImageNet normalization used by lpips ("shift"/"scale" buffers)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def alexnet_features(params: Dict, x: jnp.ndarray):
    """x: NHWC in [-1, 1] (lpips convention). Returns 5 stage activations."""
    x = (x - _SHIFT) / _SCALE
    feats = []
    for i, (_, k, s, p) in enumerate(_ALEX):
        x = _conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"], s, p)
        x = jax.nn.relu(x)
        feats.append(x)
        if i in (0, 1):
            x = _maxpool(x)
        elif i == 4:
            pass
    return feats


def lpips_distance(params: Dict, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a, b: NHWC in [0, 1]. Returns (B,) LPIPS."""
    a = a.astype(jnp.float32) * 2 - 1
    b = b.astype(jnp.float32) * 2 - 1
    fa = alexnet_features(params, a)
    fb = alexnet_features(params, b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / jnp.sqrt(jnp.sum(xa ** 2, -1, keepdims=True) + 1e-10)
        nb = xb / jnp.sqrt(jnp.sum(xb ** 2, -1, keepdims=True) + 1e-10)
        diff = (na - nb) ** 2
        w = params[f"lin{i}_w"]  # (C,) non-negative
        total = total + jnp.mean(jnp.sum(diff * w, axis=-1), axis=(1, 2))
    return total


def convert_lpips_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Official `lpips` package state dict -> our param dict.

    Keys: net.slice{1..5}.<idx>.weight/bias (AlexNet convs, OIHW) and
    lin{0..4}.model.1.weight (1x1 heads, (1, C, 1, 1))."""
    out: Dict[str, np.ndarray] = {}
    conv_keys = [k for k in sd if k.endswith(".weight") and "lin" not in k]
    conv_keys = sorted(
        (k for k in conv_keys if np.asarray(sd[k]).ndim == 4),
        key=lambda k: tuple(int(s) for s in k.split(".") if s.isdigit()),
    )
    assert len(conv_keys) == 5, f"expected 5 convs, got {conv_keys}"
    for i, k in enumerate(conv_keys):
        w = np.asarray(sd[k])
        out[f"conv{i}_w"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        out[f"conv{i}_b"] = np.asarray(sd[k.replace(".weight", ".bias")])
    for i in range(5):
        w = np.asarray(sd[f"lin{i}.model.1.weight"]).reshape(-1)
        out[f"lin{i}_w"] = np.maximum(w, 0.0)
    return out


def random_lpips_params(rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Random-weight params with the right shapes (tests only)."""
    out = {}
    cin = 3
    for i, (cout, k, _, _) in enumerate(_ALEX):
        out[f"conv{i}_w"] = rng.normal(0, 0.05, (k, k, cin, cout)).astype(np.float32)
        out[f"conv{i}_b"] = np.zeros((cout,), np.float32)
        cin = cout
    for i, c in enumerate(_STAGE_CH):
        out[f"lin{i}_w"] = rng.uniform(0, 0.1, (c,)).astype(np.float32)
    return out


def make_lpips(npz_path: str) -> Callable:
    data = dict(np.load(npz_path))
    params = {k: jnp.asarray(v) for k, v in data.items()}

    def scorer(a, b):
        # fp32 precision: metric values must match the fp32 torch reference;
        # TPU's default bf16 matmul/conv precision drifts them
        with jax.default_matmul_precision("float32"):
            return lpips_distance(params, a, b)

    return jax.jit(scorer)
