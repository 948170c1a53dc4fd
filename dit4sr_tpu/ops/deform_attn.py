"""Multi-scale deformable attention sampling for TPU.

TPU-native replacement for the reference's CUDA extension
(testr/adet/layers/csrc/DeformAttn/ms_deform_im2col_cuda.cuh, driven by
adet._C.ms_deform_attn_forward — SURVEY.md §2.4). Semantics follow the
pure-torch oracle `ms_deform_attn_core_pytorch`
(testr/adet/layers/ms_deform_attn.py:39-60): per query, per head, sample each
feature level at P fractional locations with bilinear interpolation
(grid_sample align_corners=False, zero padding) and reduce with softmax
attention weights.

Implementation notes (why this maps well to TPU without a custom kernel):
  * spatial shapes are *static* Python tuples — XLA sees fixed-size gathers;
  * the four bilinear corners become one batched `take_along_axis` gather per
    level over a (B, M, H*W, D) value tensor — lowered to a single XLA gather
    the TPU executes as vectorized dynamic-slices;
  * everything else is VPU-friendly elementwise math + one big weighted sum,
    which XLA fuses. Autodiff gives the backward pass (gather -> scatter-add)
    for free, replacing the hand-written CUDA backward.

fp32 throughout: the reference runs TESTR outside autocast because deformable
attention is precision-sensitive (initialize.py:626-633).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(
    value: jnp.ndarray,       # (B, M, H*W, D) one level, zero outside handled here
    loc: jnp.ndarray,         # (B, M, Q, P, 2) normalized [0,1] sampling locations
    H: int,
    W: int,
) -> jnp.ndarray:            # (B, M, Q, P, D)
    """grid_sample(align_corners=False, padding_mode='zeros') equivalent."""
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = yi_c * W + xi_c                       # (B, M, Q, P)
        b, m, q, p = flat.shape
        idx = flat.reshape(b, m, q * p, 1)
        g = jnp.take_along_axis(value, idx, axis=2)  # (B, M, Q*P, D)
        g = g.reshape(b, m, q, p, value.shape[-1])
        return g * (w * valid.astype(value.dtype))[..., None]

    out = corner(x0, y0, (1 - tx) * (1 - ty))
    out += corner(x0 + 1, y0, tx * (1 - ty))
    out += corner(x0, y0 + 1, (1 - tx) * ty)
    out += corner(x0 + 1, y0 + 1, tx * ty)
    return out


def ms_deform_attn_core(
    value: jnp.ndarray,                     # (B, S, M, D) flattened levels
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H, W), ...]
    sampling_locations: jnp.ndarray,        # (B, Q, M, L, P, 2) in [0,1]
    attention_weights: jnp.ndarray,         # (B, Q, M, L, P), softmaxed over L*P
) -> jnp.ndarray:                           # (B, Q, M*D)
    B, S, M, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)

    sizes = [h * w for h, w in spatial_shapes]
    assert sum(sizes) == S, f"spatial shapes {spatial_shapes} != {S} tokens"

    # (B, S, M, D) -> (B, M, S, D) once; per-level static slices
    value_t = value.transpose(0, 2, 1, 3)

    out = jnp.zeros((B, M, Q, D), value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_t[:, :, start : start + sizes[lvl], :]
        # (B, Q, M, P, 2) -> (B, M, Q, P, 2)
        loc = sampling_locations[:, :, :, lvl].transpose(0, 2, 1, 3, 4)
        wgt = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)  # (B, M, Q, P)
        sampled = _bilinear_gather(v, loc, h, w)                      # (B,M,Q,P,D)
        out = out + jnp.sum(sampled * wgt[..., None], axis=3)
        start += sizes[lvl]

    # (B, M, Q, D) -> (B, Q, M*D)
    return out.transpose(0, 2, 1, 3).reshape(B, Q, M * D)
