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

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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

# ---------------------------------------------------------------------------
# Pallas kernel path
# ---------------------------------------------------------------------------
#
# The XLA gather above reads scattered (1, D) rows from HBM and its backward
# is an HBM scatter-add — both bandwidth-hostile on TPU (measured ~700 ms per
# encoder-layer call at the DiT4SR shapes). But one (batch, head, level)
# value grid is only H*W*D*4 B = 512 KB: it fits in VMEM, where random access
# is cheap. The kernel below keeps the level grid resident in VMEM and walks
# queries with scalar dynamic slices (Mosaic has no vector gather):
#
#   * outside the kernel (XLA, fused elementwise): each sampling point is
#     turned into two row-pair slice starts (the 2x2 bilinear footprint as
#     two contiguous (2, D) slices) plus 4 combined weights
#     (bilinear x attention, zeroed for out-of-range corners via clamped
#     slot matching);
#   * forward kernel: per query, 2P dynamic-slice reads into a (4P, D)
#     scratch, then one (1, 4P) @ (4P, D) MXU dot -> the output row;
#   * backward kernel: regathers the footprint (value is resident) to form
#     dW4 = dOut . V rows, and scatter-adds W4^T dOut into a VMEM dV
#     accumulator — replacing XLA's scatter entirely. dLoc/dAttn come from
#     autodiffing the cheap weight-construction with dW4 (the floor() index
#     path is piecewise-constant, gradient zero, matching grid_sample).
#
# Measured on v5e (B=2, M=8, L=4 levels of 64x64, Q=16384, P=4):
# forward 134 ms vs 707 ms XLA (5.3x). Requires all levels the same (H, W)
# (true for the DiT feature pyramid); `ms_deform_attn` falls back to XLA
# otherwise and on CPU.

_QB = 128  # query block (grid inner axis)


def _slice_plan(
    spatial_shapes: Sequence[Tuple[int, int]],
    loc: jnp.ndarray,    # (B, Q, M, L, P, 2) in [0, 1]
    attw: jnp.ndarray,   # (B, Q, M, L, P)
):
    """Per point: two (2, D)-slice starts + 4 combined weights.

    Returns idx (B, M, L, Q, 2P) int32 and w4 (B, M, L, Q, 4P) f32; w4 is
    differentiable in (loc, attw); idx is piecewise-constant."""
    H, W = spatial_shapes[0]
    x = loc[..., 0] * W - 0.5                    # (B, Q, M, L, P)
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    sx = jnp.clip(x0, 0, W - 2)
    sy = jnp.clip(y0, 0, H - 2)

    def slot_w(slot, c0, t):
        # weight a clamped slot receives: matches corner c0 (weight 1-t)
        # or c0+1 (weight t); anything else (out of range) gets 0.
        return jnp.where(slot == c0, 1.0 - t, 0.0) + jnp.where(slot == c0 + 1, t, 0.0)

    wx0 = slot_w(sx, x0, tx)
    wx1 = slot_w(sx + 1, x0, tx)
    wy0 = slot_w(sy, y0, ty)
    wy1 = slot_w(sy + 1, y0, ty)

    s0 = (sy * W + sx).astype(jnp.int32)         # row y0 pair
    s1 = s0 + W                                  # row y0+1 pair
    idx = jnp.stack([s0, s1], axis=-1)           # (B, Q, M, L, P, 2)
    w4 = jnp.stack(
        [wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1
    ) * attw[..., None]                          # (B, Q, M, L, P, 4)

    B, Q, M, L, P, _ = idx.shape
    idx = idx.transpose(0, 2, 3, 1, 4, 5).reshape(B, M, L, Q, 2 * P)
    w4 = w4.transpose(0, 2, 3, 1, 4, 5).reshape(B, M, L, Q, 4 * P)
    return idx, w4


def _fwd_kernel(idx_ref, v_ref, w_ref, o_ref, scratch, *, n_points):
    def qbody(qi, _):
        for p in range(n_points):  # unrolled: static scratch offsets
            scratch[2 * p : 2 * p + 2, :] = v_ref[0, pl.ds(idx_ref[0, qi, p], 2), :]
        wrow = w_ref[0, pl.ds(qi, 1), :]                       # (1, 4P)
        o_ref[0, pl.ds(qi, 1), :] = jax.lax.dot_general(
            wrow, scratch[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 0

    jax.lax.fori_loop(0, o_ref.shape[1], qbody, 0)


def _bwd_kernel(idx_ref, v_ref, w_ref, do_ref, dv_ref, dw_ref,
                scratch, dv_acc, *, n_points):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def qbody(qi, _):
        for p in range(n_points):
            scratch[2 * p : 2 * p + 2, :] = v_ref[0, pl.ds(idx_ref[0, qi, p], 2), :]
        do_row = do_ref[0, pl.ds(qi, 1), :]                    # (1, D)
        # dW4 = dOut . gathered rows
        dw_ref[0, pl.ds(qi, 1), :] = jax.lax.dot_general(
            do_row, scratch[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # dV += W4^T dOut (outer product via contraction over the 1-axis)
        w_row = w_ref[0, pl.ds(qi, 1), :]                      # (1, 4P)
        contrib = jax.lax.dot_general(
            w_row, do_row, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                      # (4P, D)
        for p in range(n_points):
            s = idx_ref[0, qi, p]
            dv_acc[pl.ds(s, 2), :] += contrib[2 * p : 2 * p + 2, :]
        return 0

    jax.lax.fori_loop(0, do_ref.shape[1], qbody, 0)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        dv_ref[0] = dv_acc[...]


# -- phased variant ----------------------------------------------------------
#
# The looped kernels above interleave, per query: slice reads, one or two
# small (1, 4P) MXU dots, and (bwd) a chain of read-modify-write updates on
# ONE dv accumulator — every RMW serializes against the previous because
# Mosaic cannot prove the dynamic indices don't alias. The phased variant
# restructures each group of `ways` queries into data-independent phases the
# compiler can pipeline (same trick as the flash kernel's ways-split fwd):
#
#   A. gather ALL the group's footprint rows into one (ways*4P, D) scratch
#      (pure reads, no dependencies);
#   B. one block-diagonal (ways, ways*4P) @ (ways*4P, D) MXU matmul replaces
#      `ways` separate (1, 4P) dots (fwd output rows / bwd dW+contrib);
#   C. (bwd) scatter the contribution rows through TWO alternating dv
#      accumulators, halving the RMW dependency chain; summed at the end.
#
# Exactly the same math -> bit-comparable outputs; selected via
# ms_deform_attn(impl="pallas_phased") for benchmarking (tools/
# bench_deform_kernel.py decides the default on real hardware).

_WAYS = 8  # queries per phase group: ways * 4P = 128 lanes at P=4


def _block_diag_w(wq, ways, rows):
    """(ways, rows) per-query weights -> (ways, ways*rows) block-diagonal."""
    wexp = jnp.concatenate([wq] * ways, axis=1)            # [i, j*rows+r] = wq[i, r]
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (ways, ways * rows), 1) // rows
    row_id = jax.lax.broadcasted_iota(jnp.int32, (ways, ways * rows), 0)
    return jnp.where(col_blk == row_id, wexp, 0.0)


def _fwd_kernel_phased(idx_ref, v_ref, w_ref, o_ref, scratch, *, n_points, ways):
    rows = 2 * n_points

    def gbody(gi, _):
        base = gi * ways
        for u in range(ways):          # phase A: gather (unrolled, pure reads)
            for p in range(n_points):
                scratch[u * rows + 2 * p : u * rows + 2 * p + 2, :] = (
                    v_ref[0, pl.ds(idx_ref[0, base + u, p], 2), :]
                )
        wq = w_ref[0, pl.ds(base, ways), :]                # (ways, rows)
        o_ref[0, pl.ds(base, ways), :] = jax.lax.dot_general(
            _block_diag_w(wq, ways, rows), scratch[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                  # phase B: one MXU op
        return 0

    jax.lax.fori_loop(0, o_ref.shape[1] // ways, gbody, 0)


def _bwd_kernel_phased(idx_ref, v_ref, w_ref, do_ref, dv_ref, dw_ref,
                       scratch, dv_acc0, dv_acc1, *, n_points, ways):
    i = pl.program_id(1)
    rows = 2 * n_points

    @pl.when(i == 0)
    def _():
        dv_acc0[...] = jnp.zeros_like(dv_acc0)
        dv_acc1[...] = jnp.zeros_like(dv_acc1)

    # constant block-sum matrix: S[c, r] = (c % rows == r)
    col_r = jax.lax.broadcasted_iota(jnp.int32, (ways * rows, rows), 0) % rows
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (ways * rows, rows), 1)
    ssum = (col_r == lane_r).astype(jnp.float32)

    def gbody(gi, _):
        base = gi * ways
        for u in range(ways):          # phase A: gather
            for p in range(n_points):
                scratch[u * rows + 2 * p : u * rows + 2 * p + 2, :] = (
                    v_ref[0, pl.ds(idx_ref[0, base + u, p], 2), :]
                )
        do_g = do_ref[0, pl.ds(base, ways), :]             # (ways, D)
        # phase B: dW_full = dOut . gathered rows, block-selected + summed
        dwf = jax.lax.dot_general(
            do_g, scratch[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                  # (ways, ways*rows)
        col_blk = jax.lax.broadcasted_iota(jnp.int32, (ways, ways * rows), 1) // rows
        row_id = jax.lax.broadcasted_iota(jnp.int32, (ways, ways * rows), 0)
        dw_sel = jnp.where(col_blk == row_id, dwf, 0.0)
        dw_ref[0, pl.ds(base, ways), :] = jax.lax.dot_general(
            dw_sel, ssum, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                  # (ways, rows)
        # contribution rows for dV: blockdiag(W)^T @ dOut -> (ways*rows, D)
        wq = w_ref[0, pl.ds(base, ways), :]
        contrib = jax.lax.dot_general(
            _block_diag_w(wq, ways, rows), do_g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # phase C: scatter through alternating accumulators (shorter RMW
        # dependency chains; the two buffers cannot alias)
        for u in range(ways):
            for p in range(n_points):
                s = idx_ref[0, base + u, p]
                rows_c = contrib[u * rows + 2 * p : u * rows + 2 * p + 2, :]
                if p % 2 == 0:
                    dv_acc0[pl.ds(s, 2), :] += rows_c
                else:
                    dv_acc1[pl.ds(s, 2), :] += rows_c
        return 0

    jax.lax.fori_loop(0, do_ref.shape[1] // ways, gbody, 0)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        dv_ref[0] = dv_acc0[...] + dv_acc1[...]


def _pad_q(x, qp, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, qp - x.shape[axis])
    return jnp.pad(x, pad) if qp != x.shape[axis] else x


def _gather_call(idx, v3, w4, *, n_points, interpret, variant="looped"):
    G, Sl, D = v3.shape
    Q = idx.shape[1]
    if variant == "phased":
        kernel = functools.partial(
            _fwd_kernel_phased, n_points=n_points, ways=_WAYS
        )
    else:
        kernel = functools.partial(_fwd_kernel, n_points=n_points)
    return pl.pallas_call(
        kernel,
        grid=(G, Q // _QB),
        in_specs=[
            pl.BlockSpec((1, _QB, n_points), lambda g, i: (g, i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Sl, D), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _QB, 2 * n_points), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _QB, D), lambda g, i: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Q, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM(
            ((_WAYS if variant == "phased" else 1) * 2 * n_points, D),
            jnp.float32,
        )],
        interpret=interpret,
    )(idx, v3, w4)


def _gather_bwd_call(idx, v3, w4, dout, *, n_points, interpret,
                     variant="looped"):
    G, Sl, D = v3.shape
    Q = idx.shape[1]
    if variant == "phased":
        kernel = functools.partial(
            _bwd_kernel_phased, n_points=n_points, ways=_WAYS
        )
        extra_scratch = [
            pltpu.VMEM((_WAYS * 2 * n_points, D), jnp.float32),
            pltpu.VMEM((Sl, D), jnp.float32),
            pltpu.VMEM((Sl, D), jnp.float32),
        ]
    else:
        kernel = functools.partial(_bwd_kernel, n_points=n_points)
        extra_scratch = [
            pltpu.VMEM((2 * n_points, D), jnp.float32),
            pltpu.VMEM((Sl, D), jnp.float32),
        ]
    return pl.pallas_call(
        kernel,
        grid=(G, Q // _QB),
        in_specs=[
            pl.BlockSpec((1, _QB, n_points), lambda g, i: (g, i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Sl, D), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _QB, 2 * n_points), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _QB, D), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Sl, D), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _QB, 2 * n_points), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Sl, D), jnp.float32),
            jax.ShapeDtypeStruct((G, Q, 2 * n_points), jnp.float32),
        ],
        scratch_shapes=extra_scratch,
        interpret=interpret,
    )(idx, v3, w4, dout)


def _prep(value, spatial_shapes, loc, attw):
    """Common layout work: value (B,S,M,D) -> (G,Sl,D); plan idx/w4."""
    B, S, M, D = value.shape
    L = len(spatial_shapes)
    Sl = S // L
    v3 = value.transpose(0, 2, 1, 3).reshape(B * M * L, Sl, D)
    idx, w4 = _slice_plan(spatial_shapes, loc, attw)
    Q = loc.shape[1]
    Qp = -(-Q // _QB) * _QB
    idx = _pad_q(idx.reshape(B * M * L, Q, -1), Qp, 1)
    w4 = _pad_q(w4.reshape(B * M * L, Q, -1), Qp, 1)
    return v3, idx, w4


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def _ms_deform_attn_pallas(value, spatial_shapes, loc, attw, interpret,
                           variant="looped"):
    out, _ = _pallas_fwd_impl(value, spatial_shapes, loc, attw, interpret,
                              variant)
    return out


def _pallas_fwd_impl(value, spatial_shapes, loc, attw, interpret,
                     variant="looped"):
    B, S, M, D = value.shape
    L = len(spatial_shapes)
    P = loc.shape[-2]
    Q = loc.shape[1]
    v3, idx, w4 = _prep(value, spatial_shapes, loc, attw)
    part = _gather_call(idx, v3, w4, n_points=2 * P, interpret=interpret,
                        variant=variant)
    part = part[:, :Q].reshape(B, M, L, Q, D).sum(axis=2)      # (B, M, Q, D)
    out = part.transpose(0, 2, 1, 3).reshape(B, Q, M * D)
    return out, (value, loc, attw)


def _pallas_bwd_impl(spatial_shapes, interpret, variant, res, dout):
    value, loc, attw = res
    B, S, M, D = value.shape
    L = len(spatial_shapes)
    P = loc.shape[-2]
    Q = loc.shape[1]
    v3, idx, w4 = _prep(value, spatial_shapes, loc, attw)
    Qp = idx.shape[1]

    # dOut per (b, m, l, q): the level partials were summed, so each level
    # sees the same dOut row.
    do = dout.reshape(B, Q, M, D).transpose(0, 2, 1, 3)        # (B, M, Q, D)
    do = jnp.broadcast_to(do[:, :, None], (B, M, L, Q, D))
    do = _pad_q(do.reshape(B * M * L, Q, D), Qp, 1)

    dv3, dw4 = _gather_bwd_call(idx, v3, w4, do, n_points=2 * P,
                                interpret=interpret, variant=variant)
    dvalue = (
        dv3.reshape(B, M, L * (S // L), D).transpose(0, 2, 1, 3)
    )                                                           # (B, S, M, D)
    dw4 = dw4[:, :Q].reshape(B, M, L, Q, 4 * P)

    # route dW4 through the differentiable weight construction
    def w4_of(loc_, attw_):
        return _slice_plan(spatial_shapes, loc_, attw_)[1]

    _, vjp_fn = jax.vjp(w4_of, loc, attw)
    dloc, dattw = vjp_fn(dw4)
    return dvalue, dloc, dattw


_ms_deform_attn_pallas.defvjp(_pallas_fwd_impl, _pallas_bwd_impl)


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatch between the XLA gather core and the Pallas VMEM kernel.

    impl: "auto" (pallas_phased on TPU when levels are uniform, else xla),
    "pallas" (the original looped kernel), "pallas_phased" (the phase-split
    variant — see _fwd_kernel_phased), "xla". Measured on the v5e at the
    full encoder geometry (B=2, M=8, 4x64x64, Q=16384, P=4, 8-chained,
    tools/bench_deform_kernel.py, 2026-08-21): phased fwd 31.8 ms/call vs
    looped 127.5 (4.0x), fwd+bwd 112.9 vs 387.3 (3.4x), identical
    checksums — so "auto" picks phased."""
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    uniform = len(set(shapes)) == 1 and shapes[0][0] >= 2 and shapes[0][1] >= 2
    if impl == "auto":
        impl = (
            "pallas_phased" if (jax.default_backend() != "cpu" and uniform)
            else "xla"
        )
    if impl.startswith("pallas"):
        if not uniform:
            raise NotImplementedError(f"pallas path needs uniform levels, got {shapes}")
        interpret = jax.default_backend() == "cpu"
        variant = "phased" if impl == "pallas_phased" else "looped"
        return _ms_deform_attn_pallas(
            value, shapes, sampling_locations, attention_weights, interpret,
            variant,
        )
    return ms_deform_attn_core(value, shapes, sampling_locations, attention_weights)
