"""Pallas flash attention for the MMDiT joint [streams|text] sequence.

Why: XLA's default attention materializes the (B, H, N, N) fp32 logits in
HBM. At the DiT4SR shapes (24 heads x 2405^2) that is ~0.5 GB per block —
the forward pass moves ~74 GB/call and is HBM-bandwidth-bound. This kernel
keeps logits in VMEM and never writes them out.

Design (fits these shapes; not a generic long-context kernel):
  * K/V for one (batch, head) are small (N x 64 ~ 0.3 MB) and live fully in
    VMEM, so no online-softmax streaming is needed: the grid tiles only the
    query axis and each program computes an exact full-row softmax over an
    (BQ x N) logits tile in VMEM.
  * batch and head axes are collapsed to one grid axis with 3D blocks —
    Mosaic compiles this orders of magnitude faster than 4D blocks with
    (1, 1, ...) leading dims (79 s -> ~1 s at the DiT4SR shapes).
  * key masking is *static*: the wrapper pads N up to a block multiple and
    the kernel masks columns >= valid_len with an iota compare. This matches
    the framework's usage — the reference attends to all (tokenizer-padded)
    text tokens without a mask (pipeline SDPA gets attn_mask=None), so the
    only mask ever needed is our own static alignment padding. Runtime
    (B, N) masks take the XLA path (ops/attention.py falls back).
  * custom VJP with a flash-style backward: dk/dv accumulate across query
    tiles in VMEM scratch (grid iterates q tiles innermost), dq per tile.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _masked_logits(q, k, scale, valid_len, n_total):
    # bf16 operands, fp32 accumulate: MXU-native. Casting to f32 first would
    # quarter the matmul rate (measured 31 -> ~80 TFLOP/s on this kernel).
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                  # (BQ, N) fp32
    if valid_len < n_total:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < valid_len, logits, NEG_INF)
    return logits


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, valid_len, ways=1):
    # `ways` splits the query block into independent row groups and phase-
    # orders the work (all QK^T matmuls first, then per-group softmax + PV):
    # the groups are data-independent, so Mosaic's scheduler overlaps the
    # VPU softmax of one group with the MXU matmul of the next. Measured at
    # (24, 2560, 64): 1.34 -> 1.20 ms/call at block_q=512, ways=8 (h=64
    # rows/group); output is BIT-EXACT vs ways=1 (same op order per row).
    k = k_ref[0]                               # (N, D) bf16
    v = v_ref[0]
    h = q_ref.shape[1] // ways
    logits = [
        _masked_logits(q_ref[0, i * h:(i + 1) * h], k, scale, valid_len,
                       k.shape[0])
        for i in range(ways)
    ]
    for i in range(ways):
        m = jnp.max(logits[i], axis=-1, keepdims=True)
        p = jnp.exp(logits[i] - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # probs in input dtype for the PV matmul (same as the XLA reference
        # path: probs.astype(v.dtype)); normalize the (h, D) output, not the
        # (h, N) probs — fewer VPU ops on the big tile
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, i * h:(i + 1) * h] = (o / l).astype(o_ref.dtype)


def _blk_spec(block_q, D):
    return pl.BlockSpec((1, block_q, D), lambda g, i: (g, i, 0),
                        memory_space=pltpu.VMEM)


def _full_spec(N, D):
    return pl.BlockSpec((1, N, D), lambda g, i: (g, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd(q, k, v, *, block_q, valid_len):
    """q/k/v: (G, N, D) with G = B*H."""
    G, N, D = q.shape
    scale = 1.0 / (D ** 0.5)
    # 64-row groups give the best measured MXU/VPU overlap (see _fwd_kernel);
    # fall back to a single group when the block is too small to split
    ways = block_q // 64 if block_q % 64 == 0 and block_q >= 128 else 1
    kernel = functools.partial(
        _fwd_kernel, scale=scale, valid_len=valid_len, ways=ways
    )
    return pl.pallas_call(
        kernel,
        grid=(G, N // block_q),
        in_specs=[_blk_spec(block_q, D), _full_spec(N, D), _full_spec(N, D)],
        out_specs=_blk_spec(block_q, D),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref,
    dq_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, valid_len,
):
    i = pl.program_id(1)
    nq = pl.num_programs(1)

    q = q_ref[0]                                           # bf16 operands:
    k = k_ref[0]                                           # matmuls run
    v = v_ref[0]                                           # MXU-native with
    do = do_ref[0]                                         # fp32 accumulate
    o = o_ref[0]

    logits = _masked_logits(q, k, scale, valid_len, k.shape[0])
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)            # (BQ, N) fp32
    pc = p.astype(v.dtype)

    # dP = dO V^T ; dS = P * (dP - rowsum(dO * O))
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    ds = (p * (dp - delta)).astype(q.dtype)                # (BQ, N)

    dq_ref[0] = (
        jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
    ).astype(dq_ref.dtype)

    dk_blk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                              # (N, D)
    dv_blk = jax.lax.dot_general(
        pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                      # (N, D)

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    dk_acc[...] += dk_blk
    dv_acc[...] += dv_blk

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_vmem_bytes(block_q: int, N: int, D: int, eb: int) -> int:
    """Estimate of the full-KV backward's scoped-VMEM footprint, calibrated
    against Mosaic's own accounting at (block_q=512, N=2560, D=64, bf16) =
    16.06 MB measured vs 16.2 MB here: double-buffered q/o/do/dq blocks +
    resident k/v/dk/dv + fp32 dk/dv accumulators + ~2.5 live fp32 (BQ, N)
    intermediates (softmax, dP, dS)."""
    blocks = 2 * 4 * block_q * D * eb
    kv = 4 * N * D * eb
    scratch = 2 * N * D * 4
    inter = int(2.5 * block_q * N * 4)
    return blocks + kv + scratch + inter


_BWD_VMEM_BUDGET = 15 * 1024 * 1024  # 16 MB scoped stack minus margin


def _bwd_xla(valid_len, res, do):
    """Einsum backward for geometries whose full-KV Pallas bwd cannot fit
    scoped VMEM at any block size (e.g. the VAE bottleneck at D>=128 fp32:
    N=4096 needs 4*N*D*eb of resident k/v/dk/dv alone). lax.map runs one
    (batch, head) at a time so the materialized (N, N) fp32 logits stay at
    64 MB HBM for N=4096 instead of G times that."""
    q, k, v, o = res
    G, N, D = q.shape
    scale = 1.0 / (D ** 0.5)

    def one(args):
        q1, k1, v1, o1, do1 = args  # each (N, D)
        logits = jax.lax.dot_general(
            q1, k1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if valid_len < N:
            col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
            logits = jnp.where(col < valid_len, logits, -jnp.inf)
        p = jax.nn.softmax(logits, axis=-1)
        dp = jax.lax.dot_general(
            do1, v1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(
            do1.astype(jnp.float32) * o1.astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        ds = p * (dp - delta)
        dsc = ds.astype(q1.dtype)
        pc = p.astype(v1.dtype)
        dq = jax.lax.dot_general(
            dsc, k1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(
            dsc, q1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dv = jax.lax.dot_general(
            pc, do1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dq.astype(q1.dtype), dk.astype(k1.dtype), dv.astype(v1.dtype)

    return jax.lax.map(one, (q, k, v, o, do))


def _bwd(block_q, valid_len, res, do):
    q, k, v, o = res
    G, N, D = q.shape
    eb = q.dtype.itemsize
    # The backward tile carries BOTH the fp32 softmax (BQ, N) and the fp32
    # dP (BQ, N) plus the (N, D) fp32 dk/dv scratch — at block_q=512/N=2560
    # that is 16.06 MB, 60 KB OVER the 16 MB scoped-VMEM stack (measured:
    # axon AOT compile of the B=2 train step fails). The forward's swept
    # optimum (512) is therefore too big here; shrink until the estimated
    # footprint fits (halving preserves divisibility: the wrapper pads N to
    # a block_q multiple). Geometries that don't fit even at 64 (measured:
    # the quality probe's fp32 D=128 N=4096 VAE bwd OOMed Mosaic's 16 MB
    # stack at block_q=256) take the chunked XLA backward instead.
    while block_q > 64 and _bwd_vmem_bytes(block_q, N, D, eb) > _BWD_VMEM_BUDGET:
        block_q //= 2
    if _bwd_vmem_bytes(block_q, N, D, eb) > _BWD_VMEM_BUDGET:
        return _bwd_xla(valid_len, res, do)
    scale = 1.0 / (D ** 0.5)
    kernel = functools.partial(_bwd_kernel, scale=scale, valid_len=valid_len)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(G, N // block_q),
        in_specs=[
            _blk_spec(block_q, D), _full_spec(N, D), _full_spec(N, D),
            _blk_spec(block_q, D), _blk_spec(block_q, D),
        ],
        out_specs=[_blk_spec(block_q, D), _full_spec(N, D), _full_spec(N, D)],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, D), jnp.float32),
            pltpu.VMEM((N, D), jnp.float32),
        ],
    )(q, k, v, o, do)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, block_q, valid_len):
    return _fwd(q, k, v, block_q=block_q, valid_len=valid_len)


def _flash_vjp_fwd(q, k, v, block_q, valid_len):
    o = _fwd(q, k, v, block_q=block_q, valid_len=valid_len)
    return o, (q, k, v, o)


_flash.defvjp(_flash_vjp_fwd, _bwd)


# ---------------------------------------------------------------------------
# KV-blocked (online-softmax) variant — long sequences.
#
# The full-KV kernel above holds K/V (and a (BQ, N) logits tile) for one
# (batch, head) entirely in VMEM; past ~8k tokens that footprint crosses the
# VMEM budget. This variant streams K/V in blocks with the standard
# online-softmax recurrence, so VMEM usage is O(block_q * block_k) and the
# sequence length is unbounded. It is the TPU answer for untiled >=1024px
# inputs (33k joint tokens at 2048px) without latent tiling.
#
# At DiT4SR's serving shapes (<=2432 tokens) the full-KV kernel is faster
# (no m/l bookkeeping, one pass) — the wrapper dispatches on N.
# ---------------------------------------------------------------------------


def _fwd_kv_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    m_s, l_s, acc_s,
    *, scale, valid_len, block_k,
):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    q = q_ref[0]                               # (BQ, D) bf16
    k = k_ref[0]                               # (BK, D) bf16
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                  # (BQ, BK)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * block_k
    logits = jnp.where(col < valid_len, logits, NEG_INF)

    m_prev = m_s[:, :1]                        # (BQ, 1)
    m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_cur)
    p = jnp.exp(logits - m_cur)                # (BQ, BK)
    l_cur = l_s[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # (BQ, D)
    acc_s[...] = acc_s[...] * corr + pv
    m_s[...] = jnp.broadcast_to(m_cur, m_s.shape)
    l_s[...] = jnp.broadcast_to(l_cur, l_s.shape)

    @pl.when(j == nk - 1)
    def _():
        l = l_s[:, :1]
        o_ref[0] = (acc_s[...] / l).astype(o_ref.dtype)
        lse_ref[0] = m_s[:, :1] + jnp.log(l)


def _fwd_kv(q, k, v, *, block_q, block_k, valid_len):
    """q/k/v: (G, N, D). Returns (o, lse) with lse (G, N, 1) fp32.

    lse/delta ride as (G, N, 1) so their blocks are (1, block_q, 1) —
    Mosaic requires the last two block dims to be (8k, 128k) or equal the
    array dims, which a (1, block_q) block over (G, N) violates; the
    trailing singleton also lands them in the (BQ, 1) sublane orientation
    the kernels broadcast against, so no lane->sublane relayout."""
    G, N, D = q.shape
    scale = 1.0 / (D ** 0.5)
    kernel = functools.partial(
        _fwd_kv_kernel, scale=scale, valid_len=valid_len, block_k=block_k
    )
    kv_spec = pl.BlockSpec((1, block_k, D), lambda g, i, j: (g, j, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, block_q, D), lambda g, i, j: (g, i, 0),
                          memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, block_q, 1), lambda g, i, j: (g, i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(G, N // block_q, N // block_k),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=[q_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((G, N, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )(q, k, v)


def _dq_kv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    dq_s,
    *, scale, valid_len, block_k,
):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dq_s[...] = jnp.zeros_like(dq_s)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * block_k
    logits = jnp.where(col < valid_len, logits, NEG_INF)
    p = jnp.exp(logits - lse_ref[0])                   # (BQ, BK)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta_ref[0])).astype(q.dtype)
    dq_s[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = dq_s[...].astype(dq_ref.dtype)


def _dkv_kv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_s, dv_s,
    *, scale, valid_len, block_k,
):
    j = pl.program_id(1)
    i = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * block_k
    logits = jnp.where(col < valid_len, logits, NEG_INF)
    p = jnp.exp(logits - lse_ref[0])                   # (BQ, BK)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta_ref[0])).astype(q.dtype)
    dk_s[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dv_s[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_s[...].astype(dv_ref.dtype)


def _bwd_kv(block_q, block_k, valid_len, res, do):
    q, k, v, o, lse = res
    G, N, D = q.shape
    scale = 1.0 / (D ** 0.5)
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )                                                      # (G, N, 1)

    q_spec = pl.BlockSpec((1, block_q, D), lambda g, i, j: (g, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, D), lambda g, i, j: (g, j, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, 1), lambda g, i, j: (g, i, 0),
                            memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(
            _dq_kv_kernel, scale=scale, valid_len=valid_len, block_k=block_k
        ),
        grid=(G, N // block_q, N // block_k),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
    )(q, k, v, do, lse, delta)

    # dk/dv pass: kv tiles outer, q tiles inner
    q_spec2 = pl.BlockSpec((1, block_q, D), lambda g, j, i: (g, i, 0),
                           memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, block_k, D), lambda g, j, i: (g, j, 0),
                            memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, block_q, 1), lambda g, j, i: (g, i, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kv_kernel, scale=scale, valid_len=valid_len, block_k=block_k
        ),
        grid=(G, N // block_k, N // block_q),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2, row_spec2],
        out_specs=[kv_spec2, kv_spec2],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_kv(q, k, v, block_q, block_k, valid_len):
    o, _ = _fwd_kv(q, k, v, block_q=block_q, block_k=block_k,
                   valid_len=valid_len)
    return o


def _flash_kv_vjp_fwd(q, k, v, block_q, block_k, valid_len):
    o, lse = _fwd_kv(q, k, v, block_q=block_q, block_k=block_k,
                     valid_len=valid_len)
    return o, (q, k, v, o, lse)


_flash_kv.defvjp(_flash_kv_vjp_fwd, _bwd_kv)

# above this joint-sequence length the full-KV kernel's (BQ, N) logits tile +
# resident K/V stop fitting comfortably in VMEM — stream K/V instead
MAX_FULL_KV_LEN = 8192

# resident K+V byte cap for the full-KV kernel: together with the (BQ, N)
# logits tile they must fit the 16 MB scoped-VMEM stack. 9 MB keeps the
# measured-good VAE bottleneck (N=4096, D=512, bf16 -> 8.4 MB K+V, compiles
# and is the bench path) on the fast kernel while routing e.g. a 640px VAE
# encode (N=6400, D=512 -> 13.1 MB K+V plus a 13 MB logits tile) to the
# KV-blocked kernel instead of failing to compile.
MAX_FULL_KV_BYTES = 9 * 1024 * 1024


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    block_q: Optional[int] = None,
    valid_len: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """(B, H, N, D) attention. N is padded up to a block multiple internally
    and the pad keys masked statically. Callers that already align N can pass
    `valid_len` < N to mask their own trailing pad tokens WITHOUT the wrapper
    re-padding (saves 3 full q/k/v copies). A runtime `key_mask` is not
    supported by this kernel — callers with dynamic masks use the XLA path.

    Two kernels behind one interface:
      * N <= MAX_FULL_KV_LEN and block_k is None — full-KV kernel (K/V for
        one (batch, head) resident in VMEM; fastest at serving shapes).
      * otherwise — KV-blocked online-softmax kernel (VMEM O(block_q*block_k),
        unbounded N); pass `block_k` explicitly to force it."""
    if key_mask is not None:
        raise NotImplementedError(
            "pallas flash attention uses static padding masks; pass "
            "key_mask=None (use attn_impl='xla' for runtime masks)"
        )
    B, H, N, D = q.shape
    if valid_len is None:
        valid_len = N
    if block_q is None:
        # 512 is fastest at serving shapes (with the ways-split fwd kernel),
        # but the full-KV (block_q, N) fp32 logits tile must stay under the
        # 16 MB scoped-VMEM stack: 512x8192x4 = 16.8 MB would OOM
        block_q = 512 if N <= 4096 else 256
    use_kv_blocked = (
        block_k is not None
        or N > MAX_FULL_KV_LEN
        or 2 * N * D * q.dtype.itemsize > MAX_FULL_KV_BYTES
    )
    if use_kv_blocked and block_k is None:
        block_k = 512
    align = block_q if not use_kv_blocked else (
        block_q * block_k // math.gcd(block_q, block_k)
    )
    n_pad = (-N) % align
    if n_pad > 0:
        pad4 = ((0, 0), (0, 0), (0, n_pad), (0, 0))
        q = jnp.pad(q, pad4)
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
    Np = N + n_pad

    q_g = q.reshape(B * H, Np, D)
    k_g = k.reshape(B * H, Np, D)
    v_g = v.reshape(B * H, Np, D)

    if use_kv_blocked:
        out = _flash_kv(q_g, k_g, v_g, block_q, block_k, valid_len)
    else:
        out = _flash(q_g, k_g, v_g, block_q, valid_len)
    out = out.reshape(B, H, Np, D)
    return out[:, :, :N] if n_pad > 0 else out
