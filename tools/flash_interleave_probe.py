"""Probe: can VPU softmax overlap MXU matmuls inside the flash kernel?

The fwd kernel's per-block chain is matmul (MXU) -> softmax (VPU) -> matmul
(MXU), strictly dependent, so the units serialize. Splitting the query block
into two independent halves and phase-ordering the ops
(logits1, logits2, softmax1, pv1, softmax2, pv2) gives Mosaic's scheduler
data-independent VPU/MXU work to overlap. This measures whether it does.

Methodology: dependent in-jit chains, varied inputs between timed calls
(relay-cache rule, CLAUDE.md).
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dit4sr_tpu.ops.flash_attention import _blk_spec, _full_spec, _masked_logits
from dit4sr_tpu.ops.flash_attention import flash_attention

B, H, D = 1, 24, 64
VALID = 2381


def _fwd_kernel_split(q_ref, k_ref, v_ref, o_ref, *, scale, valid_len, ways):
    k = k_ref[0]
    v = v_ref[0]
    bq = q_ref.shape[1]
    h = bq // ways
    logits = [
        _masked_logits(q_ref[0, i * h:(i + 1) * h], k, scale, valid_len,
                       k.shape[0])
        for i in range(ways)
    ]
    for i in range(ways):
        m = jnp.max(logits[i], axis=-1, keepdims=True)
        p = jnp.exp(logits[i] - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, i * h:(i + 1) * h] = (o / l).astype(o_ref.dtype)


def flash_split(q, k, v, *, block_q=256, valid_len=None, ways=2):
    Bq, Hq, N, Dq = q.shape
    G = Bq * Hq
    q3 = q.reshape(G, N, Dq)
    k3 = k.reshape(G, N, Dq)
    v3 = v.reshape(G, N, Dq)
    kernel = functools.partial(
        _fwd_kernel_split, scale=1.0 / (Dq ** 0.5),
        valid_len=valid_len if valid_len is not None else N, ways=ways,
    )
    out = pl.pallas_call(
        kernel,
        grid=(G, N // block_q),
        in_specs=[_blk_spec(block_q, Dq), _full_spec(N, Dq), _full_spec(N, Dq)],
        out_specs=_blk_spec(block_q, Dq),
        out_shape=jax.ShapeDtypeStruct(q3.shape, q3.dtype),
    )(q3, k3, v3)
    return out.reshape(Bq, Hq, N, Dq)


def timed(name, fn, q, k, v, iters=40):
    N = q.shape[2]

    @jax.jit
    def chain(q, k, v):
        x = q
        for _ in range(iters):
            x = fn(x, k, v)
        return x

    chain(q, k, v).block_until_ready()
    r = chain(q * 1.0009765625, k, v); float(r.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    r = chain(q * 0.9990234375, k, v); float(r.astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    fl = 2 * 2 * H * N * N * D
    print(f"{name}: {dt*1e3:.2f} ms/call  {fl/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, 2560, D), jnp.bfloat16) for kk in ks)

    # parity first
    want = flash_attention(q, k, v, valid_len=VALID)
    got = flash_split(q, k, v, valid_len=VALID, ways=2)
    import numpy as np

    err = float(jnp.max(jnp.abs(want.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"parity max|diff| = {err:.2e}")
    assert err < 2e-2

    timed("baseline flash (bq=256)",
          functools.partial(flash_attention, valid_len=VALID), q, k, v)
    # bq > 512 exceeds the 16 MB scoped-VMEM stack (bq x N fp32 logits)
    for ways, bqs in ((4, (512,)), (8, (256, 512)), (16, (512,)),
                      (32, (512,))):
        for bq in bqs:
            timed(f"split ways={ways} (bq={bq})",
                  functools.partial(flash_split, valid_len=VALID,
                                    ways=ways, block_q=bq),
                  q, k, v)
