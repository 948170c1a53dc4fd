"""Deform-attn kernel variants on real TPU: looped vs phased, fwd and bwd.

Full DiT4SR encoder geometry (B=2, M=8, L=4 levels of 64x64, Q=16384, P=4).
Timing discipline per CLAUDE.md: K dependent iterations inside ONE jit (the
next iteration's value is perturbed by the previous output) so per-call axon
RPC overhead amortizes and the relay cache can't serve repeats; hard-sync by
pulling a scalar.

Usage: python tools/bench_deform_kernel.py [pallas|pallas_phased] [K]
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.ops.deform_attn import ms_deform_attn

impl = sys.argv[1] if len(sys.argv) > 1 else "pallas"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8

B, M, D, P = 2, 8, 32, 4
HW = 64
shapes = [(HW, HW)] * 4
S = 4 * HW * HW
Q = S
rng = np.random.default_rng(0)
value = jnp.asarray(rng.normal(size=(B, S, M, D)).astype(np.float32))
loc = jnp.asarray(rng.uniform(0.0, 1.0, size=(B, Q, M, 4, P, 2)).astype(np.float32))
w = jnp.asarray(rng.uniform(size=(B, Q, M, 4, P)).astype(np.float32))
w = w / w.sum(axis=(-2, -1), keepdims=True)


def chain_fwd(v):
    def body(v, _):
        out = ms_deform_attn(v, shapes, loc, w, impl=impl)
        v = v * (1.0 + 1e-6 * jnp.mean(out))    # data dependency
        return v, jnp.mean(out)
    v, outs = jax.lax.scan(body, v, jnp.arange(K))
    return jnp.sum(outs)


def chain_bwd(v):
    def body(v, _):
        def loss(vv):
            return jnp.sum(ms_deform_attn(vv, shapes, loc, w, impl=impl) ** 2)
        l, g = jax.value_and_grad(loss)(v)
        v = v + 1e-9 * g                          # data dependency
        return v, l
    v, losses = jax.lax.scan(body, v, jnp.arange(K))
    return jnp.sum(losses)


for name, fn in (("fwd", chain_fwd), ("fwd+bwd", chain_bwd)):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    r = float(f(value))
    print(f"[{impl}] {name} compile+first: {time.perf_counter()-t0:.1f} s "
          f"(chk {r:.3e})", flush=True)
    for trial in range(3):
        v_t = value * (1.0 + 1e-5 * (trial + 1))  # defeat the relay cache
        t0 = time.perf_counter()
        r = float(f(v_t))
        dt = time.perf_counter() - t0
        print(f"[{impl}] {name}: {dt/K*1e3:.2f} ms/call ({K} chained, "
              f"total {dt:.3f} s, chk {r:.3e})", flush=True)
