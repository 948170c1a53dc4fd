"""Is int8 x int8 -> int32 on the v5e MXU actually ~2x bf16?

Feasibility probe for a quantized (w8a8) inference mode. Uses the same
dependent-chain-inside-one-jit methodology as mxu_roofline.py (per-call axon
RPC overhead otherwise dominates). The chain requantizes the int32
accumulator back to int8 each step (absmax), which is also what a real w8a8
layer stack does between layers.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp


def bench_int8(n, iters):
    key = jax.random.PRNGKey(0)
    a = jax.random.randint(key, (n, n), -127, 128, jnp.int8)
    b = jax.random.randint(jax.random.PRNGKey(1), (n, n), -127, 128, jnp.int8)

    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(iters):
            acc = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # requantize to keep the chain int8 (absmax per tensor)
            m = jnp.maximum(jnp.max(jnp.abs(acc)), 1)
            x = jnp.clip(
                (acc * (127.0 / m)).astype(jnp.float32), -127, 127
            ).astype(jnp.int8)
        return x

    chain(a, b).block_until_ready()
    # vary inputs between calls: identical (executable, inputs) pairs can be
    # served from the axon relay cache (CLAUDE.md)
    a2 = jnp.roll(a, 1, axis=0)
    r = chain(a2, b); float(r.astype(jnp.float32).sum())
    a3 = jnp.roll(a, 2, axis=0)
    t0 = time.perf_counter()
    r = chain(a3, b); float(r.astype(jnp.float32).sum())
    dt = time.perf_counter() - t0
    fl = 2 * n**3 * iters
    print(f"int8 n={n} iters={iters}: {dt*1e3:.1f} ms  {fl/dt/1e12:.1f} TOP/s")


def bench_bf16_ref(n, iters):
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(iters):
            x = jnp.dot(x, b)
        return x

    chain(a, b).block_until_ready()
    a2 = jnp.roll(a, 1, axis=0)
    r = chain(a2, b); float(r.astype(jnp.float32).sum())
    a3 = jnp.roll(a, 2, axis=0)
    t0 = time.perf_counter()
    r = chain(a3, b); float(r.astype(jnp.float32).sum())
    dt = time.perf_counter() - t0
    fl = 2 * n**3 * iters
    print(f"bf16 n={n} iters={iters}: {dt*1e3:.1f} ms  {fl/dt/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    for n, it in ((4096, 100), (1536, 400)):
        bench_bf16_ref(n, it)
        bench_int8(n, it)
        bench_int8(n, it)
