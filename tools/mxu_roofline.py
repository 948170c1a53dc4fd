import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp

def bench_matmul(n, iters, dtype=jnp.bfloat16):
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), dtype)

    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(iters):
            x = jnp.dot(x, b)  # dependent chain defeats relay caching
        return x

    chain(a, b).block_until_ready()
    r = chain(a, b); float(r.astype(jnp.float32).sum())  # hard sync
    t0 = time.perf_counter()
    r = chain(a, b); float(r.astype(jnp.float32).sum())
    dt = time.perf_counter() - t0
    fl = 2 * n**3 * iters
    print(f"n={n} iters={iters} {dtype.__name__}: {dt*1e3:.1f} ms  {fl/dt/1e12:.1f} TFLOP/s")

bench_matmul(8192, 50)
bench_matmul(8192, 50)
bench_matmul(4096, 200)
bench_matmul(2048, 800)
bench_matmul(1536, 800)
