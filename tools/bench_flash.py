import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time, functools
import jax, jax.numpy as jnp
from dit4sr_tpu.ops.flash_attention import flash_attention
from dit4sr_tpu.ops.attention import mha_reference

B, H, N, D = 1, 24, 2560, 64
VALID = 2381
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (B, H, N, D), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (B, H, N, D), jnp.bfloat16)

def timed(name, fn, iters=40):
    @jax.jit
    def chain(q, k, v):
        x = q
        for _ in range(iters):
            x = fn(x, k, v)
        return x
    chain(q, k, v).block_until_ready()
    r = chain(q, k, v); float(r.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    r = chain(q, k, v); float(r.astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    fl = 2 * 2 * H * N * N * D  # qk + pv
    print(f"{name}: {dt*1e3:.2f} ms/call  {fl/dt/1e12:.1f} TFLOP/s")

timed("pallas flash (valid=2381)", functools.partial(flash_attention, valid_len=VALID))
timed("pallas flash (full 2560)", flash_attention)
timed("xla mha_reference", mha_reference)
