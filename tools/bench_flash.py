import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time, functools
import jax, jax.numpy as jnp
from dit4sr_tpu.ops.flash_attention import flash_attention
from dit4sr_tpu.ops.attention import mha_reference

B, H, D = 1, 24, 64
VALID = 2381


def qkv(N, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (B, H, N, D), jnp.bfloat16) for k in ks)


def timed(name, fn, q, k, v, iters=40):
    N = q.shape[2]

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
    print(f"{name}: {dt*1e3:.2f} ms/call  {fl/dt/1e12:.1f} TFLOP/s", flush=True)


q, k, v = qkv(2560)
timed("pallas flash (N=2560, bq=256, valid=2381)",
      functools.partial(flash_attention, valid_len=VALID), q, k, v)
timed("pallas flash (N=2560, full)", flash_attention, q, k, v)
timed("xla mha_reference (N=2560)", mha_reference, q, k, v)

# tighter alignment: 2381 tokens padded to 2432 (block 128) instead of 2560
# (block 256) — ~10% fewer logits-area FLOPs if block size is perf-neutral
q2, k2, v2 = (x[:, :, :2432] for x in (q, k, v))
for bq in (128, 64):
    timed(f"pallas flash (N=2432, bq={bq}, valid=2381)",
          functools.partial(flash_attention, block_q=bq, valid_len=VALID),
          q2, k2, v2)

# KV-blocked online-softmax kernel at the serving shape (expected slower than
# the full-KV kernel here; it exists for long sequences)
timed("pallas flash kv-blocked (N=2560, bq=256, bk=512, valid=2381)",
      functools.partial(flash_attention, valid_len=VALID, block_k=512),
      q, k, v)

# long-sequence case: 1024px-untiled-equivalent joint sequence (2*4096 img +
# 333 text = 8525). The full-KV kernel's (BQ, N) logits tile + resident K/V
# pressure VMEM here; the blocked kernel streams K/V.
ql, kl, vl = qkv(8704, seed=1)
timed("pallas flash kv-blocked (N=8704, bq=256, bk=512, valid=8525)",
      functools.partial(flash_attention, valid_len=8525, block_k=512),
      ql, kl, vl, iters=10)
timed("pallas flash full-KV (N=8704, valid=8525)",
      functools.partial(flash_attention, valid_len=8525),
      ql, kl, vl, iters=10)
