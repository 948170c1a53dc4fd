"""Compile-probe: flash attention fwd+bwd at the B=2 train geometry that
OOM'd scoped VMEM (48, 2560, 64) with block_q=512 before the bwd cap."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from dit4sr_tpu.ops.flash_attention import flash_attention

B, H, N, D = 2, 24, 2560, 64
q = jnp.ones((B, H, N, D), jnp.bfloat16)
k = jnp.ones((B, H, N, D), jnp.bfloat16) * 0.5
v = jnp.ones((B, H, N, D), jnp.bfloat16) * 0.25


def loss(q, k, v):
    return flash_attention(q, k, v, valid_len=2405).astype(jnp.float32).sum()


g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
dq, dk, dv = g(q, k, v)
print("compiled+ran ok:", float(dq.sum()), float(dk.sum()), float(dv.sum()))
