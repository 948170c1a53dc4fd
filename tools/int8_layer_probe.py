"""w8a8 at the ACTUAL MMDiT layer shapes: is a full quantized Dense layer
(per-token absmax act quant -> int8 dot -> per-channel dequant + bias)
faster than the bf16 Dense it would replace?

Shapes: B=1 inference has ~4429 joint tokens at the 128->512 SR geometry
(2x2048 image + 333 text); attention projections are (M,1536)x(1536,1536),
FFN is (M,1536)x(1536,6144) then (M,6144)x(6144,1536). Chains alternate
in/out to stay dependent (defeats the axon relay cache).
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp

M = 4429


def _time(fn, x, *args):
    # vary the activation input per call: identical (executable, inputs)
    # pairs can be served from the axon relay cache (CLAUDE.md)
    fn(x, *args)
    r = fn(x * 1.0009765625, *args); float(jnp.asarray(r, jnp.float32).sum())
    t0 = time.perf_counter()
    r = fn(x * 0.9990234375, *args); float(jnp.asarray(r, jnp.float32).sum())
    return time.perf_counter() - t0


def w8a8_layer(x, w_i8, w_scale, bias):
    """x: (M,K) bf16 -> (M,N) bf16 through an int8 MXU dot."""
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-6)
    a_scale = (amax / 127.0).astype(jnp.float32)
    x_i8 = jnp.round(x.astype(jnp.float32) / a_scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8, w_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (a_scale * w_scale[None, :]) + bias
    return out.astype(jnp.bfloat16)


def bench(K, N, iters, tag):
    k0 = jax.random.PRNGKey(0)
    x = jax.random.normal(k0, (M, K), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.PRNGKey(2), (N, K), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((N,), jnp.float32)
    b2 = jnp.zeros((K,), jnp.float32)

    @jax.jit
    def chain_bf16(x, w1, w2):
        for _ in range(iters):
            x = jnp.tanh(jnp.dot(x, w1) @ w2)
        return x

    q1 = jnp.clip(jnp.round(w1.astype(jnp.float32) * 127 / 0.1), -127, 127).astype(jnp.int8)
    s1 = jnp.full((N,), 0.1 / 127, jnp.float32)
    q2 = jnp.clip(jnp.round(w2.astype(jnp.float32) * 127 / 0.1), -127, 127).astype(jnp.int8)
    s2 = jnp.full((K,), 0.1 / 127, jnp.float32)

    @jax.jit
    def chain_i8(x, q1, s1, q2, s2):
        for _ in range(iters):
            h = w8a8_layer(x, q1, s1, b1)
            x = jnp.tanh(w8a8_layer(h, q2, s2, b2))
        return x

    dt_b = _time(chain_bf16, x, w1, w2)
    dt_q = _time(chain_i8, x, q1, s1, q2, s2)
    fl = 2 * M * K * N * 2 * iters
    print(
        f"{tag}: bf16 {dt_b*1e3:.1f} ms ({fl/dt_b/1e12:.0f} TFLOP/s)  "
        f"w8a8 {dt_q*1e3:.1f} ms ({fl/dt_q/1e12:.0f} TOP/s)  "
        f"speedup x{dt_b/dt_q:.2f}"
    )


if __name__ == "__main__":
    for _ in range(2):
        bench(1536, 1536, 100, "attn-proj (4429,1536)x(1536,1536)")
        bench(1536, 6144, 40, "ffn (4429,1536)x(1536,6144)x(6144,1536)")
