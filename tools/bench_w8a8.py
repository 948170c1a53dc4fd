"""Full MMDiT forward: bf16 (folded, serving config) vs w8a8 int8.

Measures the realized end-to-end gain of the opt-in quantized serving mode
(ops/quant.py) at the 128->512 SR geometry. Chains 5 dependent forwards per
timing call to amortize axon RPC overhead.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
from dit4sr_tpu.config import mmdit_base
from dit4sr_tpu.models.mmdit import MMDiT, fold_control_projections
from dit4sr_tpu.ops.quant import quantize_mmdit_params

base_cfg = mmdit_base().with_(param_dtype=jnp.bfloat16)
lat = jnp.zeros((1, 64, 64, 16), jnp.bfloat16)
txt = jnp.zeros((1, 333, 4096), jnp.bfloat16)
pool = jnp.zeros((1, 2048), jnp.bfloat16)
t = jnp.zeros((1,), jnp.float32)

params = jax.jit(
    lambda: MMDiT(base_cfg).init(jax.random.PRNGKey(0), lat, lat, txt, pool, t)
)()
params = fold_control_projections(params, base_cfg)


def bench(tag, cfg, p):
    model = MMDiT(cfg)

    @jax.jit
    def chain(p, lat, txt, pool, t):
        x = lat
        for _ in range(5):
            out, _ = model.apply(p, x, lat, txt, pool, t)
            x = out.astype(jnp.bfloat16)
        return x

    r = chain(p, lat, txt, pool, t); float(r.astype(jnp.float32).sum())
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        r = chain(p, lat * (1 + 1e-6 * i), txt, pool, t)
        float(r.astype(jnp.float32).sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best/5*1e3:.1f} ms/fwd", flush=True)
    return best / 5


if __name__ == "__main__":
    fcfg = base_cfg.with_(folded_control=True)
    t_b = bench("bf16 folded", fcfg, params)
    qparams = quantize_mmdit_params(params, fcfg)
    t_q = bench("w8a8 folded", fcfg.with_(w8a8=True), qparams)
    print(f"speedup x{t_b/t_q:.3f}")
