import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from dit4sr_tpu.config import mmdit_base
from dit4sr_tpu.models.mmdit import MMDiT, fold_control_projections

base_cfg = mmdit_base().with_(param_dtype=jnp.bfloat16)
mcfg = base_cfg.with_(folded_control=True)
mmdit = MMDiT(mcfg)
lat = jnp.zeros((1, 64, 64, 16), jnp.bfloat16)
txt = jnp.zeros((1, 333, 4096), jnp.bfloat16)
pool = jnp.zeros((1, 2048), jnp.bfloat16)
t = jnp.zeros((1,), jnp.float32)
params = jax.jit(lambda: MMDiT(base_cfg).init(jax.random.PRNGKey(0), lat, lat, txt, pool, t))()
params = fold_control_projections(params, base_cfg)

def fwd(p, lat, txt, pool, t):
    return mmdit.apply(p, lat, lat, txt, pool, t)

lowered = jax.jit(fwd).lower(params, lat, txt, pool, t)
comp = lowered.compile()
ca = comp.cost_analysis()
if isinstance(ca, list): ca = ca[0]
for k in sorted(ca):
    if "bytes" in k or k == "flops":
        v = ca[k]
        if v > 1e6: print(f"{k}: {v/1e9:.2f} G")
ma = comp.memory_analysis()
print("memory_analysis:", ma)
import time
o = comp(params, lat, txt, pool, t); float(o[0].astype(jnp.float32).sum()) if isinstance(o, tuple) else float(o.astype(jnp.float32).sum())
for i in range(3):
    t0 = time.perf_counter()
    o = comp(params, lat * (1+1e-6*i), txt, pool, t)
    x = o[0] if isinstance(o, (tuple, list)) else o
    float(x.astype(jnp.float32).sum())
    print(f"fwd: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
