"""Full-size TESTR loss+grad on TPU: pallas vs xla deform sampling."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import sys, time
import jax, jax.numpy as jnp, numpy as np
from dit4sr_tpu.config import TESTRConfig
from dit4sr_tpu.models.testr.detector import TextSpotter, pad_targets

impl = sys.argv[1] if len(sys.argv) > 1 else "auto"
cfg = TESTRConfig(deform_impl=impl)
B, HW, C = 2, 64, 768
spotter = TextSpotter(cfg, feat_hw=(HW, HW))
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.normal(size=(cfg.num_dit_layers, B, HW, HW, C)).astype(np.float32))
print("init...", flush=True)
params = spotter.init(jax.random.PRNGKey(0), feats)

raw = []
for i in range(B):
    n = 3 + i
    raw.append({
        "labels": np.zeros((n,), np.int32),
        "boxes": np.clip(rng.uniform(0.2, 0.8, (n, 4)), 0.05, 0.95).astype(np.float32),
        "ctrl_points": rng.uniform(0.1, 0.9, (n, cfg.num_ctrl_points, 2)).astype(np.float32),
        "texts": rng.integers(0, cfg.voc_size, (n, cfg.max_text_len)).astype(np.int32),
    })
targets = pad_targets(raw, cfg)

def loss_fn(p, f):
    total, _ = spotter.loss(p, f, targets)
    return total

grad = jax.jit(jax.grad(loss_fn))
print("compiling grad...", flush=True)
t0 = time.perf_counter()
g = grad(params, feats)
s = float(jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0))
print(f"compile+first: {time.perf_counter()-t0:.1f} s (chk {s:.3e})", flush=True)
for t in range(3):
    t0 = time.perf_counter()
    g = grad(params, feats * (1.0 + 1e-6 * (t + 1)))
    s = float(jnp.sum(jnp.abs(g["params"]["level_embed"])))
    print(f"loss+grad step: {time.perf_counter()-t0:.2f} s (chk {s:.3e})", flush=True)
