"""Flagship-scale TSM (OCR-guided) sampling cost on real TPU.

The reference's default eval protocol is TSM prompts: every denoising step
the TESTR spotter reads the MMDiT's features and the predicted words are
rewritten into the prompt (pipeline_dit4sr.py:1214-1446; val config
run_configs/val/val_realtext_FINAL_dit4sr_stage3.yaml). Round-3 review
(weak #7): the exact sampler is benched (1.53 s/image) but no s/image exists
for the OCR-guided step. This tool measures, at the serving flagship
geometry (SD3.5-medium MMDiT, folded bf16; full-size TESTR fp32, 64x64
feature maps, 16k proposals):

  plain    velocity-only step (the exact sampler's per-step cost)
  spot     velocity + 24-layer hq+control feature extraction + fuse +
           TESTR inference (detection/recognition heads, static top-K)
  spotter  TESTR inference alone on fixed features (isolates the spotter)

and projects 28-step TSM s/image at spot_every cadences 1/4/28
(OCRGuidedSampler.spot_every; host prompt re-encode cost is additive and
encoder-dependent — the zero-asset container has no CLIP/T5 weights, so it
is reported as a separate line per measured probe, not folded in).

Timing discipline (CLAUDE.md): chained dependent calls inside one jit to
amortize the ~30-40 ms axon RPC overhead; varied inputs so the relay cache
cannot serve repeats; hard-sync by pulling a scalar.

Usage: python tools/bench_tsm_step.py [K]   ->  artifacts/tsm_latency.json
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import TESTRConfig, mmdit_base
from dit4sr_tpu.models.mmdit import MMDiT, fold_control_projections
from dit4sr_tpu.models.testr.detector import TextSpotter
from dit4sr_tpu.models.testr.model import fuse_dit_features

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
NUM_STEPS = 28

base_cfg = mmdit_base().with_(param_dtype=jnp.bfloat16)
mcfg = base_cfg.with_(
    folded_control=True, feat_extract_layers=tuple(range(24)),
)
tcfg = TESTRConfig()
mmdit = MMDiT(mcfg)
spotter = TextSpotter(tcfg, feat_hw=(64, 64))

lat = jnp.zeros((1, 64, 64, 16), jnp.bfloat16)
txt = jnp.zeros((1, 333, 4096), jnp.bfloat16)
pool = jnp.zeros((1, 2048), jnp.bfloat16)
t0arr = jnp.zeros((1,), jnp.float32)

print("init flagship params...", flush=True)
mparams = jax.jit(
    lambda: MMDiT(base_cfg).init(jax.random.PRNGKey(0), lat, lat, txt, pool, t0arr)
)()
mparams = fold_control_projections(mparams, base_cfg)
feats0 = jnp.zeros((24, 1, 64, 64, 768), jnp.float32)
tparams = jax.jit(lambda: spotter.init(jax.random.PRNGKey(1), feats0))()

rng = np.random.default_rng(0)
z = jnp.asarray(rng.normal(size=(1, 64, 64, 16)).astype(np.float32))
ctrl = jnp.asarray(rng.normal(size=(1, 64, 64, 16)).astype(np.float32))
te = jnp.asarray(rng.normal(size=(1, 333, 4096)).astype(np.float32))
pe = jnp.asarray(rng.normal(size=(1, 2048)).astype(np.float32))


def plain_chain(mp, z0):
    def body(zc, i):
        out, _ = mmdit.apply(
            mp, zc.astype(jnp.bfloat16), ctrl.astype(jnp.bfloat16),
            te.astype(jnp.bfloat16), pe.astype(jnp.bfloat16),
            jnp.full((1,), 500.0 + i, jnp.float32),
        )
        zc = zc + 1e-3 * out.astype(jnp.float32)   # data dependency
        return zc, jnp.mean(out)
    z1, outs = jax.lax.scan(body, z0, jnp.arange(K))
    return jnp.sum(outs) + jnp.mean(z1)


def spot_chain(mp, tp, z0):
    def body(zc, i):
        out, feats = mmdit.apply(
            mp, zc.astype(jnp.bfloat16), ctrl.astype(jnp.bfloat16),
            te.astype(jnp.bfloat16), pe.astype(jnp.bfloat16),
            jnp.full((1,), 500.0 + i, jnp.float32),
            extract_features=True,
        )
        maps = fuse_dit_features(feats.astype(jnp.float32), mcfg.patch_size, 2)
        preds = spotter.predict(tp, maps)
        zc = zc + 1e-3 * out.astype(jnp.float32)
        return zc, jnp.mean(preds.scores)
    z1, scores = jax.lax.scan(body, z0, jnp.arange(K))
    return jnp.sum(scores) + jnp.mean(z1)


def spotter_chain(tp, f0):
    def body(fc, i):
        preds = spotter.predict(tp, fc)
        fc = fc * (1.0 + 1e-6 * jnp.mean(preds.scores))
        return fc, jnp.mean(preds.scores)
    _, scores = jax.lax.scan(body, f0, jnp.arange(K))
    return jnp.sum(scores)


feats_in = jnp.asarray(rng.normal(size=(24, 1, 64, 64, 768)).astype(np.float32))

results = {}
for name, fn, args in (
    ("plain", plain_chain, (mparams, z)),
    ("spot", spot_chain, (mparams, tparams, z)),
    ("spotter_only", spotter_chain, (tparams, feats_in)),
):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    r = float(f(*args))
    print(f"[{name}] compile+first: {time.perf_counter() - t0:.1f} s "
          f"(chk {r:.3e})", flush=True)
    times = []
    for trial in range(3):
        scale = 1.0 + 1e-5 * (trial + 1)   # defeat the relay cache
        varied = tuple(
            a if i < len(args) - 1 else args[-1] * scale
            for i, a in enumerate(args)
        )
        t0 = time.perf_counter()
        r = float(f(*varied))
        dt = time.perf_counter() - t0
        times.append(dt / K)
        print(f"[{name}] {dt / K * 1e3:.2f} ms/step ({K} chained)", flush=True)
    results[name] = sorted(times)[len(times) // 2]

spot_ms = results["spot"] * 1e3
plain_ms = results["plain"] * 1e3
proj = {}
for cadence in (1, 4, NUM_STEPS):
    n_spot = (NUM_STEPS + cadence - 1) // cadence
    s = (n_spot * results["spot"] + (NUM_STEPS - n_spot) * results["plain"])
    proj[f"spot_every_{cadence}"] = round(s, 4)

out = {
    "geometry": "SD3.5-medium MMDiT folded bf16 + full TESTR fp32, B=1, "
                "64x64 latent, 333 text tokens",
    "plain_ms_per_step": round(plain_ms, 2),
    "spot_ms_per_step": round(spot_ms, 2),
    "spotting_overhead_ms": round(spot_ms - plain_ms, 2),
    "spotter_only_ms": round(results["spotter_only"] * 1e3, 2),
    "projected_28step_tsm_s_per_image": proj,
    "note": "host prompt re-encode (CLIP x2 + T5) is additive and weight-"
            "dependent; zero-asset container cannot measure it",
}
path = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "tsm_latency.json"
path.write_text(json.dumps(out, indent=1))
print(json.dumps(out, indent=1))
