"""Measure Delta-DiT block caching (arXiv 2406.01125) on the real bench
geometry: 28-step 128->512 SR, SD3.5-medium MMDiT, one chip.

For each (cache_interval, cache_span) setting, runs the same end-to-end
pipeline as bench.py and prints s/image. Span (13, 24) caches the rear
11 single-attention blocks; (12, 24) adds the last dual block.

Usage: python tools/bench_block_cache.py
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import build
from dit4sr_tpu.pipelines.sr_pipeline import bicubic_upscale

SETTINGS = [
    (1, None),          # baseline
    (2, (12, 24)),      # rear half every other step
    (2, (16, 24)),      # rear third every other step
    (3, (12, 24)),      # rear half, 1 full step in 3
]


def main():
    pipe, params = build()
    lq = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 128, 3), jnp.float32)
    lq_up = bicubic_upscale(lq, 4)
    txt = jax.random.normal(jax.random.PRNGKey(3), (1, 333, 4096), jnp.bfloat16)
    pool = jax.random.normal(jax.random.PRNGKey(4), (1, 2048), jnp.bfloat16)

    results = []
    for interval, span in SETTINGS:
        p = dataclasses.replace(
            pipe.sampler_cfg, cache_interval=interval, cache_span=span
        )
        pipe.sampler_cfg = p
        fn = pipe.jit()
        out = fn(params, jax.random.PRNGKey(5), lq_up, txt, pool)
        float(out.astype(jnp.float32).sum())
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out = fn(params, jax.random.PRNGKey(6 + i), lq_up, txt, pool)
            float(out.astype(jnp.float32).sum())
            times.append(time.perf_counter() - t0)
        p50 = sorted(times)[len(times) // 2]
        results.append(
            {"interval": interval, "span": span, "s_per_image": round(p50, 4)}
        )
        print(json.dumps(results[-1]), flush=True)

    base = results[0]["s_per_image"]
    for r in results[1:]:
        r["speedup"] = round(base / r["s_per_image"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
