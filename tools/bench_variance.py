"""Bound the axon-RPC variance on the headline bench (VERDICT r4, weak #5).

BENCH_r03 (1.5343 s/image) vs BENCH_r04 (1.5609) drifted +1.7% with zero
perf commits; CLAUDE.md documents 30-40 ms/call axon RPC overhead but the
run-to-run spread had never been measured. This runs bench.py's exact
pipeline once-compiled and times N repeats with varied rng keys (identical
calls can be served from the axon relay cache), reporting the spread.

Usage: python tools/bench_variance.py [--reps 15]
Writes artifacts/bench_variance.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--out", default="artifacts/bench_variance.json")
    args = ap.parse_args()

    pipe, params = bench.build()
    fn = pipe.jit()
    from dit4sr_tpu.pipelines.sr_pipeline import bicubic_upscale

    lq = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 128, 3), jnp.float32)
    lq_up = bicubic_upscale(lq, 4)
    txt = jax.random.normal(jax.random.PRNGKey(3), (1, 333, 4096), jnp.bfloat16)
    pool = jax.random.normal(jax.random.PRNGKey(4), (1, 2048), jnp.bfloat16)

    out = fn(params, jax.random.PRNGKey(5), lq_up, txt, pool)
    float(out.astype(jnp.float32).sum())  # compile + hard sync

    times = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        out = fn(params, jax.random.PRNGKey(100 + i), lq_up, txt, pool)
        float(out.astype(jnp.float32).sum())
        times.append(time.perf_counter() - t0)
        print(f"rep {i}: {times[-1]:.4f} s")

    s = sorted(times)
    n = len(s)
    report = {
        "reps": n,
        "p50": s[n // 2],
        "p10": s[max(0, int(0.10 * n))],
        "p90": s[min(n - 1, int(0.90 * n))],
        "min": s[0],
        "max": s[-1],
        "spread_pct_p90_vs_p50": 100.0 * (s[min(n - 1, int(0.90 * n))] / s[n // 2] - 1.0),
        "times": times,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in report.items() if k != "times"}))


if __name__ == "__main__":
    main()
