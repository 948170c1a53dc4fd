"""Combined serving fast path: Delta-DiT block cache + w8a8 int8 matmuls.

bench.py stays exact; this measures the opt-in approximate stack
(`scripts/serve.py --w8a8 --cache_interval 2 --cache_span 12,24`) at the
headline 28-step 128->512 geometry. Exact baseline for comparison: 1.57
s/image; cache alone: 1.27 (tools/bench_block_cache.py); w8a8 alone: x1.17
on the MMDiT forward (tools/bench_w8a8.py).
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp

from dit4sr_tpu.config import SamplerConfig, SchedulerConfig, VAEConfig, mmdit_base
from dit4sr_tpu.models.mmdit import MMDiT, fold_control_projections
from dit4sr_tpu.models.vae import AutoencoderKL
from dit4sr_tpu.ops.quant import quantize_mmdit_params
from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline, bicubic_upscale

NUM_STEPS = 28


def run(w8a8: bool, cache: bool, interval: int = 2, span=(12, 24)) -> float:
    base_cfg = mmdit_base().with_(param_dtype=jnp.bfloat16)
    mcfg = base_cfg.with_(folded_control=True)
    vcfg = VAEConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

    lat = jnp.zeros((1, 64, 64, 16), jnp.bfloat16)
    txt0 = jnp.zeros((1, 333, 4096), jnp.bfloat16)
    pool0 = jnp.zeros((1, 2048), jnp.bfloat16)
    t = jnp.zeros((1,), jnp.float32)
    mparams = jax.jit(
        lambda: MMDiT(base_cfg).init(jax.random.PRNGKey(0), lat, lat, txt0, pool0, t)
    )()
    mparams = fold_control_projections(mparams, base_cfg)
    if w8a8:
        mparams = quantize_mmdit_params(mparams, mcfg)
        mcfg = mcfg.with_(w8a8=True)
    mmdit = MMDiT(mcfg)

    vae = AutoencoderKL(vcfg)
    vparams = jax.jit(
        lambda: vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    )()

    scfg = SamplerConfig(
        num_inference_steps=NUM_STEPS,
        align_method="adain",
        cache_interval=interval if cache else 1,
        cache_span=span if cache else None,
    )
    pipe = SRPipeline(mmdit, vae, mcfg, vcfg, SchedulerConfig(), scfg)
    fn = pipe.jit()
    params = {"mmdit": mparams, "vae": vparams}

    lq = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 128, 3), jnp.float32)
    lq_up = bicubic_upscale(lq, 4)
    txt = jax.random.normal(jax.random.PRNGKey(3), (1, 333, 4096), jnp.bfloat16)
    pool = jax.random.normal(jax.random.PRNGKey(4), (1, 2048), jnp.bfloat16)

    out = fn(params, jax.random.PRNGKey(5), lq_up, txt, pool)
    float(out.astype(jnp.float32).sum())
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(params, jax.random.PRNGKey(6 + i), lq_up, txt, pool)
        float(out.astype(jnp.float32).sum())
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    tag = f" interval={interval} span={span}" if cache else ""
    print(f"w8a8={w8a8} cache={cache}{tag}: {p50:.3f} s/image", flush=True)
    return p50


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        for interval in (2, 3):
            run(w8a8=True, cache=True, interval=interval)
    else:
        run(w8a8=True, cache=False)
        run(w8a8=True, cache=True)
