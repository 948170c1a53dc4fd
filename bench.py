"""Headline benchmark: 28-step 128px->512px SR latency on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The north-star target is < 2 s/image on one TPU chip (BASELINE.json);
vs_baseline = 2.0 / measured_seconds (>1 means beating the target).

Runs the real flagship geometry end to end: SD3.5-medium MMDiT
(24 blocks, dim 1536, 2-stream control, 2048 img + 333 text tokens),
full SD3 VAE encode+decode at 512px, 28 flow-match Euler steps in one
jitted scan, adain color fix.

NOTE: parameters are jit *arguments* everywhere — closing over them bakes
multi-GB constants into the HLO and stalls compilation (see
pipelines/sr_pipeline.py docstring).
"""

import json
import time

import jax
import jax.numpy as jnp

from dit4sr_tpu.config import (
    SamplerConfig,
    SchedulerConfig,
    mmdit_base,
    VAEConfig,
)
from dit4sr_tpu.models.mmdit import MMDiT
from dit4sr_tpu.models.vae import AutoencoderKL
from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline, bicubic_upscale

NUM_STEPS = 28
TARGET_S = 2.0


def build():
    # folded control projections: exact-math inference optimization
    # (models/mmdit.py fold_control_projections)
    base_cfg = mmdit_base().with_(param_dtype=jnp.bfloat16)
    mcfg = base_cfg.with_(folded_control=True)
    vcfg = VAEConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

    from dit4sr_tpu.models.mmdit import fold_control_projections

    mmdit = MMDiT(mcfg)
    lat = jnp.zeros((1, 64, 64, 16), jnp.bfloat16)
    txt = jnp.zeros((1, 333, 4096), jnp.bfloat16)
    pool = jnp.zeros((1, 2048), jnp.bfloat16)
    t = jnp.zeros((1,), jnp.float32)
    mparams = jax.jit(
        lambda: MMDiT(base_cfg).init(jax.random.PRNGKey(0), lat, lat, txt, pool, t)
    )()
    mparams = fold_control_projections(mparams, base_cfg)

    vae = AutoencoderKL(vcfg)
    vparams = jax.jit(
        lambda: vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    )()

    scfg = SamplerConfig(num_inference_steps=NUM_STEPS, align_method="adain")
    pipe = SRPipeline(mmdit, vae, mcfg, vcfg, SchedulerConfig(), scfg)
    return pipe, {"mmdit": mparams, "vae": vparams}


def main():
    pipe, params = build()
    fn = pipe.jit()

    lq = jax.random.uniform(jax.random.PRNGKey(2), (1, 128, 128, 3), jnp.float32)
    lq_up = bicubic_upscale(lq, 4)  # 512x512 input to the pipeline
    txt = jax.random.normal(jax.random.PRNGKey(3), (1, 333, 4096), jnp.bfloat16)
    pool = jax.random.normal(jax.random.PRNGKey(4), (1, 2048), jnp.bfloat16)

    # compile + warmup; pull a value to fully synchronize (axon's
    # block_until_ready can return before remote execution completes)
    out = fn(params, jax.random.PRNGKey(5), lq_up, txt, pool)
    float(out.astype(jnp.float32).sum())

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(params, jax.random.PRNGKey(6 + i), lq_up, txt, pool)
        float(out.astype(jnp.float32).sum())  # hard sync
        times.append(time.perf_counter() - t0)

    p50 = sorted(times)[len(times) // 2]
    print(
        json.dumps(
            {
                "metric": "sr_28step_128to512_s_per_image",
                "value": round(p50, 4),
                "unit": "s/image",
                "vs_baseline": round(TARGET_S / p50, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
