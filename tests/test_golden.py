"""Golden-output regression: the tiny pipeline's output for a fixed seed and
fixed weights must stay bit-stable across refactors (the TPU answer to the
reference's checked-in few_eval artifacts, SURVEY.md §4).

Regenerate (after an INTENTIONAL behavior change):
    python tests/test_golden.py --regen
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "tiny_pipeline.npz")


def _run():
    from dit4sr_tpu.config import SamplerConfig, SchedulerConfig, mmdit_tiny, vae_tiny
    from dit4sr_tpu.models.mmdit import init_mmdit
    from dit4sr_tpu.models.vae import AutoencoderKL
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline

    mcfg = mmdit_tiny(in_channels=4, out_channels=4, sample_size=8)
    vcfg = vae_tiny()
    mmdit, mparams = init_mmdit(jax.random.PRNGKey(0), mcfg, text_len=8)
    vae = AutoencoderKL(vcfg)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), vcfg.dtype))
    pipe = SRPipeline(
        mmdit, vae, mcfg, vcfg, SchedulerConfig(),
        SamplerConfig(num_inference_steps=3, align_method="wavelet"),
    )
    rng = np.random.default_rng(7)
    lq = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(1, 8, mcfg.joint_attention_dim)), jnp.float32)
    pool = jnp.asarray(rng.normal(size=(1, mcfg.pooled_projection_dim)), jnp.float32)
    out = pipe({"mmdit": mparams, "vae": vparams}, jax.random.PRNGKey(11), lq, txt, pool)
    return np.asarray(out)


def test_pipeline_output_matches_golden():
    assert os.path.exists(GOLDEN), "golden missing; run tests/test_golden.py --regen"
    expected = np.load(GOLDEN)["output"]
    got = _run()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, output=_run())
        print(f"regenerated {GOLDEN}")
