"""No-feedback spotting pass over the probe's HELD-OUT scenes.

The r5 vote tuner exposed a calib/eval asymmetry: the calibration log
(no-feedback pass over train scenes) supports voted F1 ~0.54, while the
eval log — recorded during the *feedback* TSM pass — supports only ~0.28.
Hypothesis: per-step prompt feedback amplifies wrong words (they get
rendered, then re-read). This tool runs the SAME no-feedback protocol on
the held-out scenes and dumps `eval_nofb_spot_log.npz`, so replaying the
tuned vote config measures what a two-phase (read-then-restore) TSM would
believe on held-out data.

Usage: python tools/spot_nofeedback_eval.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dit4sr_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from dit4sr_tpu.config import SamplerConfig, SchedulerConfig
    from dit4sr_tpu.data.degradation import realesrgan_degradation
    from dit4sr_tpu.data.textscenes import make_scene_records
    from dit4sr_tpu.eval.probe_setup import (
        load_probe_weights, ocr_probe_degradation, ocr_probe_encoder,
        ocr_probe_geometry,
    )
    from dit4sr_tpu.models.mmdit import MMDiT
    from dit4sr_tpu.models.testr.detector import TextSpotter
    from dit4sr_tpu.models.vae import AutoencoderKL
    from dit4sr_tpu.pipelines.ocr_guided import OCRGuidedSampler
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline

    out_dir = "artifacts/quality_probe_ocr"
    size, n_eval, infer_steps = 256, 16, 14
    geom = ocr_probe_geometry(size, smoke=False)
    vae_cfg, model_cfg, testr_cfg, _, _ = geom
    vae_params, sf, shf, tag, params_s = load_probe_weights(out_dir)
    vae_cfg = vae_cfg.with_(scaling_factor=sf, shift_factor=shf)
    vae = AutoencoderKL(vae_cfg)
    mmdit = MMDiT(model_cfg)
    spotter = TextSpotter(testr_cfg)
    encoder = ocr_probe_encoder(geom)
    deg_sampler = ocr_probe_degradation()

    rng = jax.random.PRNGKey(0)
    eval_recs = make_scene_records(n_eval, size=size, seed=2,
                                   min_scale=2.0, max_scale=4.5)
    eval_gt = np.stack([r["image"] for r in eval_recs])
    deg_probe = jax.jit(
        lambda k, g: realesrgan_degradation(
            k, g, deg_sampler(None, g.shape[0]), use_usm=False
        )[1]
    )
    # EXACT probe eval inputs: same keys as quality_probe_ocr.py
    lq = jnp.clip(deg_probe(jax.random.fold_in(rng, 5), jnp.asarray(eval_gt)),
                  0.0, 1.0)
    rng_s = jax.random.fold_in(rng, 6)

    pipe = SRPipeline(
        mmdit, vae, model_cfg, vae_cfg, SchedulerConfig(),
        SamplerConfig(num_inference_steps=infer_steps, guidance_scale=1.0,
                      start_point="lr", align_method="adain",
                      process_size=size),
    )
    params = {"mmdit": params_s["mmdit"], "vae": vae_params,
              "testr": params_s["testr"]}
    sampler = OCRGuidedSampler(pipe, spotter, encoder, caption_style="tag",
                               correct_fn=None, correct_steps=())
    _, log = sampler(params, rng_s, lq, [""] * n_eval, return_ocr_log=True)
    np.savez_compressed(
        os.path.join(out_dir, "eval_nofb_spot_log.npz"),
        scores=np.stack([r.scores for r in log]),
        recs=np.stack([r.recs for r in log]),
        keep=np.stack([r.keep for r in log]),
    )
    print(f"[nofb] wrote eval_nofb_spot_log.npz ({len(log)} steps, {tag})")


if __name__ == "__main__":
    main()
