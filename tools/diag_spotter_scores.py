"""Diagnose the OCR probe's spotter score distribution.

The round-3 probe failed with word F1 = 0.0: zero queries cleared the fixed
0.45 inference threshold (config.py TESTRConfig.inference_th_test), so the
TSM sampler degenerated to the null prompt. But the stage-2/3 loss decomposition
(raw focal CE ~0.34, ctrl-point L1 ~0.046/coord, text CE ~0.92 nats/char vs
4.57 chance) says the spotter LEARNED — the scores are probably informative
but uncalibrated for a 1500-step probe-scale model.

This tool reruns per-step spotting on the probe's held-out scenes with the
existing pickles and prints, per denoise step: max/mean query score, and the
top-K words (raw + dictionary-snapped) vs GT, plus F1 at a sweep of
thresholds. Runs on CPU by default (tiny geometry).

Usage: JAX_PLATFORMS=cpu python tools/diag_spotter_scores.py [--n 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="artifacts/quality_probe_ocr")
    ap.add_argument("--n", type=int, default=4, help="eval scenes to spot")
    ap.add_argument("--infer_steps", type=int, default=14)
    ap.add_argument("--topk", type=int, default=8)
    args = ap.parse_args()

    from dit4sr_tpu.config import SamplerConfig, SchedulerConfig
    from dit4sr_tpu.data import charset
    from dit4sr_tpu.data.degradation import realesrgan_degradation
    from dit4sr_tpu.data.textscenes import WORDS, make_scene_records
    from dit4sr_tpu.eval.probe_setup import (
        load_probe_weights, ocr_probe_degradation, ocr_probe_encoder,
        ocr_probe_geometry,
    )
    from dit4sr_tpu.models.mmdit import MMDiT
    from dit4sr_tpu.models.testr.detector import TextSpotter
    from dit4sr_tpu.models.vae import AutoencoderKL
    from dit4sr_tpu.pipelines.ocr_guided import OCRGuidedSampler
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline
    from dit4sr_tpu.text.dictionary import snap_words

    size = 256
    geom = ocr_probe_geometry(size, smoke=False)
    vae_cfg, model_cfg, testr_cfg, latent_size, text_len = geom
    encoder = ocr_probe_encoder(geom)
    vae_params, sf, shf, tag, params_stage = load_probe_weights(args.out_dir)
    print(f"[diag] loaded {tag} weights")
    vae_cfg = vae_cfg.with_(scaling_factor=sf, shift_factor=shf)

    eval_recs = make_scene_records(16, size=size, seed=2, min_scale=2.0,
                                   max_scale=4.5)[: args.n]
    eval_gt = np.stack([r["image"] for r in eval_recs])
    deg_sampler = ocr_probe_degradation()
    rng = jax.random.PRNGKey(0)
    deg = jax.jit(
        lambda k, g: realesrgan_degradation(
            k, g, deg_sampler(None, g.shape[0]), use_usm=False
        )[1]
    )
    lq = jnp.clip(deg(jax.random.fold_in(rng, 5), jnp.asarray(eval_gt)), 0.0, 1.0)

    sampler_cfg = SamplerConfig(
        num_inference_steps=args.infer_steps, guidance_scale=1.0,
        start_point="lr", align_method="adain", process_size=size,
    )
    pipe = SRPipeline(
        MMDiT(model_cfg), AutoencoderKL(vae_cfg), model_cfg, vae_cfg,
        SchedulerConfig(), sampler_cfg,
    )
    spotter = TextSpotter(testr_cfg)
    params = {
        "mmdit": params_stage["mmdit"], "vae": vae_params,
        "testr": params_stage["testr"],
    }
    guided = OCRGuidedSampler(
        pipe, spotter, encoder, caption_style="tag",
        correct_fn=lambda words, i: snap_words(words, WORDS),
        correct_steps=tuple(range(args.infer_steps)),
    )
    _, ocr_log = guided(
        params, jax.random.fold_in(rng, 6), lq,
        [""] * args.n, return_ocr_log=True,
    )

    gt_words = [sorted(set(r["text"])) for r in eval_recs]
    print(f"GT words: {gt_words}")
    for i, res in enumerate(ocr_log):
        s = res.scores  # (B, K)
        print(f"step {i:2d}: score max {s.max():.3f} mean {s.mean():.3f} "
              f"p90 {np.percentile(s, 90):.3f}")

    # final step: top-K words per image regardless of threshold
    final = ocr_log[-1]
    for b in range(args.n):
        sc = final.scores[b]
        order_b = np.argsort(-sc)[: args.topk]
        top_words = [charset.decode(final.recs[b, q]) for q in order_b]
        snapped = snap_words([w for w in top_words if w], WORDS)
        print(f"img {b}: gt={gt_words[b]}")
        print(f"  top{args.topk} scores: {[round(float(sc[q]), 3) for q in order_b]}")
        print(f"  top{args.topk} raw:    {top_words}")
        print(f"  snapped:            {snapped}")


if __name__ == "__main__":
    main()
