"""Evaluation entry point: python scripts/evaluate.py --config configs/val_realtext.yaml

Rebuild of test/test.py's CLI: per-sample x4 SR with optional OCR-guided
prompting (TSM), full + bbox-crop metrics, aggregate table. Real weights via
--sd3_ckpt/--mmdit_ckpt/--vae_ckpt/--testr_ckpt/--text_ckpt; running with
random weights requires --allow_random (the metrics would be noise) and tags
every artifact RANDOM-WEIGHTS. `--smoke` runs one tiny synthetic image.

Reference eval protocol (test/test.py:309-347): x4 bicubic LQ pre-upscale,
prompt source gt|pred_tsm|null, 40 steps, guidance 1.0.
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--sd3_ckpt", default=None,
                    help="SD3.5 diffusers root (transformer+vae+text encoders)")
    ap.add_argument("--mmdit_ckpt", default=None)
    ap.add_argument("--vae_ckpt", default=None)
    ap.add_argument("--testr_ckpt", default=None)
    ap.add_argument("--spot_every", type=int, default=1,
                    help="pred_tsm spotting cadence (1 = reference default)")
    ap.add_argument("--spot_threshold", type=float, default=None,
                    help="override TESTR inference_th_test (calibrated)")
    ap.add_argument("--vlm_correct", default=None,
                    help="HF vision2seq ckpt dir: preview-image OCR word "
                         "correction (reference Qwen-VL hook)")
    ap.add_argument("--vlm_correct_every", type=int, default=7)
    ap.add_argument("--lora_ckpt", default=None,
                    help="diffusers/PEFT SD3 LoRA .safetensors merged into "
                         "the transformer (SD3LoraLoaderMixin equivalent)")
    ap.add_argument("--lora_scale", type=float, default=1.0)
    ap.add_argument("--text_ckpt", default=None)
    ap.add_argument("--metric_weights_dir", default=None,
                    help="dir with converted LPIPS/DISTS/... weights")
    ap.add_argument("--num_images", type=int, default=None)
    ap.add_argument("--allow_random", action="store_true",
                    help="proceed with random weights (metrics are noise)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry + one synthetic image")
    args = ap.parse_args()

    import cv2

    from dit4sr_tpu.bootstrap import (
        banner,
        build_mmdit,
        build_prompt_encoder,
        build_testr,
        build_vae,
    )
    from dit4sr_tpu.config import (
        MMDiTConfig,
        SamplerConfig,
        SchedulerConfig,
        TESTRConfig,
        VAEConfig,
        load_yaml_config,
        mmdit_tiny,
        testr_tiny,
        vae_tiny,
    )
    from dit4sr_tpu.data.satext import (
        load_samtext_annotations,
        make_synthetic_records,
        synthesize_prompt,
    )
    from dit4sr_tpu.eval.harness import Evaluator
    from dit4sr_tpu.pipelines.ocr_guided import OCRGuidedSampler
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline, bicubic_upscale
    from dit4sr_tpu.train.ocr_loss import num_streams_extracted

    cfgs = load_yaml_config(args.config)
    with open(args.config) as f:
        raw = yaml.safe_load(f)
    data = raw.get("data", {})
    model_cfg = cfgs.get("model", MMDiTConfig())
    vae_cfg = cfgs.get("vae", VAEConfig())
    sampler_cfg = cfgs.get("sampler", SamplerConfig())
    testr_cfg = cfgs.get("testr", TESTRConfig())
    use_tsm = data.get("text_cond_prompt") == "pred_tsm"

    process_size, latent_size, t5_len = sampler_cfg.process_size, 64, 256
    if args.smoke:
        vae_cfg = vae_tiny()
        feat_layers = (0, 1) if (model_cfg.feat_extract_layers or use_tsm) else ()
        model_cfg = mmdit_tiny(
            feat_extract=model_cfg.feat_extract,
            feat_extract_layers=feat_layers,
            streams=model_cfg.streams,
            ffn_couplings=model_cfg.ffn_couplings,
            in_channels=vae_cfg.latent_channels,
            out_channels=vae_cfg.latent_channels,
        )
        testr_cfg = testr_tiny(
            num_dit_layers=len(feat_layers) or 2,
            num_feature_levels=min(4, len(feat_layers) or 2),
            dit_dim=model_cfg.inner_dim,
            feat_extract=model_cfg.feat_extract,
        )
        import dataclasses

        sampler_cfg = dataclasses.replace(
            sampler_cfg, num_inference_steps=2, process_size=64
        )
        process_size, latent_size, t5_len = 64, 16, 16

    text_len = 77 + t5_len
    out_dir = args.out_dir or os.path.join(
        "results", os.path.splitext(os.path.basename(args.config))[0]
    )
    os.makedirs(out_dir, exist_ok=True)

    # models + weights
    rng0 = jax.random.PRNGKey(0)
    mmdit, mparams, mmdit_loaded = build_mmdit(
        model_cfg, rng0, None if args.smoke else (args.mmdit_ckpt or args.sd3_ckpt),
        text_len=text_len,
    )
    if args.lora_ckpt:
        # merged before jit: zero runtime cost (models/lora.py; the
        # reference's SD3LoraLoaderMixin surface)
        from dit4sr_tpu.models.lora import load_sd3_lora, merge_lora

        mparams = merge_lora(
            mparams, load_sd3_lora(args.lora_ckpt), scale=args.lora_scale
        )
    vae, vparams, vae_loaded = build_vae(
        vae_cfg, jax.random.fold_in(rng0, 1),
        None if args.smoke else (args.vae_ckpt or args.sd3_ckpt),
    )
    params = {"mmdit": mparams, "vae": vparams}

    encoder, text_loaded = build_prompt_encoder(
        None if args.smoke else (args.text_ckpt or args.sd3_ckpt), t5_length=t5_len
    )
    if args.smoke:
        from dit4sr_tpu.text.encoders import HashTextEncoder

        encoder = HashTextEncoder(seq_len=text_len,
                                  joint_dim=model_cfg.joint_attention_dim,
                                  pooled_dim=model_cfg.pooled_projection_dim)

    random_weights = not (mmdit_loaded and vae_loaded and text_loaded)
    if random_weights and not args.smoke:
        msg = (
            "EVAL WITH RANDOM/FALLBACK WEIGHTS — every metric below is NOISE. "
            "Pass --sd3_ckpt/--mmdit_ckpt/... for a real evaluation."
        )
        if not args.allow_random:
            banner(msg + " (refusing; use --allow_random to force)")
            sys.exit(2)
        banner(msg)

    pipe = SRPipeline(
        mmdit, vae, model_cfg, vae_cfg,
        cfgs.get("scheduler", SchedulerConfig()), sampler_cfg,
    )

    sampler = None
    if use_tsm:
        n_ext = num_streams_extracted(model_cfg)
        c = model_cfg.inner_dim // (model_cfg.patch_size ** 2) * n_ext
        feats_shape = (
            len(model_cfg.feat_extract_layers), 1, latent_size, latent_size, c,
        )
        spotter, tparams, _ = build_testr(
            testr_cfg, jax.random.PRNGKey(2), feats_shape,
            None if args.smoke else args.testr_ckpt,
            feat_hw=(latent_size, latent_size),
        )
        params["testr"] = tparams
        correct_fn = None
        correct_steps = ()
        if args.vlm_correct:
            from dit4sr_tpu.text.vlm import VLMCorrectionAgent

            correct_fn = VLMCorrectionAgent(model_path=args.vlm_correct)
            correct_steps = tuple(
                range(0, sampler_cfg.num_inference_steps,
                      max(1, args.vlm_correct_every))
            )
        sampler = OCRGuidedSampler(
            pipe, spotter, encoder,
            spot_every=args.spot_every,
            threshold=args.spot_threshold,
            correct_fn=correct_fn,
            correct_steps=correct_steps,
            correct_with_image=correct_fn is not None,
        )
    fn = pipe.jit()

    # val data: LQ images + optional HQ/anns
    if args.smoke:
        records = make_synthetic_records(
            1, image_size=process_size, num_ctrl_points=testr_cfg.num_ctrl_points
        )
        lq_items = [
            (None, cv2.resize(r["image"], (process_size // sampler_cfg.upscale,) * 2))
            for r in records
        ]
    else:
        records = load_samtext_annotations(data["ann_path"], data["hq_img_path"])
        lq_paths = sorted(glob(os.path.join(data["lq_img_path"], "*.jpg")))
        lq_items = [(p, None) for p in lq_paths]
    evaluator = Evaluator(out_dir=out_dir)

    samples = []
    n = args.num_images or len(lq_items)
    for (lq_path, lq_arr), rec in list(zip(lq_items, records))[:n]:
        if lq_arr is None:
            lq_arr = (
                cv2.cvtColor(cv2.imread(lq_path), cv2.COLOR_BGR2RGB).astype(
                    np.float32
                )
                / 255.0
            )
        lq = jnp.asarray(lq_arr)[None]
        lq_up = bicubic_upscale(lq, sampler_cfg.upscale)

        prompt_mode = data.get("text_cond_prompt", "null")
        prompt = synthesize_prompt(rec["text"]) if prompt_mode == "gt" else ""

        rng = jax.random.PRNGKey(42)
        if sampler is not None:
            pred = sampler(params, rng, lq_up, [prompt])
        else:
            txt, pool = encoder([prompt])
            pred = fn(params, rng, lq_up, txt, pool)

        if "image" in rec:
            gt_img = rec["image"]
        else:
            gt_img = cv2.cvtColor(
                cv2.imread(rec["img_path"]), cv2.COLOR_BGR2RGB
            ).astype(np.float32) / 255.0
        boxes = [
            (b[0] - b[2] / 2, b[1] - b[3] / 2, b[0] + b[2] / 2, b[1] + b[3] / 2)
            for b in (rec["bbox"] * process_size)
        ]
        samples.append(
            {
                "img_id": rec["img_id"],
                "pred": np.asarray(pred[0]),
                "gt": gt_img,
                "boxes_xyxy": boxes,
            }
        )
        tag = "RANDOM-WEIGHTS_" if random_weights else ""
        cv2.imwrite(
            os.path.join(out_dir, f"{tag}{rec['img_id']}_sr.png"),
            cv2.cvtColor(
                (np.asarray(pred[0]) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR
            ),
        )

    result = evaluator.run(samples)
    agg = result.aggregate()
    if random_weights:
        agg = {f"RANDOM-WEIGHTS/{k}": v for k, v in agg.items()}
    print(agg)


if __name__ == "__main__":
    main()
