"""Evaluation entry point: python scripts/evaluate.py --config configs/val_realtext.yaml

Rebuild of test/test.py's CLI: per-sample x4 SR with optional OCR-guided
prompting, full + bbox-crop metrics, aggregate table."""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--ckpt_dir", default=None, help="orbax checkpoint dir")
    ap.add_argument("--num_images", type=int, default=None)
    args = ap.parse_args()

    import cv2

    from dit4sr_tpu.config import (
        MMDiTConfig,
        SamplerConfig,
        SchedulerConfig,
        TESTRConfig,
        VAEConfig,
        load_yaml_config,
    )
    from dit4sr_tpu.data.satext import load_samtext_annotations, synthesize_prompt
    from dit4sr_tpu.eval.harness import Evaluator
    from dit4sr_tpu.models.mmdit import MMDiT, init_mmdit
    from dit4sr_tpu.models.testr.detector import TextSpotter
    from dit4sr_tpu.models.vae import AutoencoderKL
    from dit4sr_tpu.pipelines.ocr_guided import OCRGuidedSampler
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline, bicubic_upscale
    from dit4sr_tpu.text.encoders import HashTextEncoder

    cfgs = load_yaml_config(args.config)
    with open(args.config) as f:
        raw = yaml.safe_load(f)
    data = raw.get("data", {})
    model_cfg = cfgs.get("model", MMDiTConfig())
    vae_cfg = cfgs.get("vae", VAEConfig())
    sampler_cfg = cfgs.get("sampler", SamplerConfig())
    out_dir = args.out_dir or os.path.join(
        "results", os.path.splitext(os.path.basename(args.config))[0]
    )

    mmdit, mparams = init_mmdit(jax.random.PRNGKey(0), model_cfg, text_len=333)
    vae = AutoencoderKL(vae_cfg)
    vparams = jax.jit(
        lambda: vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), vae_cfg.dtype))
    )()
    params = {"mmdit": mparams, "vae": vparams}

    pipe = SRPipeline(
        mmdit, vae, model_cfg, vae_cfg,
        cfgs.get("scheduler", SchedulerConfig()), sampler_cfg,
    )
    encoder = HashTextEncoder(seq_len=333)

    use_tsm = data.get("text_cond_prompt") == "pred_tsm"
    sampler = None
    if use_tsm:
        testr_cfg = cfgs.get("testr", TESTRConfig())
        spotter = TextSpotter(testr_cfg)
        feats0 = jnp.zeros(
            (len(model_cfg.feat_extract_layers), 1, 64, 64,
             model_cfg.inner_dim // 4 * 2),
            jnp.float32,
        )
        params["testr"] = spotter.init(jax.random.PRNGKey(2), feats0)
        sampler = OCRGuidedSampler(pipe, spotter, encoder)
    fn = pipe.jit()

    # val data: LQ images + optional HQ/anns
    records = load_samtext_annotations(data["ann_path"], data["hq_img_path"])
    lq_paths = sorted(glob(os.path.join(data["lq_img_path"], "*.jpg")))
    evaluator = Evaluator(out_dir=out_dir)

    samples = []
    n = args.num_images or len(lq_paths)
    for lq_path, rec in list(zip(lq_paths, records))[:n]:
        lq = cv2.cvtColor(cv2.imread(lq_path), cv2.COLOR_BGR2RGB)
        lq = jnp.asarray(lq.astype(np.float32) / 255.0)[None]
        lq_up = bicubic_upscale(lq, sampler_cfg.upscale)

        prompt_mode = data.get("text_cond_prompt", "null")
        if prompt_mode == "gt":
            prompt = synthesize_prompt(rec["text"])
        else:
            prompt = ""

        rng = jax.random.PRNGKey(42)
        if sampler is not None:
            pred = sampler(params, rng, lq_up, [prompt])
        else:
            txt, pool = encoder([prompt])
            pred = fn(params, rng, lq_up, txt, pool)

        gt_img = cv2.cvtColor(cv2.imread(rec["img_path"]), cv2.COLOR_BGR2RGB)
        gt_img = gt_img.astype(np.float32) / 255.0
        boxes = [
            (b[0] - b[2] / 2, b[1] - b[3] / 2, b[0] + b[2] / 2, b[1] + b[3] / 2)
            for b in (rec["bbox"] * 512)
        ]
        samples.append(
            {
                "img_id": rec["img_id"],
                "pred": np.asarray(pred[0]),
                "gt": gt_img,
                "boxes_xyxy": boxes,
            }
        )
        cv2.imwrite(
            os.path.join(out_dir, f"{rec['img_id']}_sr.png"),
            cv2.cvtColor((np.asarray(pred[0]) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
        )

    result = evaluator.run(samples)
    print(result.aggregate())


if __name__ == "__main__":
    main()
