"""Self-contained demo: synthetic LQ image -> x4 SR with OCR-guided prompts,
artifact dumps (SR image, side-by-side mosaic, OCR overlay, per-step words).

Runs with random weights in any environment (proves the full system path);
pass --mmdit_ckpt / --vae_ckpt to use real SD3.5 weights.

    python scripts/demo.py --out_dir /tmp/demo --steps 4 --size 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize pins jax_platforms; honor an explicit env override
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
import jax.numpy as jnp
import numpy as np


def synthetic_lq(size: int, seed: int = 0) -> np.ndarray:
    """A textured image with a text-like high-contrast block."""
    import cv2

    rng = np.random.default_rng(seed)
    small = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    img = cv2.resize(small, (size, size), interpolation=cv2.INTER_CUBIC).clip(0, 1)
    u8 = (img * 255).astype(np.uint8)
    cv2.putText(
        u8, "STOP", (size // 8, size // 2), cv2.FONT_HERSHEY_SIMPLEX,
        size / 128.0, (255, 255, 255), max(1, size // 64),
    )
    return u8.astype(np.float32) / 255.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="/tmp/dit4sr_demo")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--size", type=int, default=128, help="LQ input size")
    ap.add_argument("--mmdit_ckpt", default=None)
    ap.add_argument("--vae_ckpt", default=None)
    ap.add_argument("--no_ocr", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry (CPU-friendly CI path)")
    args = ap.parse_args()

    import cv2

    from dit4sr_tpu.config import (
        SamplerConfig, SchedulerConfig, TESTRConfig, mmdit_base, VAEConfig,
        mmdit_tiny, testr_tiny, vae_tiny,
    )
    from dit4sr_tpu.eval.visualize import draw_ocr_overlay, side_by_side
    from dit4sr_tpu.models.mmdit import MMDiT, init_mmdit
    from dit4sr_tpu.models.testr.detector import TextSpotter
    from dit4sr_tpu.models.vae import AutoencoderKL
    from dit4sr_tpu.pipelines.ocr_guided import OCRGuidedSampler
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline, bicubic_upscale
    from dit4sr_tpu.text.encoders import HashTextEncoder

    os.makedirs(args.out_dir, exist_ok=True)
    if args.smoke:
        vcfg = vae_tiny()
        mcfg = mmdit_tiny(
            feat_extract_layers=(0, 1) if not args.no_ocr else (),
            in_channels=vcfg.latent_channels,
            out_channels=vcfg.latent_channels,
        )
        args.size = min(args.size, 16)
    else:
        mcfg = mmdit_base().with_(
            param_dtype=jnp.bfloat16,
            feat_extract_layers=tuple(range(24)) if not args.no_ocr else (),
        )
        vcfg = VAEConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

    latent_hw = args.size * 4 // 8  # x4 SR, /8 VAE
    mmdit = MMDiT(mcfg)
    lat0 = jnp.zeros((1, latent_hw, latent_hw, mcfg.in_channels), mcfg.dtype)
    txt0 = jnp.zeros((1, 333, mcfg.joint_attention_dim), mcfg.dtype)
    pool0 = jnp.zeros((1, mcfg.pooled_projection_dim), mcfg.dtype)
    if args.mmdit_ckpt:
        from dit4sr_tpu.utils.weights import convert_mmdit, load_safetensors

        sd = load_safetensors(
            os.path.join(args.mmdit_ckpt, "diffusion_pytorch_model.safetensors")
        )
        mparams = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16), convert_mmdit(sd, mcfg)
        )
    else:
        mparams = jax.jit(
            lambda: mmdit.init(jax.random.PRNGKey(0), lat0, lat0, txt0, pool0, jnp.ones((1,)))
        )()
    vae = AutoencoderKL(vcfg)
    if args.vae_ckpt:
        from dit4sr_tpu.utils.weights import convert_vae, load_safetensors

        sd = load_safetensors(
            os.path.join(args.vae_ckpt, "diffusion_pytorch_model.safetensors")
        )
        vparams = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16), convert_vae(sd, vcfg)
        )
    else:
        vparams = jax.jit(
            lambda: vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
        )()

    pipe = SRPipeline(
        mmdit, vae, mcfg, vcfg, SchedulerConfig(),
        SamplerConfig(num_inference_steps=args.steps, align_method="adain"),
    )
    encoder = HashTextEncoder(
        seq_len=333 if not args.smoke else 16,
        joint_dim=mcfg.joint_attention_dim,
        pooled_dim=mcfg.pooled_projection_dim,
    )
    params = {"mmdit": mparams, "vae": vparams}

    lq = synthetic_lq(args.size)
    lq_up = bicubic_upscale(jnp.asarray(lq[None]), 4)
    prompt = "A real-world photograph with the text \"STOP\"."

    ocr_words = []
    if args.no_ocr:
        txt, pool = encoder([prompt])
        sr = pipe.jit()(params, jax.random.PRNGKey(42), lq_up, txt, pool)
    else:
        if args.smoke:
            testr_cfg = testr_tiny(
                num_dit_layers=len(mcfg.feat_extract_layers),
                num_feature_levels=min(4, len(mcfg.feat_extract_layers)),
                dit_dim=mcfg.inner_dim,
            )
        else:
            testr_cfg = TESTRConfig()
        n_ext = 2 if testr_cfg.feat_extract == "hq+control" else 1
        c_feat = mcfg.inner_dim // (mcfg.patch_size ** 2) * n_ext
        spotter = TextSpotter(testr_cfg, feat_hw=(latent_hw, latent_hw))
        feats0 = jnp.zeros(
            (len(mcfg.feat_extract_layers), 1, latent_hw, latent_hw, c_feat),
            jnp.float32,
        )
        params["testr"] = spotter.init(jax.random.PRNGKey(2), feats0)
        sampler = OCRGuidedSampler(pipe, spotter, encoder)
        sr, ocr_log = sampler(
            params, jax.random.PRNGKey(42), lq_up, [prompt], return_ocr_log=True
        )
        ocr_words = [r.texts[0] for r in ocr_log]
        last = ocr_log[-1]
        overlay = draw_ocr_overlay(
            np.asarray(sr[0]), last.polygons[0], last.texts[0] + [""] * 100,
            scores=last.scores[0], keep=last.keep[0],
        )
        cv2.imwrite(
            os.path.join(args.out_dir, "ocr_overlay.png"),
            cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR),
        )
        with open(os.path.join(args.out_dir, "ocr_per_step.json"), "w") as f:
            json.dump({"gt_words": ["STOP"], "steps": ocr_words}, f, indent=1)

    sr_np = np.asarray(sr[0])
    mosaic = side_by_side(
        [np.asarray(lq_up[0]), sr_np], ["LQ (bicubic x4)", f"SR ({args.steps} steps)"]
    )
    cv2.imwrite(
        os.path.join(args.out_dir, "sr.png"),
        cv2.cvtColor((sr_np * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
    )
    cv2.imwrite(
        os.path.join(args.out_dir, "side_by_side.png"),
        cv2.cvtColor(mosaic, cv2.COLOR_RGB2BGR),
    )
    print(f"artifacts in {args.out_dir}: sr.png side_by_side.png"
          + ("" if args.no_ocr else " ocr_overlay.png ocr_per_step.json"))


if __name__ == "__main__":
    main()
