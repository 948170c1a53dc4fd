"""HTTP serving entry point: LQ image in, x4 SR image out.

The reference has no serving layer (SURVEY.md §1); this is the deployment
story for the TPU rebuild. One process = one chip = one compiled pipeline.

    python scripts/serve.py --port 8000 --size 128 --steps 28 \
        --sd3_ckpt /path/to/sd3.5-medium

    curl -X POST --data-binary @lq.png \
        'http://localhost:8000/v1/sr?prompt=a+street+sign' > sr.png

Without --sd3_ckpt it serves random weights behind a loud banner (useful
only for load/integration testing; pair with --smoke for a tiny model).
"""

from __future__ import annotations

import argparse
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


def build_server(args):
    from dit4sr_tpu.bootstrap import (
        banner, build_mmdit, build_prompt_encoder, build_vae,
    )
    from dit4sr_tpu.config import (
        SamplerConfig, SchedulerConfig, VAEConfig, mmdit_base, mmdit_ocr2hq,
        mmdit_ocr2hq2ocr, mmdit_tiny, vae_tiny,
    )
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline
    from dit4sr_tpu.serving import SRServer

    presets = {
        "base": mmdit_base, "ocr2hq": mmdit_ocr2hq,
        "ocr2hq2ocr": mmdit_ocr2hq2ocr,
    }
    if args.smoke:
        vcfg = vae_tiny()
        preset = presets[args.variant]()
        mcfg = mmdit_tiny(
            in_channels=vcfg.latent_channels,
            out_channels=vcfg.latent_channels,
            streams=preset.streams,
            ffn_couplings=preset.ffn_couplings,
            feat_extract_layers=(0, 1) if args.tsm else (),
        )
        args.size = min(args.size, 16)
        text_len = 16
    else:
        mcfg = presets[args.variant]().with_(
            param_dtype=jnp.bfloat16, folded_control=True,
            feat_extract_layers=tuple(range(24)) if args.tsm else (),
        )
        vcfg = VAEConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        text_len = 333

    mmdit, mparams, m_ok = build_mmdit(
        mcfg, jax.random.PRNGKey(0), args.sd3_ckpt, text_len=text_len
    )
    if args.distilled_ckpt:
        # few-step student from scripts/distill.py (orbax phase_<N> dir);
        # pair with --steps N matching the phase
        import numpy as np
        import orbax.checkpoint as ocp

        template = jax.tree.map(
            lambda x: np.empty(x.shape, x.dtype), jax.device_get(mparams)
        )
        mparams = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.distilled_ckpt), template
        )
        m_ok = True
    if args.lora_ckpt:
        # merge BEFORE folding/quantization: zero runtime cost (the TPU
        # answer to the reference's PEFT layer patching, models/lora.py)
        from dit4sr_tpu.models.lora import load_sd3_lora, merge_lora

        mparams = merge_lora(
            mparams, load_sd3_lora(args.lora_ckpt), scale=args.lora_scale
        )
    if m_ok and not args.smoke:
        from dit4sr_tpu.models.mmdit import fold_control_projections

        mparams = fold_control_projections(mparams, mcfg.with_(folded_control=False))
    if args.w8a8:
        # int8 serving path: quantize AFTER folding so the folded fp32
        # products are what gets quantized (ops/quant.py docstring)
        from dit4sr_tpu.models.mmdit import MMDiT
        from dit4sr_tpu.ops.quant import quantize_mmdit_params

        mparams = quantize_mmdit_params(mparams, mcfg)
        mcfg = mcfg.with_(w8a8=True)
        mmdit = MMDiT(mcfg)

    vae, vparams, v_ok = build_vae(vcfg, jax.random.PRNGKey(1), args.sd3_ckpt)
    encoder, e_ok = build_prompt_encoder(
        args.sd3_ckpt, t5_length=text_len - 77 if text_len > 77 else text_len,
        dtype=mcfg.dtype,
    )
    if args.smoke or not (m_ok and v_ok and e_ok):
        from dit4sr_tpu.text.encoders import HashTextEncoder

        dims_ok = (
            isinstance(encoder, HashTextEncoder)
            and encoder.seq_len == text_len
            and encoder.joint_dim == mcfg.joint_attention_dim
            and encoder.pooled_dim == mcfg.pooled_projection_dim
        )
        if not dims_ok:
            encoder = HashTextEncoder(
                seq_len=text_len,
                joint_dim=mcfg.joint_attention_dim,
                pooled_dim=mcfg.pooled_projection_dim,
            )
        if not args.smoke:
            banner("serving RANDOM/HASH weights — load-testing only")

    span = None
    if args.cache_span:
        lo, hi = (int(x) for x in args.cache_span.split(","))
        span = (lo, hi)
    pipe = SRPipeline(
        mmdit, vae, mcfg, vcfg, SchedulerConfig(),
        SamplerConfig(
            num_inference_steps=args.steps, align_method="adain",
            guidance_scale=args.guidance,
            cache_interval=args.cache_interval, cache_span=span,
        ),
    )

    params = {"mmdit": mparams, "vae": vparams}
    tsm_sampler = None
    if args.tsm:
        # reference pred_tsm protocol: TESTR reads DiT features each step
        # and rewrites the prompt (pipeline_dit4sr.py:1214-1446)
        if args.cache_interval > 1:
            raise SystemExit("--tsm does not compose with --cache_interval")
        from dit4sr_tpu.bootstrap import build_testr
        from dit4sr_tpu.config import TESTRConfig, testr_tiny
        from dit4sr_tpu.pipelines.ocr_guided import OCRGuidedSampler
        from dit4sr_tpu.train.ocr_loss import num_streams_extracted

        latent_hw = args.size * 4 // 8
        if args.smoke:
            tcfg = testr_tiny(
                num_dit_layers=len(mcfg.feat_extract_layers),
                num_feature_levels=min(4, len(mcfg.feat_extract_layers)),
                dit_dim=mcfg.inner_dim,
            )
        else:
            tcfg = TESTRConfig()
        c_feat = (
            mcfg.inner_dim // (mcfg.patch_size ** 2)
            * num_streams_extracted(mcfg)
        )
        spotter, tparams, t_ok = build_testr(
            tcfg, jax.random.PRNGKey(2),
            (len(mcfg.feat_extract_layers), 1, latent_hw, latent_hw, c_feat),
            args.testr_ckpt, feat_hw=(latent_hw, latent_hw),
        )
        params["testr"] = tparams
        correct_fn = None
        correct_steps = ()
        if args.vlm_correct:
            from dit4sr_tpu.text.vlm import VLMCorrectionAgent

            correct_fn = VLMCorrectionAgent(model_path=args.vlm_correct)
            correct_steps = tuple(
                range(0, args.steps, max(1, args.vlm_correct_every))
            )
        tsm_sampler = OCRGuidedSampler(
            pipe, spotter, encoder,
            spot_every=args.spot_every,
            threshold=args.spot_threshold,
            correct_fn=correct_fn,
            correct_steps=correct_steps,
            correct_with_image=correct_fn is not None,
        )

    server = SRServer(
        pipe, params, encoder,
        lq_size=args.size, upscale=4, seed=args.seed,
        tsm_sampler=tsm_sampler,
    )
    server.negative_prompt = args.negative_prompt
    return server


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--size", type=int, default=128, help="compiled LQ size")
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sd3_ckpt", default=None,
                    help="SD3.5 root (transformer/ vae/ text_encoder*/")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry (CPU-friendly integration testing)")
    ap.add_argument("--once", action="store_true",
                    help="warm up, print stats, exit (CI smoke)")
    ap.add_argument("--guidance", type=float, default=1.0,
                    help="CFG scale (reference val protocol: 1.0 = off; its "
                         "TSM configs also ship 8.0)")
    ap.add_argument("--negative_prompt", default="")
    ap.add_argument("--tsm", action="store_true",
                    help="per-step TESTR OCR -> prompt rewriting (the "
                         "reference's pred_tsm protocol); pair with "
                         "--testr_ckpt for real spotting")
    ap.add_argument("--testr_ckpt", default=None,
                    help="TESTR .pt/.safetensors for --tsm")
    ap.add_argument("--spot_every", type=int, default=1,
                    help="--tsm spotting cadence: 1 = every step (reference "
                         "default); K spots every Kth step with a cheaper "
                         "no-extraction step between")
    ap.add_argument("--spot_threshold", type=float, default=None,
                    help="override TESTR inference_th_test for --tsm "
                         "(calibrated value from a probe run)")
    ap.add_argument("--vlm_correct", default=None,
                    help="HF vision2seq checkpoint dir: correct OCR words "
                         "with the decoded preview at --vlm_correct_every "
                         "cadence (reference Qwen-VL hook)")
    ap.add_argument("--vlm_correct_every", type=int, default=7,
                    help="correction-step cadence for --vlm_correct")
    ap.add_argument("--variant", default="base",
                    choices=("base", "ocr2hq", "ocr2hq2ocr"),
                    help="MMDiT variant (the reference's dit4sr / "
                         "dit4sr_ocrbranch_ocr2hq / ..._ocr2hq2ocr)")
    ap.add_argument("--distilled_ckpt", default=None,
                    help="orbax phase_<N> dir from scripts/distill.py — "
                         "serve the few-step student (set --steps N)")
    ap.add_argument("--compile_cache", default="on", choices=("on", "off"),
                    help="persist compiled executables to disk "
                         "(~/.cache/dit4sr_tpu/xla or $DIT4SR_COMPILE_CACHE) "
                         "so server restarts skip the ~100 s warmup compile")
    ap.add_argument("--lora_ckpt", default=None,
                    help="diffusers/PEFT SD3 LoRA .safetensors to merge into "
                         "the transformer (SD3LoraLoaderMixin equivalent)")
    ap.add_argument("--lora_scale", type=float, default=1.0)
    ap.add_argument("--w8a8", action="store_true",
                    help="quantize attention/FFN matmuls to int8 (w8a8) for "
                         "the int8 MXU path — approximate, ~10%% faster")
    ap.add_argument("--cache_interval", type=int, default=1,
                    help="Delta-DiT block caching: recompute the cached span "
                         "every N steps (1 = off, exact)")
    ap.add_argument("--cache_span", default=None,
                    help='block range to cache, e.g. "12,24" (with '
                         "--cache_interval > 1)")
    args = ap.parse_args()

    from dit4sr_tpu.serving import serve

    if args.compile_cache == "on":
        from dit4sr_tpu.utils.compile_cache import enable_persistent_cache

        print(f"compile cache: {enable_persistent_cache()}")
    server = build_server(args)
    httpd = serve(server, args.host, args.port, warmup=True)
    if args.once:
        import json

        print(json.dumps(server.stats()))
        httpd.server_close()
        return
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.server_close()


if __name__ == "__main__":
    main()
