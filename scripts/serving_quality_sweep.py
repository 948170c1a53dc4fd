"""Quality cost of every approximate serving mode, measured on LEARNED weights.

Round-2 review: "w8a8, Delta-DiT block caching, and the distilled students
are all justified by *latency* on random weights ... their image-quality
cost — the only thing that decides whether 0.956 s/image is shippable — is
unmeasured." This script closes that: it reloads the OCR quality probe's
trained checkpoint (scripts/quality_probe_ocr.py pickles, geometry from
eval/probe_setup.py) and sweeps the full serving stack on the probe's
held-out scenes:

    exact        fp32 pipeline, the probe's own eval configuration
    bf16         folded control projections + bf16 params/compute (the
                 default real-weight serving dtype, scripts/serve.py)
    w8a8         bf16 + int8 attention/FFN matmuls (ops/quant.py)
    cache2/3     Delta-DiT block caching, interval 2/3 over the latter half
                 of the blocks (SamplerConfig.cache_interval/cache_span)
    w8a8+cache   both (the sub-second headline combination)
    steps7/4     naive step-count reduction (no retraining) — the control
                 that shows distillation is doing work
    distill7/4   progressive-distillation students (train/distill.py),
                 teacher = the probe checkpoint at --infer_steps

Per mode: full-image PSNR/SSIM vs GT, text-crop PSNR/SSIM on the
generator's exact word boxes (the reference's primary protocol,
test/test.py:416-499), PSNR vs the exact pipeline's output (fidelity), and
latency (median of varied-input runs — the axon relay caches identical
calls, CLAUDE.md). Artifacts: metrics.json + a markdown table under
--out_dir; tests/test_serving_quality.py gates the committed artifact.

Usage:
  python scripts/serving_quality_sweep.py                     # real TPU
  JAX_PLATFORMS=cpu python scripts/serving_quality_sweep.py \
      --probe_dir <smoke probe out_dir> --smoke               # CI wiring
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np


def cast_floating(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe_dir", default="artifacts/quality_probe_ocr")
    ap.add_argument("--out_dir", default="artifacts/serving_quality")
    ap.add_argument("--infer_steps", type=int, default=14)
    ap.add_argument("--guidance", type=float, default=1.0)
    ap.add_argument("--align", default="adain",
                    choices=["nofix", "adain", "wavelet"])
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--n_eval", type=int, default=16)
    ap.add_argument("--no_distill", action="store_true",
                    help="skip training the distilled students")
    ap.add_argument("--distill_phase_steps", type=int, default=1000)
    ap.add_argument("--distill_lr", type=float, default=2e-5)
    ap.add_argument("--batch_size", type=int, default=8,
                    help="distillation batch size")
    ap.add_argument("--timing_reps", type=int, default=3)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry; expects --probe_dir from a --smoke "
                         "probe run")
    ap.add_argument("--no_compile_cache", action="store_true")
    args = ap.parse_args()

    # after argparse (not at import) so --help/--smoke runs don't write a
    # cache dir (advisor r3); the sweep pays ~11 pipeline compiles otherwise
    if not args.no_compile_cache:
        from dit4sr_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()

    from dit4sr_tpu.config import SamplerConfig, SchedulerConfig
    from dit4sr_tpu.data.degradation import realesrgan_degradation
    from dit4sr_tpu.data.satext import synthesize_prompt
    from dit4sr_tpu.data.textscenes import make_scene_records
    from dit4sr_tpu.eval.harness import crop_and_resize
    from dit4sr_tpu.eval.metrics import psnr, ssim
    from dit4sr_tpu.eval.probe_setup import (
        load_probe_weights, ocr_probe_degradation, ocr_probe_encoder,
        ocr_probe_geometry,
    )
    from dit4sr_tpu.models.mmdit import MMDiT, fold_control_projections
    from dit4sr_tpu.models.vae import AutoencoderKL, sample_latent, scale_latent
    from dit4sr_tpu.ops.quant import quantize_mmdit_params
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline

    if args.smoke:
        args.image_size, args.n_eval, args.infer_steps = 64, 2, 4
        args.distill_phase_steps, args.batch_size = 2, 2
        args.timing_reps = 1

    os.makedirs(args.out_dir, exist_ok=True)
    geom = ocr_probe_geometry(args.image_size, args.smoke)
    vae_cfg, model_cfg, testr_cfg, latent_size, text_len = geom
    vae_params, sf, shf, stage_tag, stage_params = load_probe_weights(
        args.probe_dir
    )
    vae_cfg = vae_cfg.with_(scaling_factor=sf, shift_factor=shf)
    vae = AutoencoderKL(vae_cfg)
    encoder = ocr_probe_encoder(geom)
    mparams_fp32 = stage_params["mmdit"]
    print(f"[sweep] probe weights: {args.probe_dir} ({stage_tag})")

    # --- eval scenes: exactly the probe's held-out set + degradation ---------
    rng = jax.random.PRNGKey(0)
    eval_recs = make_scene_records(
        args.n_eval, size=args.image_size, seed=2, min_scale=2.0, max_scale=4.5
    )
    eval_gt = np.stack([r["image"] for r in eval_recs])
    deg_sampler = ocr_probe_degradation()
    deg = jax.jit(
        lambda k, g: realesrgan_degradation(
            k, g, deg_sampler(None, g.shape[0]), use_usm=False
        )[1]
    )
    lq = np.clip(
        np.asarray(deg(jax.random.fold_in(rng, 5), jnp.asarray(eval_gt))),
        0.0, 1.0,
    )
    lq_j = jnp.asarray(lq)
    gt_j = jnp.asarray(eval_gt)
    prompts = [synthesize_prompt(r["text"], "tag") for r in eval_recs]
    te, pe = encoder(prompts)
    rng_s = jax.random.fold_in(rng, 6)

    def crop_metrics(pred):
        ps, ss = [], []
        for i, r in enumerate(eval_recs):
            for inst in r["instances"]:
                cp = crop_and_resize(pred[i], inst["bbox"])
                cg = crop_and_resize(eval_gt[i], inst["bbox"])
                if cp is None or cg is None or cp.shape != cg.shape:
                    continue
                if min(cp.shape[0], cp.shape[1]) < 12:
                    continue
                ps.append(float(psnr(jnp.asarray(cp[None]),
                                     jnp.asarray(cg[None]))[0]))
                ss.append(float(ssim(jnp.asarray(cp[None]),
                                     jnp.asarray(cg[None]))[0]))
        return float(np.mean(ps)), float(np.mean(ss))

    # --- serving-mode variants ------------------------------------------------
    span = (model_cfg.num_layers // 2, model_cfg.num_layers)
    folded = None  # lazily built: fold once, reuse across bf16/w8a8/cache modes

    def build(mode):
        """-> (mmdit, mcfg, mparams). 'exact'/'stepsN' = the probe's fp32
        eval config; everything else = the serve.py stack (fold -> bf16 ->
        [int8])."""
        nonlocal folded
        if mode in ("exact", "steps"):
            return MMDiT(model_cfg), model_cfg, mparams_fp32
        if folded is None:
            folded = fold_control_projections(mparams_fp32, model_cfg)
        mcfg = model_cfg.with_(
            folded_control=True, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
        )
        mparams = cast_floating(folded, jnp.bfloat16)
        if mode == "w8a8":
            mparams = quantize_mmdit_params(mparams, mcfg)
            mcfg = mcfg.with_(w8a8=True)
        return MMDiT(mcfg), mcfg, mparams

    def run_mode(name, mode, steps, interval=1, mparams_override=None):
        mmdit, mcfg, mparams = build(mode)
        if mparams_override is not None:
            mparams = mparams_override
        scfg = SamplerConfig(
            num_inference_steps=steps,
            guidance_scale=args.guidance,
            start_point="lr",
            align_method=args.align,
            process_size=args.image_size,
            cache_interval=interval,
            cache_span=span if interval > 1 else None,
        )
        pipe = SRPipeline(mmdit, vae, mcfg, vae_cfg, SchedulerConfig(), scfg)
        fn = pipe.jit()
        params = {"mmdit": mparams, "vae": vae_params}
        kw = {}
        if args.guidance > 1.0:
            nte, npe = encoder([""] * len(prompts))
            kw = {"neg_text_embeds": nte, "neg_pooled_embeds": npe}
        out = fn(params, rng_s, lq_j, te, pe, **kw)       # compile + result
        sr = np.clip(np.asarray(out.astype(jnp.float32)), 0.0, 1.0)
        times = []
        for i in range(args.timing_reps):
            # vary the rng key: identical calls can be served from the axon
            # relay cache and report ~0 latency (CLAUDE.md)
            k = jax.random.fold_in(rng_s, 100 + i)
            t0 = time.perf_counter()
            o = fn(params, k, lq_j, te, pe, **kw)
            float(o.astype(jnp.float32).sum())             # hard device sync
            times.append(time.perf_counter() - t0)
        cp, cs = crop_metrics(sr)
        row = {
            "mode": name,
            "steps": steps,
            "psnr": float(jnp.mean(psnr(jnp.asarray(sr), gt_j))),
            "ssim": float(jnp.mean(ssim(jnp.asarray(sr), gt_j))),
            "crop_psnr": cp,
            "crop_ssim": cs,
            "latency_s_per_image": sorted(times)[len(times) // 2] / len(eval_recs),
        }
        print(f"[sweep] {name}: psnr {row['psnr']:.2f} crop {cp:.2f} "
              f"lat {row['latency_s_per_image']*1e3:.0f} ms/img", flush=True)
        return row, sr

    rows = []
    exact_row, exact_sr = run_mode("exact", "exact", args.infer_steps)
    rows.append(exact_row)

    def vs_exact(sr):
        return float(jnp.mean(psnr(jnp.asarray(sr), jnp.asarray(exact_sr))))

    exact_row["psnr_vs_exact"] = None  # identity (inf); None keeps JSON strict
    plan = [
        ("bf16", "bf16", args.infer_steps, 1),
        ("w8a8", "w8a8", args.infer_steps, 1),
        ("cache2", "bf16", args.infer_steps, 2),
        ("cache3", "bf16", args.infer_steps, 3),
        ("w8a8_cache2", "w8a8", args.infer_steps, 2),
        ("w8a8_cache3", "w8a8", args.infer_steps, 3),
        ("steps7", "steps", max(args.infer_steps // 2, 1), 1),
        ("steps4", "steps", max(args.infer_steps // 4, 1), 1),
    ]
    for name, mode, steps, interval in plan:
        row, sr = run_mode(name, mode, steps, interval)
        row["psnr_vs_exact"] = vs_exact(sr)
        rows.append(row)

    # --- distilled students ----------------------------------------------------
    if not args.no_distill:
        from dit4sr_tpu.train.distill import distill_phases
        from dit4sr_tpu.train.train_step import Batch

        print(f"[sweep] distilling {args.infer_steps}->"
              f"{max(args.infer_steps // 2, 1)}->{max(args.infer_steps // 4, 1)} "
              f"({args.distill_phase_steps} steps/phase)")
        train_recs = make_scene_records(
            max(args.n_eval * 8, 16), size=args.image_size, seed=1,
            min_scale=2.0, max_scale=4.5,
        )
        bank = jnp.asarray(np.stack([r["image"] for r in train_recs]))
        all_prompts = [synthesize_prompt(r["text"], "tag") for r in train_recs]

        @jax.jit
        def make_batch(vp, key, gt):
            k_deg, k_hq, k_lq = jax.random.split(key, 3)
            lq_imgs = realesrgan_degradation(
                k_deg, gt, deg_sampler(None, gt.shape[0]), use_usm=False
            )[1]

            def encode(img, k):
                x = img.astype(vae_cfg.dtype) * 2.0 - 1.0
                mean, logvar = vae.apply(vp, x, method=AutoencoderKL.encode)
                return scale_latent(sample_latent(mean, logvar, k), vae_cfg)

            return encode(gt, k_hq), encode(lq_imgs, k_lq)

        def batches_fn():
            np_rng = np.random.default_rng(7)
            data_rng = jax.random.PRNGKey(8)
            k = 0
            while True:
                idx = np_rng.integers(0, bank.shape[0], args.batch_size)
                hq_l, lq_l = make_batch(
                    vae_params, jax.random.fold_in(data_rng, k),
                    bank[jnp.asarray(idx)],
                )
                t, p = encoder([all_prompts[int(i)] for i in idx])
                yield Batch(hq_l, lq_l, t, p)
                k += 1

        schedule = (args.infer_steps, max(args.infer_steps // 2, 1),
                    max(args.infer_steps // 4, 1))

        def _progress(n_steps, k, metrics):
            if k % 100 == 0:
                print(f"[sweep] distill->{n_steps}: step {k} loss "
                      f"{float(metrics['distill_loss']):.4f}", flush=True)

        results = distill_phases(
            MMDiT(model_cfg), mparams_fp32, batches_fn, schedule,
            args.distill_phase_steps, jax.random.fold_in(rng, 9),
            SchedulerConfig(), learning_rate=args.distill_lr,
            on_metrics=_progress,
        )
        for res in results:
            row, sr = run_mode(
                f"distill{res.num_steps}", "exact", res.num_steps,
                mparams_override=res.params,
            )
            row["psnr_vs_exact"] = vs_exact(sr)
            row["distill_final_loss"] = res.final_loss
            rows.append(row)

    # --- emit -------------------------------------------------------------------
    result = {
        "rows": rows,
        "lq": {"psnr": float(jnp.mean(psnr(lq_j, gt_j))),
               "ssim": float(jnp.mean(ssim(lq_j, gt_j)))},
        "config": {
            "probe_dir": args.probe_dir, "stage": stage_tag,
            "image_size": args.image_size, "infer_steps": args.infer_steps,
            "guidance": args.guidance, "n_eval": args.n_eval,
            "cache_span": list(span), "smoke": args.smoke,
            "distilled": not args.no_distill,
            "distill_phase_steps": args.distill_phase_steps,
        },
    }
    with open(os.path.join(args.out_dir, "metrics.json"), "w") as f:
        json.dump(result, f, indent=1)

    hdr = ("| mode | steps | PSNR | crop-PSNR | SSIM | vs-exact PSNR | "
           "ms/img |\n|---|---|---|---|---|---|---|")
    lines = [hdr]
    for r in rows:
        ve = ("—" if r["psnr_vs_exact"] is None
              else f"{r['psnr_vs_exact']:.2f}")
        lines.append(
            f"| {r['mode']} | {r['steps']} | {r['psnr']:.2f} | "
            f"{r['crop_psnr']:.2f} | {r['ssim']:.3f} | {ve} | "
            f"{r['latency_s_per_image']*1e3:.0f} |"
        )
    table = "\n".join(lines)
    with open(os.path.join(args.out_dir, "table.md"), "w") as f:
        f.write(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
