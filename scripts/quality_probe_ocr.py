"""Stage-2/3 quality probe: prove the TEXT-AWARE mechanism learns.

The round-2 review's top gap: "the text-aware half of DiT4SR — TESTR
supervision and OCR-guided sampling — has never been demonstrated with
learned weights." This probe extends scripts/quality_probe.py (stage-1-only)
through the reference's full three-stage recipe on the zero-asset synthetic
text domain (data/textscenes.py, which places words itself so exact bbox /
control-point / transcription supervision is free):

  1. train a small /4 AutoencoderKL on the scenes (reused verbatim from the
     stage-1 probe; deterministic);
  2. stage-1-train a small MMDiT on strong Real-ESRGAN degradations with a
     WORD-COMPOSITIONAL text encoder (text/encoders.WordHashTextEncoder) —
     whole-prompt hashing cannot generalize to held-out word combinations,
     word hashing can, so prompt conditioning becomes a learnable, testable
     channel;
  3. stage-2-train a TESTR spotter on features extracted from the frozen
     MMDiT (reference train/train_dit4sr.py:341-381, stage semantics of
     run_configs/train/JIHYE_train_stage2.yaml);
  4. stage-3 joint finetune (diffusion + OCR loss mix);
  5. evaluate THREE samplers on held-out scenes:
       A  plain SRPipeline, null prompt       (no text knowledge at test time)
       B  pipelines/ocr_guided.OCRGuidedSampler, null initial prompt, the
          learned spotter reads the denoising features each step and the
          words (snapped to the probe vocabulary — the zero-asset analogue
          of the reference's VLM correction, pipeline_dit4sr.py:1288-1379)
          are rewritten into the prompt
       C  plain SRPipeline, oracle GT prompt  (upper bound for the channel)

PASS requires BOTH:
  * text-crop PSNR of B > A  (the TSM loop recovered text identity that the
    image alone did not provide; crops use eval/harness.crop_and_resize on
    the generator's exact boxes — the reference's primary protocol,
    test/test.py:416-499), and
  * spotter word F1 (dictionary-snapped, final logged step) >= 0.5 on the
    held-out scenes.

Artifacts: metrics.json + per-variant panels under --out_dir.

Usage:
  python scripts/quality_probe_ocr.py [--resume]        # real TPU, ~2 h
  JAX_PLATFORMS=cpu python scripts/quality_probe_ocr.py --smoke   # CI wiring
  python scripts/quality_probe_ocr.py --eval_only       # re-score a finished run
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# the probe pays 6+ large jit compiles (VAE/stage1/stage2/stage3 train steps,
# eval pipelines); the axon compile service intermittently degrades to
# ~10 min/compile, so persist executables — a killed/resumed probe (or the
# serving sweep reloading the same geometry) skips straight to steps
from dit4sr_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np


def scene_batches(records, batch_size, seed, testr_cfg=None,
                  null_text_ratio=0.1, caption_style="tag"):
    """Endless batches shaped like SATextDataset.collate; with `testr_cfg`
    the batch carries padded OCRTargets built from the generator's exact
    word boxes. Prompt dropout (null_text_ratio) happens here — the probe
    generator bypasses SATextDataset, which normally owns it."""
    from dit4sr_tpu.data.satext import synthesize_prompt
    from dit4sr_tpu.data.textscenes import instances_to_ocr_raw
    from dit4sr_tpu.models.testr.detector import pad_targets

    delta = np.zeros((21, 21), np.float32)
    delta[10, 10] = 1.0
    rng = np.random.default_rng(seed)
    size = records[0]["image"].shape[0]
    while True:
        idx = rng.integers(0, len(records), batch_size)
        batch = {
            "gt": np.stack([records[i]["image"] for i in idx]),
            "kernel1": np.stack([delta] * batch_size),
            "kernel2": np.stack([delta] * batch_size),
            "sinc_kernel": np.stack([delta] * batch_size),
            "prompt": [
                "" if rng.uniform() < null_text_ratio
                else synthesize_prompt(records[i]["text"], caption_style)
                for i in idx
            ],
        }
        if testr_cfg is not None:
            raw = [
                instances_to_ocr_raw(
                    records[i]["instances"], size,
                    testr_cfg.num_ctrl_points, testr_cfg.max_text_len,
                )
                for i in idx
            ]
            batch["ocr_targets"] = pad_targets(raw, testr_cfg)
        yield batch


def word_prf(pred_words, gt_words):
    """Set precision/recall/F1 over unique words (case-sensitive)."""
    p_set, g_set = set(pred_words), set(gt_words)
    if not p_set and not g_set:
        return 1.0, 1.0, 1.0
    tp = len(p_set & g_set)
    prec = tp / len(p_set) if p_set else 0.0
    rec = tp / len(g_set) if g_set else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return prec, rec, f1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="artifacts/quality_probe_ocr")
    ap.add_argument("--vae_steps", type=int, default=3000)
    ap.add_argument("--s1_steps", type=int, default=6000)
    ap.add_argument("--s2_steps", type=int, default=3000)
    ap.add_argument("--s3_steps", type=int, default=1500)
    ap.add_argument("--infer_steps", type=int, default=14)
    ap.add_argument("--guidance", type=float, default=1.0)
    ap.add_argument("--align", default="adain",
                    choices=["nofix", "adain", "wavelet"])
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--n_train", type=int, default=256)
    ap.add_argument("--n_eval", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry, a handful of steps: wiring only")
    ap.add_argument("--eval_only", action="store_true",
                    help="skip all training; reload stage pickles and re-run "
                         "sampling + metrics (sweep --infer_steps/--guidance)")
    ap.add_argument("--resume", action="store_true",
                    help="skip completed stages (pickles in --out_dir) and "
                         "resume the in-flight stage from its checkpoint")
    args = ap.parse_args()

    from dit4sr_tpu.config import (
        SamplerConfig, SchedulerConfig, TrainConfig, OptimConfig,
    )
    from dit4sr_tpu.data.degradation import realesrgan_degradation
    from dit4sr_tpu.data.satext import synthesize_prompt
    from dit4sr_tpu.data.textscenes import WORDS, make_scene_records
    from dit4sr_tpu.eval.harness import crop_and_resize
    from dit4sr_tpu.eval.metrics import psnr, ssim
    from dit4sr_tpu.eval.probe_setup import (
        ocr_probe_degradation, ocr_probe_encoder, ocr_probe_geometry,
    )
    from dit4sr_tpu.models.testr.detector import TextSpotter
    from dit4sr_tpu.models.vae import AutoencoderKL
    from dit4sr_tpu.pipelines.ocr_guided import OCRGuidedSampler
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline
    from dit4sr_tpu.text.dictionary import snap_words
    from dit4sr_tpu.train.trainer import Trainer
    from dit4sr_tpu.train.vae_train import measure_latent_stats, train_vae

    os.makedirs(args.out_dir, exist_ok=True)

    if args.smoke:
        args.image_size, args.n_train, args.n_eval = 64, 8, 2
        args.vae_steps = args.s1_steps = args.s2_steps = args.s3_steps = 2
        args.infer_steps, args.batch_size = 2, 2

    size = args.image_size

    # geometry/encoder/degradation shared with scripts/serving_quality_sweep.py
    # (eval/probe_setup.py is the single source of truth so the sweep reloads
    # these pickles into bit-identical configs)
    geom = ocr_probe_geometry(size, args.smoke)
    vae_cfg, model_cfg, testr_cfg, latent_size, text_len = geom
    encoder = ocr_probe_encoder(geom)
    deg_sampler = ocr_probe_degradation()

    rng = jax.random.PRNGKey(0)
    print(f"[ocr-probe] generating {args.n_train}+{args.n_eval} scenes @ {size}px")
    train_recs = make_scene_records(
        args.n_train, size=size, seed=1, min_scale=2.0, max_scale=4.5
    )
    eval_recs = make_scene_records(
        args.n_eval, size=size, seed=2, min_scale=2.0, max_scale=4.5
    )
    bank = np.stack([r["image"] for r in train_recs])

    # --- 1. VAE (identical recipe to the stage-1 probe) ----------------------
    vae_pkl = os.path.join(args.out_dir, "vae.pkl")
    if (args.eval_only or args.resume) and os.path.exists(vae_pkl):
        with open(vae_pkl, "rb") as f:
            saved = pickle.load(f)
        vae_params, sf, shf = saved["params"], saved["scaling"], saved["shift"]
        print(f"[ocr-probe] reloaded VAE from {vae_pkl}")
    else:
        print(f"[ocr-probe] training VAE for {args.vae_steps} steps")
        from dit4sr_tpu.train.trainer import MetricLogger

        vae_params = train_vae(
            jax.random.fold_in(rng, 1), vae_cfg, bank, args.vae_steps,
            batch_size=args.batch_size, logger=MetricLogger(args.out_dir),
        )
        sf, shf = measure_latent_stats(
            vae_cfg, vae_params, bank[: min(16, len(bank))], rng
        )
        with open(vae_pkl, "wb") as f:
            pickle.dump({"params": jax.device_get(vae_params),
                         "scaling": sf, "shift": shf}, f)
    vae_cfg = vae_cfg.with_(scaling_factor=sf, shift_factor=shf)
    vae = AutoencoderKL(vae_cfg)
    print(f"[ocr-probe] latent calibration: scaling={sf:.3f} shift={shf:.3f}")

    # --- stage runner ---------------------------------------------------------
    def run_stage(tag, stage, steps, optim, mmdit_params, testr_params,
                  with_testr, finetune=(), ocr_w=0.01):
        """One Trainer stage under out_dir/<tag>; returns final params dict.
        Persists a pickle so --resume/--eval_only can skip it."""
        pkl = os.path.join(args.out_dir, f"{tag}.pkl")
        if (args.eval_only or args.resume) and os.path.exists(pkl):
            with open(pkl, "rb") as f:
                params = pickle.load(f)
            print(f"[ocr-probe] reloaded {tag} from {pkl}")
            return params
        if args.eval_only:
            raise SystemExit(f"[ocr-probe] --eval_only but {pkl} is missing — "
                             f"run the full probe first")
        train_cfg = TrainConfig(
            stage=stage,
            batch_size=args.batch_size,
            gradient_accumulation_steps=1,
            finetune_layer_names=finetune,
            num_train_steps=steps,
            checkpointing_steps=max(steps // 3, 1),
            ocr_loss_weight=ocr_w,
            optim=optim,
        )
        trainer = Trainer(
            model_cfg, vae_cfg, train_cfg,
            testr_cfg if with_testr else None,
            SchedulerConfig(), out_dir=os.path.join(args.out_dir, tag),
        )
        stage_seed = {"stage1": 11, "stage2": 22, "stage3": 33}[tag]
        state = trainer.init_state(
            jax.random.fold_in(rng, stage_seed),
            mmdit_params=mmdit_params, testr_params=testr_params,
            latent_size=latent_size, text_len=text_len,
        )
        print(f"[ocr-probe] {tag}: training {steps} steps ({stage})")
        state = trainer.fit(
            state,
            scene_batches(train_recs, args.batch_size, seed=3,
                          testr_cfg=testr_cfg if with_testr else None),
            vae_params,
            encoder,
            jax.random.fold_in(rng, 4),
            resume=args.resume,
            deg_sampler=deg_sampler,
        )
        if trainer.preempted:
            # the returned state is mid-training (durably checkpointed) —
            # pickling it would hand the NEXT stage a half-trained model
            raise SystemExit(
                f"[ocr-probe] {tag} preempted at step {int(state.step)} — "
                f"rerun with --resume to continue"
            )
        params = jax.device_get(state.params)
        with open(pkl, "wb") as f:
            pickle.dump(params, f)
        return params

    # --- 2. stage 1: diffusion only ------------------------------------------
    p1 = run_stage("stage1", "stage1", args.s1_steps, OptimConfig(),
                   None, None, with_testr=False)

    # --- 3. stage 2: spotter on frozen-MMDiT features -------------------------
    # finetune=("testr",) matches nothing inside the mmdit subtree -> MMDiT
    # frozen (weight decay included); the testr subtree trains fully via
    # testr_finetune_layer_names=() (train_state.trainable_mask).
    p2 = run_stage("stage2", "stage2", args.s2_steps,
                   OptimConfig(testr_lr=1e-4),
                   p1["mmdit"], None, with_testr=True,
                   finetune=("testr",), ocr_w=1.0)

    # --- 4. stage 3: joint ----------------------------------------------------
    p3 = run_stage("stage3", "stage3", args.s3_steps,
                   OptimConfig(lr=1e-5, testr_lr=5e-5),
                   p2["mmdit"], p2["testr"], with_testr=True)

    # --- 5. eval: A (null) vs B (OCR-guided) vs C (oracle) --------------------
    print("[ocr-probe] sampling held-out scenes (A null / B TSM / C oracle)")
    sampler_cfg = SamplerConfig(
        num_inference_steps=args.infer_steps,
        guidance_scale=args.guidance,
        start_point="lr",
        align_method=args.align,
        process_size=size,
    )
    from dit4sr_tpu.models.mmdit import MMDiT

    pipe = SRPipeline(
        MMDiT(model_cfg), vae, model_cfg, vae_cfg, SchedulerConfig(),
        sampler_cfg,
    )
    spotter = TextSpotter(testr_cfg)
    params = {"mmdit": p3["mmdit"], "vae": vae_params, "testr": p3["testr"]}

    eval_gt = np.stack([r["image"] for r in eval_recs])
    deg = jax.jit(
        lambda k, g: realesrgan_degradation(
            k, g, deg_sampler(None, g.shape[0]), use_usm=False
        )[1]
    )
    lq = np.clip(np.asarray(deg(jax.random.fold_in(rng, 5), jnp.asarray(eval_gt))),
                 0.0, 1.0)
    lq_j = jnp.asarray(lq)
    rng_s = jax.random.fold_in(rng, 6)

    run_plain = pipe.jit()
    null_prompts = [""] * len(eval_recs)
    oracle_prompts = [synthesize_prompt(r["text"], "tag") for r in eval_recs]

    def plain(prompts):
        te, pe = encoder(prompts)
        kw = {}
        if args.guidance > 1.0:
            nte, npe = encoder([""] * len(prompts))
            kw = {"neg_text_embeds": nte, "neg_pooled_embeds": npe}
        out = run_plain(params, rng_s, lq_j, te, pe, **kw)
        return np.clip(np.asarray(out), 0.0, 1.0)

    sr_a = plain(null_prompts)
    sr_c = plain(oracle_prompts)

    guided = OCRGuidedSampler(
        pipe, spotter, encoder, caption_style="tag",
        correct_fn=lambda words, i: snap_words(words, WORDS),
        correct_steps=tuple(range(args.infer_steps)),
    )
    sr_b, ocr_log = guided(
        params, rng_s, lq_j, null_prompts, return_ocr_log=True,
    )
    sr_b = np.clip(np.asarray(sr_b), 0.0, 1.0)

    # word accuracy from the final logged step (raw + snapped)
    final = ocr_log[-1] if ocr_log else None
    word_rows = []
    for i, r in enumerate(eval_recs):
        raw_words = final.texts[i] if final is not None else []
        snapped = snap_words(raw_words, WORDS)
        p_r, r_r, f_r = word_prf(raw_words, r["text"])
        p_s, r_s, f_s = word_prf(snapped, r["text"])
        word_rows.append({
            "img_id": r["img_id"], "gt_words": sorted(set(r["text"])),
            "raw_words": raw_words, "snapped_words": snapped,
            "raw_f1": f_r, "snapped_precision": p_s,
            "snapped_recall": r_s, "snapped_f1": f_s,
        })

    # full-image + text-crop metrics per variant
    gt_j = jnp.asarray(eval_gt)

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
                ps.append(float(psnr(jnp.asarray(cp[None]), jnp.asarray(cg[None]))[0]))
                ss.append(float(ssim(jnp.asarray(cp[None]), jnp.asarray(cg[None]))[0]))
        return float(np.mean(ps)), float(np.mean(ss)), len(ps)

    agg = {}
    for name, sr in (("A_null", sr_a), ("B_tsm", sr_b), ("C_oracle", sr_c)):
        sr_j = jnp.asarray(sr)
        cp, cs, nc = crop_metrics(sr)
        agg[name] = {
            "psnr": float(jnp.mean(psnr(sr_j, gt_j))),
            "ssim": float(jnp.mean(ssim(sr_j, gt_j))),
            "crop_psnr": cp, "crop_ssim": cs, "num_crops": nc,
        }
    lqp, lqs, _ = crop_metrics(lq)
    agg["LQ"] = {
        "psnr": float(jnp.mean(psnr(lq_j, gt_j))),
        "ssim": float(jnp.mean(ssim(lq_j, gt_j))),
        "crop_psnr": lqp, "crop_ssim": lqs,
    }
    agg["word_f1_snapped"] = float(np.mean([w["snapped_f1"] for w in word_rows]))
    agg["word_f1_raw"] = float(np.mean([w["raw_f1"] for w in word_rows]))
    if args.smoke:
        agg["pass"] = None
    else:
        agg["pass"] = bool(
            agg["B_tsm"]["crop_psnr"] > agg["A_null"]["crop_psnr"]
            and agg["word_f1_snapped"] >= 0.5
        )

    result = {
        "aggregate": agg,
        "words": word_rows,
        "config": {
            "image_size": size, "vae_steps": args.vae_steps,
            "s1_steps": args.s1_steps, "s2_steps": args.s2_steps,
            "s3_steps": args.s3_steps, "infer_steps": args.infer_steps,
            "guidance": args.guidance, "smoke": args.smoke,
        },
    }
    with open(os.path.join(args.out_dir, "metrics.json"), "w") as f:
        json.dump(result, f, indent=1)

    try:
        from dit4sr_tpu.eval.visualize import side_by_side
        import cv2

        for i in range(min(4, len(eval_gt))):
            panel = side_by_side(
                [eval_gt[i], lq[i], sr_a[i], sr_b[i], sr_c[i]],
                labels=["GT", "degraded", "A null", "B TSM", "C oracle"],
            )
            cv2.imwrite(
                os.path.join(args.out_dir, f"panel_{i}.png"), panel[..., ::-1]
            )
    except Exception as e:
        print(f"[ocr-probe] panel rendering skipped: {e}")

    print(json.dumps(agg, indent=1))
    verdict = ("PASS" if agg["pass"] else "FAIL") if not args.smoke else "SMOKE-OK"
    print(
        f"[ocr-probe] {verdict}: crop-PSNR TSM {agg['B_tsm']['crop_psnr']:.2f} "
        f"vs null {agg['A_null']['crop_psnr']:.2f} vs oracle "
        f"{agg['C_oracle']['crop_psnr']:.2f} dB; word F1 "
        f"{agg['word_f1_snapped']:.2f} (raw {agg['word_f1_raw']:.2f})"
    )


if __name__ == "__main__":
    main()
