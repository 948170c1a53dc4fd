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
  * word F1 >= 0.5 on the held-out scenes for the TSM loop's FINAL WORD
    BELIEF — the temporally-voted, dictionary-snapped word set that built
    the last prompt (OCRGuidedSampler vote_frac). Rationale
    (artifacts/spotter_diagnosis.json, r5): per-step reads are noisy and
    systematically worst at low sigma, so the r3/r4 "final logged step"
    metric scored the spotter at its weakest operating point rather than
    scoring what the TSM system actually believes/feeds the model. The
    single-final-step F1 is still reported as word_f1_snapped_last_step.

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


# threshold grid shared by the in-training telemetry and the post-stage-3
# calibration; includes the reference's fixed 0.45 so both numbers appear
THRESHOLDS = (0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45)


def f1_sweep(scores, recs, gt_words_list, vocab):
    """scores (B,K) + recs (B,K,Nw) char ids -> snapped word F1 at every
    threshold in THRESHOLDS. The round-3 probe failed with F1 0.0 because
    ZERO queries cleared the fixed 0.45 threshold (TESTRConfig
    .inference_th_test, tuned for a converged full-size model) — the eval
    could not distinguish 'scores at 0.44' from 'scores at 0.01'. Sweeping
    makes the artifact diagnosable and feeds threshold calibration."""
    from dit4sr_tpu.data import charset
    from dit4sr_tpu.text.dictionary import snap_words

    rows = []
    for th in THRESHOLDS:
        f1s = []
        for b, gt in enumerate(gt_words_list):
            kept = [
                charset.decode(recs[b, k])
                for k in np.nonzero(scores[b] >= th)[0]
            ]
            snapped = snap_words([w for w in kept if w], vocab)
            f1s.append(word_prf(snapped, gt)[2])
        rows.append({"th": th, "f1": float(np.mean(f1s))})
    return rows


def make_spot_probe(mmdit, spotter, model_cfg, sigma=0.5):
    """Jitted single-forward spotting probe at a fixed mid-schedule noise
    level: z_t = (1-s)*lq_latent + s*noise, null prompt — the inference-time
    feature condition, without paying a full sampler pass. Used for
    in-training telemetry (VERDICT r3: the failing run was undiagnosable
    mid-flight)."""
    from dit4sr_tpu.models.testr.model import fuse_dit_features
    from dit4sr_tpu.train.ocr_loss import num_streams_extracted

    n_ext = num_streams_extracted(model_cfg)

    @jax.jit
    def probe_fn(mmdit_params, testr_params, lq_lat, noise, text_e, pooled_e):
        s = jnp.float32(sigma)
        zt = (1.0 - s) * lq_lat + s * noise
        t = jnp.broadcast_to(s * 1000.0, (zt.shape[0],))
        _, feats = mmdit.apply(
            mmdit_params,
            zt.astype(model_cfg.dtype),
            lq_lat.astype(model_cfg.dtype),
            text_e.astype(model_cfg.dtype),
            pooled_e.astype(model_cfg.dtype),
            t,
            extract_features=True,
        )
        maps = fuse_dit_features(
            feats.astype(jnp.float32), model_cfg.patch_size, n_ext
        )
        return spotter.predict(testr_params, maps)

    return probe_fn


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
    # 768 scenes (round 3 used 256): the from-scratch recognizer sees only
    # n_train*3 word instances; 256 scenes = 768 instances was memorizable
    # without generalizing (held-out readings were generic garbage)
    ap.add_argument("--n_train", type=int, default=768)
    ap.add_argument("--n_eval", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--spot_every", type=int, default=250,
                    help="in-training spotter telemetry cadence (steps)")
    ap.add_argument("--calib_scenes", type=int, default=16,
                    help="TRAIN scenes used to calibrate the inference "
                         "threshold after stage 3 (never the eval scenes)")
    ap.add_argument("--spotter_preset", default="v1", choices=["v1", "v2"],
                    help="TESTR geometry preset (eval/probe_setup.py); v2 = "
                         "the r5 capacity fix (d=192, 4+4 layers). VAE/MMDiT "
                         "geometry is shared, so --resume can reuse v1's "
                         "vae.pkl/stage1.pkl copied into --out_dir")
    ap.add_argument("--vote_frac", type=float, default=0.25,
                    help="TSM temporal-voting admission fraction "
                         "(tools/tune_tsm_vote.py calibrates this offline)")
    ap.add_argument("--vote_topk", type=int, default=0,
                    help="cap the TSM belief at the top-K voted words "
                         "(0 = uncapped)")
    ap.add_argument("--no_compile_cache", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry, a handful of steps: wiring only")
    ap.add_argument("--eval_only", action="store_true",
                    help="skip all training; reload stage pickles and re-run "
                         "sampling + metrics (sweep --infer_steps/--guidance)")
    ap.add_argument("--resume", action="store_true",
                    help="skip completed stages (pickles in --out_dir) and "
                         "resume the in-flight stage from its checkpoint")
    args = ap.parse_args()

    # the probe pays 6+ large jit compiles (VAE/stage1/stage2/stage3 train
    # steps, eval pipelines); the axon compile service intermittently degrades
    # to ~10 min/compile, so persist executables — a killed/resumed probe (or
    # the serving sweep reloading the same geometry) skips straight to steps.
    # After argparse (not at import) so --help/--smoke CI runs don't write a
    # cache dir, and opt-out for parity with serve.py (advisor r3).
    if not args.no_compile_cache:
        from dit4sr_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()

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
        args.spot_every, args.calib_scenes = 1, 2  # exercise telemetry in CI

    size = args.image_size

    # geometry/encoder/degradation shared with scripts/serving_quality_sweep.py
    # (eval/probe_setup.py is the single source of truth so the sweep reloads
    # these pickles into bit-identical configs)
    geom = ocr_probe_geometry(size, args.smoke,
                              spotter_preset=args.spotter_preset)
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

    # shared LQ synthesis (telemetry + calibration + eval)
    deg_probe = jax.jit(
        lambda k, g: realesrgan_degradation(
            k, g, deg_sampler(None, g.shape[0]), use_usm=False
        )[1]
    )

    # --- in-training spotter telemetry ---------------------------------------
    # 8 held-out scenes, single forward at mid-schedule noise: score stats +
    # snapped-F1 threshold sweep into <stage>/spot_telemetry.jsonl. The
    # round-3 run trained blind — its failure (no query over the fixed 0.45
    # threshold) was only visible after the full eval.
    from dit4sr_tpu.models.mmdit import MMDiT
    from dit4sr_tpu.pipelines.sr_pipeline import SRPipeline

    mmdit = MMDiT(model_cfg)
    spotter = TextSpotter(testr_cfg)
    spot_probe_fn = make_spot_probe(mmdit, spotter, model_cfg)
    spot_recs = eval_recs[: min(8, len(eval_recs))]
    spot_gt_words = [sorted(set(r["text"])) for r in spot_recs]
    _spot_cache = {}

    def spot_telemetry(state, step, tag):
        if (step + 1) % args.spot_every:
            return
        if "inputs" not in _spot_cache:
            gt = jnp.asarray(np.stack([r["image"] for r in spot_recs]))
            lq_img = jnp.clip(
                deg_probe(jax.random.fold_in(rng, 55), gt), 0.0, 1.0
            )
            pipe_t = SRPipeline(
                mmdit, vae, model_cfg, vae_cfg, SchedulerConfig(),
                SamplerConfig(process_size=size),
            )
            lq_lat = pipe_t.encode_image(
                vae_params, lq_img, jax.random.fold_in(rng, 56)
            )
            noise = jax.random.normal(
                jax.random.fold_in(rng, 57), lq_lat.shape, jnp.float32
            )
            te, pe = encoder([""] * len(spot_recs))
            _spot_cache["inputs"] = (lq_lat, noise, te, pe)
        lq_lat, noise, te, pe = _spot_cache["inputs"]
        preds = spot_probe_fn(
            state.params["mmdit"], state.params["testr"], lq_lat, noise, te, pe
        )
        scores = np.asarray(preds.scores)
        recs = np.asarray(preds.recs)
        sweep = f1_sweep(scores, recs, spot_gt_words, WORDS)
        best = max(sweep, key=lambda r: r["f1"])
        row = {
            "step": step,
            "score_max": float(scores.max()),
            "score_mean": float(scores.mean()),
            "score_p90": float(np.percentile(scores, 90)),
            "best_f1": best["f1"],
            "best_th": best["th"],
            "f1_at_045": sweep[-1]["f1"],
        }
        with open(os.path.join(args.out_dir, tag, "spot_telemetry.jsonl"),
                  "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[ocr-probe] {tag} step {step}: spot score_max="
              f"{row['score_max']:.3f} best_f1={row['best_f1']:.2f}"
              f"@th{row['best_th']}")

    # --- stage runner ---------------------------------------------------------
    def run_stage(tag, stage, steps, optim, mmdit_params, testr_params,
                  with_testr, finetune=(), ocr_w=0.01, train_kw=None):
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
            **(train_kw or {}),
        )
        trainer = Trainer(
            model_cfg, vae_cfg, train_cfg,
            # probe spotter trains from scratch on a short schedule: pads
            # dominate 8/12 recognition positions, so reference-parity
            # uniform text CE lets the head sit at "pad everywhere" while
            # characters stay at chance (r3 failure + r4 first half).
            # 0.25 rebalances gradient toward real characters.
            testr_cfg.with_(text_pad_weight=0.25) if with_testr else None,
            SchedulerConfig(), out_dir=os.path.join(args.out_dir, tag),
            fresh_logs=not args.resume,
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
            step_callback=(
                (lambda st, i: spot_telemetry(st, i, tag))
                if with_testr else None
            ),
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
    # 2e-4 + warmup/cosine (round 3 ran constant 1e-4): the from-scratch
    # d=128 spotter has a short schedule to converge in, and round 3's run
    # was still improving on every loss when it hit its step budget.
    p2 = run_stage("stage2", "stage2", args.s2_steps,
                   OptimConfig(testr_lr=2e-4, lr_scheduler="cosine",
                               lr_warmup_steps=min(300, args.s2_steps // 4)),
                   p1["mmdit"], None, with_testr=True,
                   finetune=("testr",), ocr_w=1.0,
                   # low-sigma curriculum: stage-2's total loss is OCR-only,
                   # but features are extracted at the diffusion sigma — at
                   # the reference's logit_mean=0.0 half the batch carries
                   # noise-dominated hq features and recognition learns at
                   # half speed (r3/r4 telemetry). sigmoid(-1) ~ 0.27 median
                   # sigma concentrates supervision where the TSM sampler
                   # actually reads words (mid-to-late denoising steps).
                   train_kw=dict(logit_mean=-1.0))

    # --- 4. stage 3: joint ----------------------------------------------------
    p3 = run_stage("stage3", "stage3", args.s3_steps,
                   OptimConfig(lr=1e-5, testr_lr=5e-5),
                   p2["mmdit"], p2["testr"], with_testr=True)

    # --- 5. eval: A (null) vs B (OCR-guided) vs C (oracle) --------------------
    import time as _time

    print("[ocr-probe] sampling held-out scenes (A null / B TSM / C oracle)")
    sampler_cfg = SamplerConfig(
        num_inference_steps=args.infer_steps,
        guidance_scale=args.guidance,
        start_point="lr",
        align_method=args.align,
        process_size=size,
    )
    pipe = SRPipeline(
        mmdit, vae, model_cfg, vae_cfg, SchedulerConfig(), sampler_cfg,
    )
    params = {"mmdit": p3["mmdit"], "vae": vae_params, "testr": p3["testr"]}

    eval_gt = np.stack([r["image"] for r in eval_recs])
    lq = np.clip(
        np.asarray(deg_probe(jax.random.fold_in(rng, 5), jnp.asarray(eval_gt))),
        0.0, 1.0,
    )
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

    # --- 5a. threshold calibration on TRAIN scenes ----------------------------
    # The reference's fixed 0.45 (transformer_detector.py:124-153) is tuned
    # for a converged full-size model; a probe-scale spotter's calibrated
    # operating point must be measured. One no-feedback guided pass over
    # held-IN scenes -> final-step scores/recs -> best-F1 threshold.
    calib_recs = train_recs[: args.calib_scenes]
    calib_gt_img = np.stack([r["image"] for r in calib_recs])
    calib_lq = jnp.clip(
        deg_probe(jax.random.fold_in(rng, 7), jnp.asarray(calib_gt_img)),
        0.0, 1.0,
    )
    calib_sampler = OCRGuidedSampler(
        pipe, spotter, encoder, caption_style="tag",
        correct_fn=None, correct_steps=(),
    )
    _, calib_log = calib_sampler(
        params, jax.random.fold_in(rng, 8), calib_lq,
        [""] * len(calib_recs), return_ocr_log=True,
    )
    def dump_spot_log(tag_name, log):
        """Per-step raw spotter outputs (scores/recs/keep) -> NPZ, so vote /
        threshold hyperparameters are tunable OFFLINE on the calib scenes
        (tools/tune_tsm_vote.py) without re-running the sampler."""
        if not log:
            return
        np.savez_compressed(
            os.path.join(args.out_dir, f"{tag_name}_spot_log.npz"),
            scores=np.stack([r.scores for r in log]),
            recs=np.stack([r.recs for r in log]),
            keep=np.stack([r.keep for r in log]),
        )

    calib_final = calib_log[-1]
    dump_spot_log("calib", calib_log)
    calib_sweep = f1_sweep(
        calib_final.scores, calib_final.recs,
        [sorted(set(r["text"])) for r in calib_recs], WORDS,
    )
    best_f1 = max(r["f1"] for r in calib_sweep)
    if best_f1 <= 0.0:
        # nothing informative to calibrate on: keep the reference default
        # rather than letting a degenerate sweep pick the loosest threshold
        # (which would flood the TSM prompts with garbage words)
        threshold = testr_cfg.inference_th_test
    else:
        # among F1 ties prefer the strictest threshold (fewer false spots
        # feeding the prompt at intermediate steps)
        threshold = max(r["th"] for r in calib_sweep if r["f1"] == best_f1)
    print(f"[ocr-probe] calibrated threshold {threshold} "
          f"(train F1 {best_f1:.2f}; sweep {calib_sweep})")

    guided = OCRGuidedSampler(
        pipe, spotter, encoder, caption_style="tag",
        correct_fn=lambda words, i: snap_words(words, WORDS),
        correct_steps=tuple(range(args.infer_steps)),
        threshold=threshold,
        vote_frac=args.vote_frac,
        vote_topk=args.vote_topk or None,
    )
    t0 = _time.perf_counter()
    sr_b, ocr_log = guided(
        params, rng_s, lq_j, null_prompts, return_ocr_log=True,
    )
    sr_b = np.clip(np.asarray(sr_b), 0.0, 1.0)  # host pull = hard sync
    tsm_s_per_image = (_time.perf_counter() - t0) / len(eval_recs)
    dump_spot_log("eval", ocr_log)

    # word accuracy: the voted final belief (gates) + final-step-only reads
    final = ocr_log[-1] if ocr_log else None
    word_rows = []
    for i, r in enumerate(eval_recs):
        raw_words = final.texts[i] if final is not None else []
        snapped = snap_words(raw_words, WORDS)
        voted = (final.voted_texts[i]
                 if final is not None and final.voted_texts is not None
                 else snapped)
        p_r, r_r, f_r = word_prf(raw_words, r["text"])
        p_s, r_s, f_s = word_prf(snapped, r["text"])
        p_v, r_v, f_v = word_prf(voted, r["text"])
        word_rows.append({
            "img_id": r["img_id"], "gt_words": sorted(set(r["text"])),
            "raw_words": raw_words, "snapped_words": snapped,
            "voted_words": voted,
            "raw_f1": f_r, "snapped_precision": p_s,
            "snapped_recall": r_s, "snapped_f1": f_s,
            "voted_precision": p_v, "voted_recall": r_v, "voted_f1": f_v,
        })

    # score telemetry: per-step distribution + eval-side threshold sweep
    # (VERDICT r3: without this, "scores at 0.44" and "scores at 0.01" were
    # indistinguishable in the committed artifact)
    per_step_scores = [
        {
            "step": i,
            "max": float(res.scores.max()),
            "mean": float(res.scores.mean()),
            "p90": float(np.percentile(res.scores, 90)),
        }
        for i, res in enumerate(ocr_log)
    ]
    eval_sweep = (
        f1_sweep(final.scores, final.recs,
                 [sorted(set(r["text"])) for r in eval_recs], WORDS)
        if final is not None else []
    )

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
    agg["word_f1_voted"] = float(np.mean([w["voted_f1"] for w in word_rows]))
    agg["word_f1_snapped_last_step"] = float(
        np.mean([w["snapped_f1"] for w in word_rows])
    )
    agg["word_f1_raw"] = float(np.mean([w["raw_f1"] for w in word_rows]))
    if args.smoke:
        agg["pass"] = None
    else:
        agg["pass"] = bool(
            agg["B_tsm"]["crop_psnr"] > agg["A_null"]["crop_psnr"]
            and agg["word_f1_voted"] >= 0.5
        )

    result = {
        "aggregate": agg,
        "words": word_rows,
        "telemetry": {
            "threshold": threshold,
            "threshold_default": testr_cfg.inference_th_test,
            "calibration_sweep_train": calib_sweep,
            "f1_sweep_eval": eval_sweep,
            "per_step_scores": per_step_scores,
            "tsm_s_per_image": tsm_s_per_image,
        },
        "config": {
            "image_size": size, "vae_steps": args.vae_steps,
            "s1_steps": args.s1_steps, "s2_steps": args.s2_steps,
            "s3_steps": args.s3_steps, "infer_steps": args.infer_steps,
            "guidance": args.guidance, "smoke": args.smoke,
            "n_train": args.n_train,
            "vote_frac": args.vote_frac, "vote_topk": args.vote_topk or None,
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
        f"{agg['C_oracle']['crop_psnr']:.2f} dB; voted word F1 "
        f"{agg['word_f1_voted']:.2f} (last-step "
        f"{agg['word_f1_snapped_last_step']:.2f}, raw {agg['word_f1_raw']:.2f})"
    )


if __name__ == "__main__":
    main()
