"""Few-step distillation entry point (beyond the reference, which has no
fast-sampling path — its protocol is a fixed 40-step loop, test/test.py:311).

    python scripts/distill.py --config configs/train_stage1.yaml \
        --sd3_ckpt /path/to/sd3.5-medium --steps 28,14,7,4 --phase_steps 2000

Runs progressive distillation (train/distill.py): each phase halves the
student's inference step count; phase k's student is phase k+1's teacher.
Phase results are saved under <out_dir>/phase_<N>/ (orbax); the final
few-step params drive SRPipeline(num_inference_steps=<N>) directly.

`--smoke` = tiny geometry + synthetic data, schedule 4,2, two steps per
phase — the CI proof that this CLI runs end to end.
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
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--sd3_ckpt", default=None)
    ap.add_argument("--mmdit_ckpt", default=None,
                    help="teacher transformer dir/safetensors (overrides --sd3_ckpt)")
    ap.add_argument("--vae_ckpt", default=None)
    ap.add_argument("--text_ckpt", default=None)
    ap.add_argument("--steps", default="28,14,7,4",
                    help="descending step ladder; first entry = teacher steps")
    ap.add_argument("--phase_steps", type=int, default=2000,
                    help="train steps per distillation phase")
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry + synthetic data")
    args = ap.parse_args()

    from dit4sr_tpu.bootstrap import (
        banner, build_mmdit, build_prompt_encoder, build_vae,
    )
    from dit4sr_tpu.config import (
        MMDiTConfig, SchedulerConfig, VAEConfig, load_yaml_config,
        mmdit_tiny, vae_tiny,
    )
    from dit4sr_tpu.data.degradation import sample_params
    from dit4sr_tpu.data.satext import SATextDataset, make_synthetic_records
    from dit4sr_tpu.models.vae import AutoencoderKL, sample_latent, scale_latent
    from dit4sr_tpu.train.distill import distill_phases
    from dit4sr_tpu.train.train_step import Batch
    from dit4sr_tpu.train.trainer import MetricLogger

    cfgs = load_yaml_config(args.config)
    import yaml

    with open(args.config) as f:
        raw = yaml.safe_load(f)

    model_cfg = cfgs.get("model", MMDiTConfig())
    vae_cfg = cfgs.get("vae", VAEConfig())
    sched_cfg = cfgs.get("scheduler", SchedulerConfig())
    train_cfg = cfgs["train"]

    crop_size, text_len, batch_size = 512, 154, train_cfg.batch_size
    steps_schedule = tuple(int(s) for s in args.steps.split(","))
    phase_steps = args.phase_steps
    if args.smoke:
        vae_cfg = vae_tiny()
        model_cfg = mmdit_tiny(
            in_channels=vae_cfg.latent_channels,
            out_channels=vae_cfg.latent_channels,
        )
        crop_size, text_len, batch_size = 64, 16, 2
        steps_schedule, phase_steps = (4, 2), 2
    if sorted(steps_schedule, reverse=True) != list(steps_schedule):
        raise SystemExit(f"--steps must be descending, got {steps_schedule}")

    out_dir = args.out_dir or os.path.join(
        "runs",
        "distill_" + os.path.splitext(os.path.basename(args.config))[0],
    )
    logger = MetricLogger(out_dir)

    # teacher + data models (initialize.py:304-457 equivalent)
    rng = jax.random.PRNGKey(train_cfg.seed)
    mmdit, teacher_params, m_ok = build_mmdit(
        model_cfg, rng,
        None if args.smoke else (args.mmdit_ckpt or args.sd3_ckpt),
        text_len=text_len,
    )
    vae, vae_params, v_ok = build_vae(
        vae_cfg, jax.random.fold_in(rng, 1),
        None if args.smoke else (args.vae_ckpt or args.sd3_ckpt),
    )
    encoder, e_ok = build_prompt_encoder(
        None if args.smoke else (args.text_ckpt or args.sd3_ckpt), t5_length=77
    )
    if args.smoke or not e_ok:
        from dit4sr_tpu.text.encoders import HashTextEncoder

        encoder = HashTextEncoder(
            seq_len=text_len,
            joint_dim=model_cfg.joint_attention_dim,
            pooled_dim=model_cfg.pooled_projection_dim,
        )
    if not args.smoke and not (m_ok and v_ok and e_ok):
        banner("DISTILLING RANDOM/FALLBACK WEIGHTS — pass --sd3_ckpt for a real run")

    # data: HQ crops -> degradation -> latent batches (train_dit4sr.py:188-214)
    data = raw.get("data", {})
    if args.smoke:
        records = make_synthetic_records(8, image_size=crop_size)
    else:
        from dit4sr_tpu.data.satext import load_samtext_annotations

        records = load_samtext_annotations(data["ann_path"], data["hq_img_path"])
    dataset = SATextDataset(
        records, null_text_ratio=train_cfg.null_text_ratio,
        caption_style=data.get("caption_style", "descriptive"),
        crop_size=crop_size, seed=train_cfg.seed,
    )

    @jax.jit
    def preprocess(vp, key, gt, deg):
        from dit4sr_tpu.data.degradation import realesrgan_degradation

        k_deg, k_hq, k_lq = jax.random.split(key, 3)
        gt_usm, lq = realesrgan_degradation(k_deg, gt, deg)

        def encode(img, k):
            x = img.astype(vae_cfg.dtype) * 2.0 - 1.0
            mean, logvar = vae.apply(vp, x, method=AutoencoderKL.encode)
            return scale_latent(sample_latent(mean, logvar, k), vae_cfg)

        return encode(gt_usm, k_hq), encode(lq, k_lq)

    def batches_fn():
        np_rng = np.random.default_rng(train_cfg.seed)
        data_rng = jax.random.PRNGKey(train_cfg.seed + 1)
        for k, b in enumerate(dataset.iter_batches(batch_size)):
            gt = jnp.asarray(b["gt"])
            kernels = (b["kernel1"], b["kernel2"], b["sinc_kernel"])
            deg = sample_params(np_rng, gt.shape[0], kernels)
            hq, lq = preprocess(
                vae_params, jax.random.fold_in(data_rng, k), gt, deg
            )
            text, pooled = encoder(b["prompt"])
            yield Batch(hq, lq, text, pooled)

    def save_phase(result):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(out_dir, f"phase_{result.num_steps}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.tree.map(np.asarray, result.params), force=True)
        ckptr.wait_until_finished()
        print(
            f"phase {result.num_steps}-step done: loss {result.final_loss:.5f} "
            f"-> {path}",
            flush=True,
        )

    step_counter = {"n": 0}

    def log_metrics(n_steps, k, metrics):
        if k % 10 == 0 or k == phase_steps - 1:
            logger.log(
                step_counter["n"],
                {"phase": n_steps, **{m: float(v) for m, v in metrics.items()}},
            )
        step_counter["n"] += 1

    results = distill_phases(
        mmdit, teacher_params,
        batches_fn=batches_fn,
        steps_schedule=steps_schedule,
        train_steps_per_phase=phase_steps,
        rng=jax.random.PRNGKey(train_cfg.seed + 2),
        sched_cfg=sched_cfg,
        learning_rate=args.lr,
        on_metrics=log_metrics,
        on_phase_end=save_phase,
    )
    print(
        f"distilled {steps_schedule[0]} -> {results[-1].num_steps} steps; "
        f"artifacts in {out_dir}"
    )


if __name__ == "__main__":
    main()
