"""Training entry point: python scripts/train.py --config configs/train_stage3.yaml

Rebuild of train/train_dit4sr.py's CLI (the accelerate launcher disappears:
data parallelism comes from the jax mesh, not process spawning). Real weight
assets flow through --sd3_ckpt/--mmdit_ckpt/--vae_ckpt/--testr_ckpt and the
tested converters (utils/weights.py); absent assets fall back to random init
with a loud banner. `--smoke` runs 2 tiny-geometry steps on synthetic data —
the CI proof that the shipped YAMLs drive this CLI end to end.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize pins jax_platforms; honor an explicit env override
# (env var alone is ignored after sitecustomize runs — see CLAUDE.md)
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--sd3_ckpt", default=None,
                    help="SD3.5 diffusers root (transformer+vae+text encoders+tokenizers)")
    ap.add_argument("--mmdit_ckpt", default=None,
                    help="transformer dir/safetensors (overrides --sd3_ckpt)")
    ap.add_argument("--vae_ckpt", default=None,
                    help="vae dir/safetensors (overrides --sd3_ckpt)")
    ap.add_argument("--testr_ckpt", default=None, help="TESTR .pt/.safetensors")
    ap.add_argument("--text_ckpt", default=None,
                    help="root with text_encoder{,_2,_3} + tokenizers (overrides --sd3_ckpt)")
    ap.add_argument("--lora_rank", type=int, default=0,
                    help="train ONLY a rank-N LoRA adapter on the MMDiT "
                         "(models/lora.py); base weights stay frozen")
    ap.add_argument("--num_steps", type=int, default=None)
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry + synthetic data, 2 steps")
    ap.add_argument("--rehearse", action="store_true",
                    help="FULL geometry on synthetic data (B=2, frozen "
                         "params stored bf16): proves the training loop + "
                         "checkpoint/resume on real hardware without assets")
    ap.add_argument("--async_ckpt", nargs="?", const="host_staged",
                    choices=["host_staged", "device_staged", "orbax"],
                    help="overlap checkpointing with training. host_staged: "
                         "foreground device->host pull + background disk "
                         "writer (axon-safe). device_staged: on-device "
                         "snapshot, pull AND write in the background (costs "
                         "transient HBM). orbax: orbax's own async save "
                         "(stalls on axon)")
    ap.add_argument("--ckpt_bf16", action="store_true",
                    help="lossy bf16 checkpoint transport: fp32 leaves are "
                         "cast on device before the device->host pull, "
                         "halving the bytes over the axon tunnel (the pull "
                         "blocks the loop 409-465 s/save at stage-3 "
                         "geometry). Restore casts back; dirs are "
                         "self-describing via transport.json")
    args = ap.parse_args()

    from dit4sr_tpu.bootstrap import (
        banner,
        build_mmdit,
        build_prompt_encoder,
        build_testr,
        build_vae,
    )
    from dit4sr_tpu.parallel.distributed import maybe_initialize_multihost

    if maybe_initialize_multihost():
        print(f"multi-host: process {jax.process_index()}/{jax.process_count()}")
    from dit4sr_tpu.config import (
        MMDiTConfig,
        SchedulerConfig,
        TESTRConfig,
        VAEConfig,
        load_yaml_config,
        mmdit_tiny,
        testr_tiny,
        vae_tiny,
    )
    from dit4sr_tpu.data.satext import (
        SATextDataset,
        load_samtext_annotations,
        make_synthetic_records,
    )
    from dit4sr_tpu.train.ocr_loss import num_streams_extracted
    from dit4sr_tpu.train.trainer import Trainer

    cfgs = load_yaml_config(args.config)
    with open(args.config) as f:
        raw = yaml.safe_load(f)

    model_cfg = cfgs.get("model", MMDiTConfig())
    vae_cfg = cfgs.get("vae", VAEConfig())
    train_cfg = cfgs["train"]
    testr_cfg = cfgs.get("testr")
    if testr_cfg is None and train_cfg.stage in ("stage2", "stage3"):
        testr_cfg = TESTRConfig()
    if train_cfg.stage == "stage1":
        testr_cfg = None

    crop_size, latent_size, text_len = 512, 64, 154
    num_steps = args.num_steps
    if args.smoke:
        # tiny geometry, same structure: proves the CLI path, not the model
        feat_layers = (
            (0, 1) if model_cfg.feat_extract_layers else ()
        )
        vae_cfg = vae_tiny()
        model_cfg = mmdit_tiny(
            feat_extract=model_cfg.feat_extract,
            feat_extract_layers=feat_layers,
            streams=model_cfg.streams,
            ffn_couplings=model_cfg.ffn_couplings,
            in_channels=vae_cfg.latent_channels,
            out_channels=vae_cfg.latent_channels,
        )
        if testr_cfg is not None:
            testr_cfg = testr_tiny(
                num_dit_layers=len(feat_layers) or 2,
                num_feature_levels=min(4, len(feat_layers) or 2),
                dit_dim=model_cfg.inner_dim,
                feat_extract=model_cfg.feat_extract,
            )
        import dataclasses

        train_cfg = dataclasses.replace(
            train_cfg,
            batch_size=2,
            gradient_accumulation_steps=1,
            checkpointing_steps=2,
        )
        crop_size, latent_size, text_len = 64, 16, 16
        num_steps = num_steps or 2
    elif args.rehearse:
        import dataclasses

        train_cfg = dataclasses.replace(
            train_cfg,
            batch_size=2,
            gradient_accumulation_steps=1,
            checkpointing_steps=50,
            frozen_params_in_compute_dtype=True,
            # rehearsal exists to prove the loop on hardware — include the
            # per-module grad-norm path too. (--async_ckpt opts into the
            # host_staged async save; orbax's OWN async mode stalls on axon —
            # <1 MB written in 10 min at full geometry, see CLAUDE.md)
            log_grad_norms=True,
        )
        num_steps = num_steps or 150
        # lean init: random-init in bf16 (half the fp32 peak); init_state
        # upcasts the trainable partition to its fp32 master
        model_cfg = model_cfg.with_(param_dtype=jnp.bfloat16)
        vae_cfg = vae_cfg.with_(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

    if args.lora_rank > 0:
        import dataclasses

        train_cfg = dataclasses.replace(
            train_cfg,
            lora_rank=args.lora_rank,
            finetune_layer_names=("mmdit_lora",),
        )

    if args.async_ckpt or args.ckpt_bf16:
        import dataclasses

        kw = {}
        if args.async_ckpt:
            kw.update(async_checkpointing=True,
                      async_checkpoint_mode=args.async_ckpt)
        if args.ckpt_bf16:
            kw.update(checkpoint_transport_dtype="bfloat16")
        train_cfg = dataclasses.replace(train_cfg, **kw)

    out_dir = args.out_dir or os.path.join(
        "runs", os.path.splitext(os.path.basename(args.config))[0]
    )

    trainer = Trainer(
        model_cfg, vae_cfg, train_cfg, testr_cfg,
        cfgs.get("scheduler", SchedulerConfig()),
        out_dir=out_dir, use_wandb=args.wandb,
    )
    # per-experiment config copy, like the reference (initialize.py:124)
    import shutil

    shutil.copyfile(args.config, os.path.join(out_dir, "train_config.yaml"))

    # data
    data = raw.get("data", {})
    if args.smoke or args.rehearse:
        records = make_synthetic_records(
            8 if args.smoke else 32, image_size=crop_size,
            num_ctrl_points=testr_cfg.num_ctrl_points if testr_cfg else 16,
        )
    else:
        records = load_samtext_annotations(data["ann_path"], data["hq_img_path"])
    dataset = SATextDataset(
        records,
        null_text_ratio=train_cfg.null_text_ratio,
        caption_style=data.get("caption_style", "descriptive"),
        crop_size=crop_size,
        seed=train_cfg.seed,
    )
    batches = dataset.iter_batches(train_cfg.batch_size, testr_cfg)

    # models + weights (initialize.py:304-457 equivalent)
    rng = jax.random.PRNGKey(train_cfg.seed)
    mmdit_ckpt = args.mmdit_ckpt or args.sd3_ckpt
    _, mmdit_params, mmdit_loaded = build_mmdit(
        model_cfg, rng, None if args.smoke else mmdit_ckpt, text_len=text_len
    )
    vae, vae_params, vae_loaded = build_vae(
        vae_cfg, jax.random.fold_in(rng, 1),
        None if args.smoke else (args.vae_ckpt or args.sd3_ckpt),
    )
    trainer.vae = vae  # ensure the trainer uses the same module definition

    testr_params = None
    if testr_cfg is not None and args.testr_ckpt and not args.smoke:
        n_ext = num_streams_extracted(model_cfg)
        c = model_cfg.inner_dim // (model_cfg.patch_size ** 2) * n_ext
        feats_shape = (
            len(model_cfg.feat_extract_layers), 1,
            latent_size, latent_size, c,
        )
        _, testr_params, _ = build_testr(
            testr_cfg, jax.random.fold_in(rng, 2), feats_shape,
            args.testr_ckpt, feat_hw=(latent_size, latent_size),
        )

    encoder, text_loaded = build_prompt_encoder(
        None if args.smoke else (args.text_ckpt or args.sd3_ckpt), t5_length=77
    )
    if args.smoke:
        from dit4sr_tpu.text.encoders import HashTextEncoder

        encoder = HashTextEncoder(seq_len=text_len,
                                  joint_dim=model_cfg.joint_attention_dim,
                                  pooled_dim=model_cfg.pooled_projection_dim)
    if not (mmdit_loaded and vae_loaded and text_loaded) and not args.smoke:
        banner(
            "TRAINING WITH RANDOM/FALLBACK WEIGHTS for: "
            + ", ".join(
                n for n, ok in [
                    ("mmdit", mmdit_loaded), ("vae", vae_loaded),
                    ("text", text_loaded),
                ] if not ok
            )
            + " — pass --sd3_ckpt (and --testr_ckpt) for a real run"
        )

    # in-training validation samples (reference train_dit4sr.py:519-748):
    # optional data.val_lq_path/val_gt_path globs, capped at 4 images
    val_samples = None
    if train_cfg.validation_steps > 0 and data.get("val_lq_path"):
        import cv2
        import numpy as np
        from glob import glob

        def _read(p):
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            return img.astype(np.float32) / 255.0

        lqs = sorted(glob(os.path.join(data["val_lq_path"], "*.jpg")))[:4]
        gt_dir = data.get("val_gt_path")
        val_samples = [
            {
                "lq": _read(p),
                "gt": _read(os.path.join(gt_dir, os.path.basename(p)))
                if gt_dir else None,
                "prompt": "",
                "img_id": os.path.splitext(os.path.basename(p))[0],
            }
            for p in lqs
        ]

    state = trainer.init_state(
        rng, mmdit_params, testr_params,
        latent_size=latent_size, text_len=text_len,
    )
    state = trainer.fit(
        state, batches, vae_params, encoder,
        jax.random.PRNGKey(train_cfg.seed + 1), num_steps=num_steps,
        val_samples=val_samples,
    )
    if trainer.preempted:
        print(f"preempted at step {int(state.step)}; checkpoint is durable — "
              f"restart resumes from it (artifacts in {out_dir})")
    else:
        print(f"finished at step {int(state.step)}; artifacts in {out_dir}")


if __name__ == "__main__":
    main()
