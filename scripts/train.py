"""Training entry point: python scripts/train.py --config configs/train_stage3.yaml

Rebuild of train/train_dit4sr.py's CLI (the accelerate launcher disappears:
data parallelism comes from the jax mesh, not process spawning)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--mmdit_ckpt", default=None, help="diffusers safetensors dir")
    ap.add_argument("--num_steps", type=int, default=None)
    ap.add_argument("--wandb", action="store_true")
    args = ap.parse_args()

    from dit4sr_tpu.config import (
        MMDiTConfig,
        SchedulerConfig,
        TESTRConfig,
        VAEConfig,
        load_yaml_config,
    )
    from dit4sr_tpu.data.satext import SATextDataset, load_samtext_annotations
    from dit4sr_tpu.models.vae import AutoencoderKL
    from dit4sr_tpu.text.encoders import HashTextEncoder
    from dit4sr_tpu.train.trainer import Trainer

    cfgs = load_yaml_config(args.config)
    with open(args.config) as f:
        raw = yaml.safe_load(f)

    model_cfg = cfgs.get("model", MMDiTConfig())
    vae_cfg = cfgs.get("vae", VAEConfig())
    train_cfg = cfgs["train"]
    testr_cfg = cfgs.get("testr") if train_cfg.stage in ("stage2", "stage3") else None
    if testr_cfg is None and train_cfg.stage in ("stage2", "stage3"):
        testr_cfg = TESTRConfig()
    out_dir = args.out_dir or os.path.join(
        "runs", os.path.splitext(os.path.basename(args.config))[0]
    )

    trainer = Trainer(
        model_cfg, vae_cfg, train_cfg, testr_cfg,
        cfgs.get("scheduler", SchedulerConfig()),
        out_dir=out_dir, use_wandb=args.wandb,
    )

    # data
    data = raw.get("data", {})
    records = load_samtext_annotations(data["ann_path"], data["hq_img_path"])
    dataset = SATextDataset(
        records,
        null_text_ratio=train_cfg.null_text_ratio,
        caption_style=data.get("caption_style", "descriptive"),
        seed=train_cfg.seed,
    )
    batches = dataset.iter_batches(train_cfg.batch_size, testr_cfg)

    # params
    mmdit_params = None
    if args.mmdit_ckpt:
        from dit4sr_tpu.utils.weights import convert_mmdit, load_safetensors

        sd = load_safetensors(
            os.path.join(args.mmdit_ckpt, "diffusion_pytorch_model.safetensors")
        )
        mmdit_params = jax.tree.map(jnp.asarray, convert_mmdit(sd, model_cfg))

    state = trainer.init_state(jax.random.PRNGKey(train_cfg.seed), mmdit_params)

    vae = AutoencoderKL(vae_cfg)
    vae_params = jax.jit(
        lambda: vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), vae_cfg.dtype))
    )()
    # TODO: load real VAE weights via utils.weights.convert_vae when present

    # text encoding: on-device encoders when weights exist, hash fallback
    encoder = HashTextEncoder(seq_len=154)

    state = trainer.fit(
        state, batches, vae_params, encoder,
        jax.random.PRNGKey(train_cfg.seed + 1), num_steps=args.num_steps,
    )
    print(f"finished at step {int(state.step)}; artifacts in {out_dir}")


if __name__ == "__main__":
    main()
