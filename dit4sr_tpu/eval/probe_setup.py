"""Shared geometry/assets for the zero-asset quality probes.

scripts/quality_probe_ocr.py trains the three-stage text-aware probe and
pickles its weights; scripts/serving_quality_sweep.py re-loads those weights
to measure the QUALITY cost of every approximate serving mode (w8a8, block
cache, few-step/distilled). Both must build bit-identical configs — this
module is the single source of truth for that geometry.

Reference counterpart: none (the reference validates its serving quality on
pyiqa checkpoints it ships with, test/test.py:162-169; the zero-egress
container forces us to earn the weights ourselves).
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ProbeGeometry(NamedTuple):
    vae_cfg: object
    model_cfg: object
    testr_cfg: object
    latent_size: int
    text_len: int


def ocr_probe_geometry(image_size: int, smoke: bool,
                       spotter_preset: str = "v1") -> ProbeGeometry:
    """The OCR probe's /4 VAE + 6-layer MMDiT (+feature taps) + spotter.

    Must stay in lockstep with any pickles already trained under
    artifacts/quality_probe_ocr — changing it invalidates them.

    spotter_preset only changes the TESTR geometry (VAE/MMDiT stay pickle-
    compatible across presets, so stage-1 weights are reusable):
      v1 — d=128, 3+3 layers (the r3-r5 probe; held-out word-F1 ceiling
           0.43 measured across the whole vote-config space — capacity-
           bound per artifacts/quality_probe_ocr/NOTES.md)
      v2 — d=192, 4+4 layers, dim_ff 768 (the r5 capacity fix)
    """
    from dit4sr_tpu.config import (
        MMDiTConfig, TESTRConfig, VAEConfig, mmdit_tiny, testr_tiny, vae_tiny,
    )

    size = image_size
    if smoke:
        vae_cfg = vae_tiny(block_out_channels=(8, 16, 16))   # /4
        latent_size = size // 4
        model_cfg = mmdit_tiny(
            in_channels=vae_cfg.latent_channels,
            out_channels=vae_cfg.latent_channels,
            sample_size=latent_size,
            pos_embed_max_size=latent_size,
            feat_extract_layers=(0, 1),
            feat_extract="hq+control",
        )
        testr_cfg = testr_tiny(
            num_feature_levels=2, num_dit_layers=2,
            dit_dim=model_cfg.inner_dim // 4 * 2,
        )
    else:
        vae_cfg = VAEConfig(
            latent_channels=8,
            block_out_channels=(64, 128, 128),               # /4 downsample
            layers_per_block=1,
            norm_num_groups=16,
            sample_size=size,
            dtype=jnp.float32,
        )
        latent_size = size // 4
        model_cfg = MMDiTConfig(
            sample_size=latent_size,
            patch_size=2,
            in_channels=vae_cfg.latent_channels,
            out_channels=vae_cfg.latent_channels,
            num_layers=6,
            attention_head_dim=64,
            num_attention_heads=6,
            joint_attention_dim=256,
            caption_projection_dim=384,
            pooled_projection_dim=128,
            pos_embed_max_size=latent_size,
            dual_attention_layers=(0, 1),
            feat_extract_layers=(2, 4),     # mid + late block taps
            feat_extract="hq+control",
            dtype=jnp.float32,
        )
        # modest spotter: 2 levels over 64x64 maps (8192 enc tokens), d=128.
        # dit_dim must equal the unpatchified channel count
        # inner_dim/(p^2) * 2 streams = 384/4*2 = 192.
        if spotter_preset == "v2":
            d_model, nlayers, dff = 192, 4, 768
        else:
            d_model, nlayers, dff = 128, 3, 512
        testr_cfg = TESTRConfig(
            d_model=d_model,
            nheads=8,
            num_encoder_layers=nlayers,
            num_decoder_layers=nlayers,
            dim_feedforward=dff,
            num_feature_levels=2,
            num_queries=40,
            num_ctrl_points=8,
            max_text_len=12,
            max_instances=8,
            num_dit_layers=2,
            dit_dim=model_cfg.inner_dim // 4 * 2,
            matcher_topk=64,
            dtype=jnp.float32,
        )
    return ProbeGeometry(vae_cfg, model_cfg, testr_cfg, latent_size, text_len=16)


def ocr_probe_encoder(geom: ProbeGeometry):
    from dit4sr_tpu.text.encoders import WordHashTextEncoder

    return WordHashTextEncoder(
        seq_len=geom.text_len,
        joint_dim=geom.model_cfg.joint_attention_dim,
        pooled_dim=geom.model_cfg.pooled_projection_dim,
    )


def ocr_probe_degradation():
    """Stage-1 probe's calibrated recipe: LQ lands ~23.6 dB — text partially
    readable, not trivially restorable from pixels alone."""
    from dit4sr_tpu.data.degradation import mild_params

    return functools.partial(mild_params, blur_sigma=3.0, noise_sigma2=25.0)


def load_probe_weights(out_dir: str):
    """Load the probe's VAE (+latent calibration) and the latest stage's
    params from its pickles. Returns (vae_params, scaling, shift, stage_tag,
    stage_params) where stage_params has 'mmdit' (+'testr' for stages 2/3)."""
    vae_pkl = os.path.join(out_dir, "vae.pkl")
    if not os.path.exists(vae_pkl):
        raise FileNotFoundError(
            f"{vae_pkl} missing — run scripts/quality_probe_ocr.py first"
        )
    with open(vae_pkl, "rb") as f:
        saved = pickle.load(f)
    for tag in ("stage3", "stage2", "stage1"):
        pkl = os.path.join(out_dir, f"{tag}.pkl")
        if os.path.exists(pkl):
            with open(pkl, "rb") as f:
                params = pickle.load(f)
            return saved["params"], saved["scaling"], saved["shift"], tag, params
    raise FileNotFoundError(f"no stage pickle under {out_dir}")
