"""OCR-loss adapter: MMDiT feature slices -> TESTR criterion.

Bridges the train step's feature hook (train/train_step.py) to the text
spotter, reproducing the reference's path: per-block extracted features are
unpatchified into NHWC maps (train_dit4sr.py:275-294) and fed to the
detector with padded targets (:341-362). TESTR math runs in fp32 (the
reference keeps it out of autocast, initialize.py:626-633).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from dit4sr_tpu.config import MMDiTConfig, TESTRConfig
from dit4sr_tpu.models.testr.detector import TextSpotter
from dit4sr_tpu.models.testr.model import fuse_dit_features


def num_streams_extracted(model_cfg: MMDiTConfig) -> int:
    return 2 if model_cfg.feat_extract == "hq+control" else 1


def make_ocr_loss_fn(
    spotter: TextSpotter, model_cfg: MMDiTConfig
) -> Callable:
    """Returns ocr_loss_fn(testr_params, feats, targets) -> (loss, metrics)
    for train_step.make_train_step."""
    n_ext = num_streams_extracted(model_cfg)

    def ocr_loss_fn(testr_params, feats, targets, rng=None):
        maps = fuse_dit_features(
            feats.astype(jnp.float32), model_cfg.patch_size, n_ext
        )
        total, losses = spotter.loss(testr_params, maps, targets, rng=rng)
        return total, {f"ocr/{k}": v for k, v in losses.items()}

    return ocr_loss_fn
