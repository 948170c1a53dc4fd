"""TextSpotter: the TransformerDetector equivalent
(testr/adet/modeling/transformer_detector.py:39-153).

Wraps TESTR with the training criterion and static-shape inference: instead
of ragged `Instances`, inference returns fixed (B, K) arrays plus a `keep`
mask (score >= 0.45), leaving host code to do any ragged post-processing.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dit4sr_tpu.config import TESTRConfig
from dit4sr_tpu.models.testr.losses import criterion
from dit4sr_tpu.models.testr.matcher import OCRTargets
from dit4sr_tpu.models.testr.model import TESTR, TESTROutput, fuse_dit_features


class SpotterPredictions(NamedTuple):
    scores: jnp.ndarray     # (B, K)
    keep: jnp.ndarray       # (B, K) bool, score >= threshold
    polygons: jnp.ndarray   # (B, K, Np, 2) absolute pixel coords
    recs: jnp.ndarray       # (B, K, Nw) argmax char ids
    rec_scores: jnp.ndarray  # (B, K, Nw, V+1) softmax char probs


class TextSpotter:
    """Bundles the TESTR module + params; provides loss and inference."""

    def __init__(self, cfg: TESTRConfig, feat_hw: Tuple[int, int] = (64, 64)):
        self.cfg = cfg
        self.model = TESTR(cfg, feat_hw=feat_hw)

    def init(self, rng, feats: jnp.ndarray):
        return self.model.init(rng, feats)

    def loss(
        self,
        params,
        feats: jnp.ndarray,
        targets: OCRTargets,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """feats: stacked NHWC DiT features (Lext, B, H, W, C), fp32.
        With `rng`, dropout is active (training; reference trains the
        deformable transformer with dropout 0.1 throughout)."""
        if rng is not None and self.cfg.dropout > 0:
            out = self.model.apply(
                params, feats.astype(self.cfg.dtype), deterministic=False,
                rngs={"dropout": rng},
            )
        else:
            out = self.model.apply(params, feats.astype(self.cfg.dtype))
        return criterion(self.cfg, out, targets)

    def predict(
        self, params, feats: jnp.ndarray, image_size: Tuple[int, int] = (512, 512)
    ) -> SpotterPredictions:
        out = self.model.apply(params, feats.astype(self.cfg.dtype))
        return self.inference(out, image_size)

    def inference(
        self, out: TESTROutput, image_size: Tuple[int, int] = (512, 512)
    ) -> SpotterPredictions:
        """transformer_detector.py:124-153 with static shapes."""
        cls = out.ctrl_logits[-1]                    # (B, K, Np, 1)
        coord = out.ctrl_points[-1]                  # (B, K, Np, 2)
        text = jax.nn.softmax(out.text_logits[-1], axis=-1)
        prob = jax.nn.sigmoid(cls.mean(axis=-2))     # (B, K, 1)
        scores = prob.max(-1)
        keep = scores >= self.cfg.inference_th_test
        h, w = image_size
        polygons = coord * jnp.asarray([w, h], jnp.float32)
        recs = jnp.argmax(text, axis=-1)
        return SpotterPredictions(scores, keep, polygons, recs, text)


def pad_targets(
    raw_targets: list, cfg: TESTRConfig
) -> OCRTargets:
    """Host helper: list of per-image dicts with ragged numpy arrays
    {labels (n,), boxes (n,4) cxcywh, ctrl_points (n,Np,2), texts (n,Nw)}
    -> padded OCRTargets (collate_fn_real's ragged lists made static,
    pho_realesrgan_dataset.py:294-328)."""
    import numpy as np

    B, I = len(raw_targets), cfg.max_instances
    Np, Nw = cfg.num_ctrl_points, cfg.max_text_len
    labels = np.zeros((B, I), np.int32)
    boxes = np.zeros((B, I, 4), np.float32)
    pts = np.zeros((B, I, Np, 2), np.float32)
    texts = np.full((B, I, Nw), cfg.voc_size, np.int32)
    valid = np.zeros((B, I), bool)
    for b, t in enumerate(raw_targets):
        n = min(len(t["labels"]), I)
        if n == 0:
            continue
        labels[b, :n] = t["labels"][:n]
        boxes[b, :n] = t["boxes"][:n]
        # slice/pad to the config's static point/word lengths (the dataset
        # encodes words at charset.MAX_WORD_LEN, which may differ)
        p = min(t["ctrl_points"].shape[1], Np)
        pts[b, :n, :p] = t["ctrl_points"][:n, :p]
        w = min(t["texts"].shape[1], Nw)
        texts[b, :n, :w] = t["texts"][:n, :w]
        valid[b, :n] = True
    return OCRTargets(
        jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(pts),
        jnp.asarray(texts), jnp.asarray(valid),
    )
