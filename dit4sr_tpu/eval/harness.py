"""Evaluation harness: per-sample metrics, text-bbox crop protocol,
aggregate tables, artifact dumps.

Rebuild of test/test.py:226-741:
  * full-image metrics + min-max-normalized variants (:416-454);
  * per-bbox text-crop metrics — crop each annotated text box, upscale so
    the min side is >= 96 (bilinear), metric per crop, averaged (:455-499);
  * per-image txt dumps and a dataset-level aggregate table (:506-741).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.eval.metrics import MetricBank

MIN_CROP_SIDE = 96


def crop_and_resize(img: np.ndarray, box_xyxy, min_side: int = MIN_CROP_SIDE):
    """Crop one bbox from an NHWC[1] image; bilinear-upscale so min side >=
    min_side (test/test.py:455-476)."""
    import cv2

    h, w = img.shape[0], img.shape[1]
    x1, y1, x2, y2 = [int(round(v)) for v in box_xyxy]
    x1, y1 = max(0, x1), max(0, y1)
    x2, y2 = min(w, x2), min(h, y2)
    if x2 <= x1 + 1 or y2 <= y1 + 1:
        return None
    crop = img[y1:y2, x1:x2]
    ch, cw = crop.shape[:2]
    s = max(1.0, min_side / min(ch, cw))
    if s > 1.0:
        crop = cv2.resize(
            crop, (int(round(cw * s)), int(round(ch * s))),
            interpolation=cv2.INTER_LINEAR,
        )
    return crop


@dataclass
class EvalResult:
    per_image: List[Dict] = field(default_factory=list)

    def aggregate(self) -> Dict[str, float]:
        keys = set()
        for r in self.per_image:
            keys.update(k for k, v in r.items() if isinstance(v, (int, float)))
        out = {}
        for k in sorted(keys):
            vals = [r[k] for r in self.per_image if k in r]
            if vals:
                out[k] = float(np.mean(vals))
        return out


class Evaluator:
    def __init__(self, out_dir: Optional[str] = None, weights_dir: Optional[str] = None):
        self.bank = MetricBank(weights_dir)
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

    def evaluate_sample(
        self,
        img_id: str,
        pred: np.ndarray,     # (H, W, 3) in [0,1]
        gt: Optional[np.ndarray],
        boxes_xyxy: Optional[List] = None,   # absolute pixel coords
    ) -> Dict:
        record: Dict = {"img_id": img_id}
        p4 = jnp.asarray(pred[None])
        g4 = jnp.asarray(gt[None]) if gt is not None else None

        full = self.bank.compute(p4, g4)
        for k, v in full.items():
            record[f"full/{k}"] = float(v[0])

        if gt is not None and boxes_xyxy:
            crop_metrics: Dict[str, List[float]] = {}
            for box in boxes_xyxy:
                cp = crop_and_resize(pred, box)
                cg = crop_and_resize(gt, box)
                if cp is None or cg is None or cp.shape != cg.shape:
                    continue
                if min(cp.shape[0], cp.shape[1]) < 12:
                    continue
                m = self.bank.compute(jnp.asarray(cp[None]), jnp.asarray(cg[None]))
                for k, v in m.items():
                    crop_metrics.setdefault(k, []).append(float(v[0]))
            for k, vals in crop_metrics.items():
                record[f"crop/{k}"] = float(np.mean(vals))
            record["num_crops"] = len(next(iter(crop_metrics.values()), []))

        if self.out_dir:
            with open(os.path.join(self.out_dir, f"{img_id}.json"), "w") as f:
                json.dump(record, f, indent=1)
        return record

    def run(self, samples) -> EvalResult:
        """samples: iterable of dicts {img_id, pred, gt, boxes_xyxy}."""
        result = EvalResult()
        for s in samples:
            result.per_image.append(
                self.evaluate_sample(
                    s["img_id"], s["pred"], s.get("gt"), s.get("boxes_xyxy")
                )
            )
        if self.out_dir:
            agg = result.aggregate()
            with open(os.path.join(self.out_dir, "final_metrics.json"), "w") as f:
                json.dump(agg, f, indent=1)
            with open(os.path.join(self.out_dir, "final_metrics.txt"), "w") as f:
                for k, v in agg.items():
                    f.write(f"{k}: {v:.4f}\n")
        return result
