"""SAMText ("satext") dataset: annotation parsing + training dataset.

Host-side rebuild of the reference's data path:
  * `load_samtext_annotations` == dataloaders/utils.py:54-170 (per-image
    text_instances -> normalized cxcywh boxes + 16-point polygons + encoded
    words, filtered to printable-ASCII words of len < 26);
  * `SATextDataset` == basicsr/data/pho_realesrgan_dataset.py:33-291 (HQ jpg
    read with retry, null-prompt dropout, per-item Real-ESRGAN kernel
    sampling) — degradation itself runs on device (data/degradation.py);
  * `collate` == collate_fn_real (:294-328) but emits padded static-shape
    OCRTargets instead of ragged Python lists.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from glob import glob
from typing import Dict, List, Optional

import numpy as np

from dit4sr_tpu.config import TESTRConfig
from dit4sr_tpu.data import charset
from dit4sr_tpu.data.kernels import sample_degradation_kernels


def load_samtext_annotations(
    ann_path: str,
    img_dir: str,
    prompt_dir: Optional[str] = None,
    image_size: int = 512,
) -> List[Dict]:
    """Parse the SAMText dataset.json into per-image records."""
    with open(ann_path) as f:
        anns = sorted(json.load(f).items())
    img_paths = sorted(glob(os.path.join(img_dir, "*.jpg")))
    prompt_paths = (
        sorted(glob(os.path.join(prompt_dir, "*.txt"))) if prompt_dir else None
    )

    files = []
    for idx, (img_path, (ann_id, ann)) in enumerate(zip(img_paths, anns)):
        img_id = os.path.splitext(os.path.basename(img_path))[0]
        assert img_id == ann_id, f"id mismatch: {img_id} vs {ann_id}"

        prompt = None
        if prompt_paths:
            with open(prompt_paths[idx]) as pf:
                prompt = pf.read().strip()

        texts, text_encs, boxes, polys = [], [], [], []
        for inst in ann["0"]["text_instances"]:
            text = inst["text"]
            if not charset.is_valid_word(text):
                continue
            texts.append(text)
            enc = charset.encode(text)
            assert text == charset.decode(enc), "charset round-trip failed"
            text_encs.append(enc)

            x1, y1, x2, y2 = [v / image_size for v in inst["bbox"]]
            boxes.append([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
            poly = np.asarray(inst["polygon"], np.float32) / image_size
            polys.append(poly)

        if not boxes:
            continue
        files.append(
            {
                "img_path": img_path,
                "img_id": img_id,
                "text": texts,
                "text_enc": np.asarray(text_encs, np.int32),
                "bbox": np.asarray(boxes, np.float32),
                "poly": np.stack(polys),
                "hq_prompt": prompt,
            }
        )
    return files


def synthesize_prompt(texts: List[str], style: str = "descriptive") -> str:
    """GT-text prompt synthesis (train_dit4sr.py:225-231)."""
    quoted = [f'"{t}"' for t in texts]
    if style == "descriptive":
        return (
            f"The image features the texts {', '.join(quoted)} that appear "
            "clearly on signs, boards, buildings, or other objects."
        )
    if style == "tag":
        return ", ".join(quoted)
    raise ValueError(style)


@dataclass
class SATextDataset:
    """Map-style dataset over SAMText records."""

    records: List[Dict]
    null_text_ratio: float = 0.1
    caption_style: str = "descriptive"
    crop_size: int = 512
    seed: int = 0
    read_retries: int = 3

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    def __len__(self) -> int:
        return len(self.records)

    def _read_image(self, path: str) -> np.ndarray:
        """Read + resize to (crop_size, crop_size) float32 RGB [0,1]. Prefers
        the native libjpeg decode+resize (native/imgio.cpp: one C call, GIL
        released, matches cv2's INTER_LINEAR convention); falls back to cv2
        for non-JPEG/CMYK/unbuilt-lib. Retries with a random substitute
        record on failure (reference: pho_realesrgan_dataset.py retry loop)."""
        from dit4sr_tpu.native.imgio import decode_image

        size = (self.crop_size, self.crop_size)
        last_err = None
        for _ in range(self.read_retries):
            img = decode_image(path, size)
            if img is not None:
                return img
            try:
                import cv2

                img = cv2.imread(path, cv2.IMREAD_COLOR)
                if img is None:
                    raise IOError(f"failed to read {path}")
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                img = img.astype(np.float32) / 255.0
                if img.shape[:2] != size:
                    img = cv2.resize(img, size)
                return img
            except Exception as e:  # retry with a random substitute
                last_err = e
                path = self.records[self._rng.integers(len(self.records))]["img_path"]
        raise last_err

    def __getitem__(self, idx: int) -> Dict:
        rec = self.records[idx]
        if "image" in rec:
            img = rec["image"]
            if img.shape[:2] != (self.crop_size, self.crop_size):
                import cv2

                img = cv2.resize(img, (self.crop_size, self.crop_size))
        else:
            img = self._read_image(rec["img_path"])
        return self._make_item(rec, img)

    def _make_item(self, rec: Dict, img: np.ndarray) -> Dict:
        prompt = synthesize_prompt(rec["text"], self.caption_style)
        if self._rng.uniform() < self.null_text_ratio:
            prompt = ""

        k1, k2, sinc = sample_degradation_kernels(self._rng)
        return {
            "gt": img,
            "kernel1": k1,
            "kernel2": k2,
            "sinc_kernel": sinc,
            "prompt": prompt,
            "text": rec["text"],
            "text_enc": rec["text_enc"],
            "bbox": rec["bbox"],
            "poly": rec["poly"],
            "img_id": rec["img_id"],
        }

    def collate(self, items: List[Dict], testr_cfg: Optional[TESTRConfig] = None):
        """Batch: stacked images/kernels + prompts + padded OCR targets."""
        batch = {
            "gt": np.stack([it["gt"] for it in items]),
            "kernel1": np.stack([it["kernel1"] for it in items]),
            "kernel2": np.stack([it["kernel2"] for it in items]),
            "sinc_kernel": np.stack([it["sinc_kernel"] for it in items]),
            "prompt": [it["prompt"] for it in items],
            "text": [it["text"] for it in items],
            "img_id": [it["img_id"] for it in items],
        }
        if testr_cfg is not None:
            from dit4sr_tpu.models.testr.detector import pad_targets

            raw = [
                {
                    "labels": np.zeros((len(it["bbox"]),), np.int32),
                    "boxes": it["bbox"],
                    "ctrl_points": it["poly"],
                    "texts": it["text_enc"],
                }
                for it in items
            ]
            batch["ocr_targets"] = pad_targets(raw, testr_cfg)
        return batch

    def iter_batches(
        self, batch_size: int, testr_cfg=None, shuffle=True, epochs=None,
        decode_ahead: int = 8,
    ):
        """Epoch iterator (the reference uses torch DataLoader worker
        processes; here the native decode-ahead pipeline, native/imgio.cpp,
        keeps up to `decode_ahead` JPEG decodes in flight on C++ threads
        while the host loop collates and feeds jitted device steps). Falls
        back to synchronous reads when the native library is absent or the
        records are in-memory."""
        from dit4sr_tpu.native import imgio

        epoch = 0
        loader = None
        if decode_ahead > 0 and imgio.imgio_available() and any(
            "image" not in r for r in self.records
        ):
            loader = imgio.ImageLoader(
                (self.crop_size, self.crop_size), threads=2,
                capacity=decode_ahead,
            )
        try:
            while epochs is None or epoch < epochs:
                order = np.arange(len(self))
                if shuffle:
                    self._rng.shuffle(order)
                n_full = (len(order) // batch_size) * batch_size
                idxs = [int(j) for j in order[:n_full]]
                if loader is None:
                    for i in range(0, n_full, batch_size):
                        items = [self[j] for j in idxs[i : i + batch_size]]
                        yield self.collate(items, testr_cfg)
                else:
                    sub = 0  # submit cursor; submissions == consumption order

                    def pump():
                        nonlocal sub
                        while sub < len(idxs) and loader._pending < decode_ahead:
                            r = self.records[idxs[sub]]
                            if "image" not in r:
                                loader.submit(r["img_path"])
                            sub += 1

                    items = []
                    for j in idxs:
                        pump()
                        rec = self.records[j]
                        if "image" in rec:
                            items.append(self[j])
                        else:
                            img, _rc = loader.next()
                            if img is None:  # sync retry path
                                img = self._read_image(rec["img_path"])
                            items.append(self._make_item(rec, img))
                        if len(items) == batch_size:
                            yield self.collate(items, testr_cfg)
                            items = []
                epoch += 1
        finally:
            if loader is not None:
                loader.destroy()


def make_synthetic_records(
    n: int,
    num_instances: int = 3,
    image_size: int = 512,
    num_ctrl_points: int = 16,
    seed: int = 0,
) -> List[Dict]:
    """In-memory synthetic SAMText-like records (random images + random text
    instances) for smoke tests and trainer rehearsals without data assets."""
    rng = np.random.default_rng(seed)
    words = ["OPEN", "SALE", "EXIT", "CAFE", "STOP", "taxi", "Hotel", "parking"]
    records = []
    for i in range(n):
        texts = [words[int(rng.integers(len(words)))] for _ in range(num_instances)]
        encs = np.stack([np.asarray(charset.encode(t), np.int32) for t in texts])
        cxy = rng.uniform(0.2, 0.8, (num_instances, 2))
        wh = rng.uniform(0.05, 0.2, (num_instances, 2))
        boxes = np.concatenate([cxy, wh], -1).astype(np.float32)
        polys = np.clip(
            cxy[:, None, :]
            + rng.uniform(-0.5, 0.5, (num_instances, num_ctrl_points, 2))
            * wh[:, None, :],
            0.0,
            1.0,
        ).astype(np.float32)
        records.append(
            {
                "img_path": f"<synthetic-{i}>",
                "img_id": f"synthetic_{i:04d}",
                "image": rng.uniform(0, 1, (image_size, image_size, 3)).astype(
                    np.float32
                ),
                "text": texts,
                "text_enc": encs,
                "bbox": boxes,
                "poly": polys,
                "hq_prompt": None,
            }
        )
    return records
