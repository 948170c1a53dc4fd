"""Visualization artifacts: OCR overlays and side-by-side mosaics.

Rebuild of the reference's result dumps (test/test.py:558-616 OCR overlay
mosaics; pho_vis_realtext.py side-by-side comparisons).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    # np.asarray(jnp_array) yields read-only buffers; cv2 draws in place,
    # so always produce a fresh contiguous writable array
    return np.ascontiguousarray(
        (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    )


def draw_ocr_overlay(
    image: np.ndarray,                 # (H, W, 3) [0,1]
    polygons: np.ndarray,              # (K, Np, 2) absolute pixel coords
    texts: Sequence[str],
    scores: Optional[Sequence[float]] = None,
    keep: Optional[Sequence[bool]] = None,
) -> np.ndarray:
    """Polygon + recognized-text overlay (test/test.py:558-616)."""
    import cv2

    canvas = _to_u8(image).copy()
    for k in range(len(polygons)):
        if keep is not None and not keep[k]:
            continue
        poly = polygons[k].astype(np.int32)
        cv2.polylines(canvas, [poly], True, (0, 255, 0), 2)
        label = texts[k] if k < len(texts) else ""
        if scores is not None:
            label = f"{label} {scores[k]:.2f}"
        x, y = int(poly[:, 0].min()), max(12, int(poly[:, 1].min()) - 4)
        cv2.putText(canvas, label, (x, y), cv2.FONT_HERSHEY_SIMPLEX, 0.45,
                    (0, 255, 0), 1)
    return canvas


def side_by_side(
    images: List[np.ndarray], labels: Optional[List[str]] = None, pad: int = 4
) -> np.ndarray:
    """Horizontal mosaic of [0,1] images with optional labels
    (pho_vis_realtext.py equivalent)."""
    import cv2

    h = max(im.shape[0] for im in images)
    panels = []
    for i, im in enumerate(images):
        u8 = _to_u8(im)
        if u8.shape[0] != h:
            s = h / u8.shape[0]
            u8 = cv2.resize(u8, (int(u8.shape[1] * s), h))
        if labels and i < len(labels):
            cv2.putText(u8, labels[i], (6, 18), cv2.FONT_HERSHEY_SIMPLEX, 0.55,
                        (255, 255, 0), 1)
        panels.append(u8)
        if i < len(images) - 1:
            panels.append(np.full((h, pad, 3), 255, np.uint8))
    return np.concatenate(panels, axis=1)


def render_text_image(
    lines, img_width: int = 1000, font_size: int = 16, padding: int = 10
) -> np.ndarray:
    """Render text lines to an RGB uint8 image (the reference's
    text_file_to_image, train/train_utils.py:210-248)."""
    from PIL import Image, ImageDraw, ImageFont

    if isinstance(lines, str):
        lines = lines.splitlines() or [""]
    font = ImageFont.load_default()
    height = font_size * len(lines) + 2 * padding
    img = Image.new("RGB", (img_width, height), color="white")
    draw = ImageDraw.Draw(img)
    y = padding
    for line in lines:
        draw.text((padding, y), line.strip(), fill="black", font=font)
        y += font_size
    return np.asarray(img)
