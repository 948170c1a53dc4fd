"""OCR supervision derived from the synthetic scene generator, the
word-compositional hash encoder, and the dictionary snap — the zero-asset
building blocks of the stage-2/3 quality probe (scripts/quality_probe_ocr.py)."""

import numpy as np
import pytest

from dit4sr_tpu.data import charset
from dit4sr_tpu.data.textscenes import (
    WORDS,
    instances_to_ocr_raw,
    make_scene_records,
)
from dit4sr_tpu.text.dictionary import edit_distance, snap_word, snap_words


def test_scene_records_carry_instances_with_valid_boxes():
    recs = make_scene_records(4, size=128, seed=0)
    for r in recs:
        assert len(r["instances"]) == 3
        assert r["text"] == [i["word"] for i in r["instances"]]
        for inst in r["instances"]:
            x0, y0, x1, y1 = inst["bbox"]
            assert 0 <= x0 < x1 <= 128
            assert 0 <= y0 < y1 <= 128
            assert inst["word"] in WORDS


def test_text_pixels_differ_inside_bbox():
    """The bbox must actually cover the pasted word: re-render the same
    scene without that word is unavailable, so instead check the region has
    non-background variance typical of glyph edges (background is smooth)."""
    recs = make_scene_records(2, size=128, seed=3, rotate_prob=0.0)
    for r in recs:
        img = r["image"]
        for inst in r["instances"]:
            x0, y0, x1, y1 = (int(v) for v in inst["bbox"])
            crop = img[y0:y1, x0:x1]
            # glyph edges create local gradients far above the smooth bg
            gy = np.abs(np.diff(crop, axis=0)).max() if crop.shape[0] > 1 else 0
            assert gy > 0.05, inst


def test_instances_to_ocr_raw_shapes_and_normalization():
    recs = make_scene_records(1, size=256, seed=1)
    raw = instances_to_ocr_raw(recs[0]["instances"], 256, 8, 12)
    n = len(recs[0]["instances"])
    assert raw["labels"].shape == (n,)
    assert raw["boxes"].shape == (n, 4)
    assert raw["ctrl_points"].shape == (n, 8, 2)
    assert raw["texts"].shape == (n, 12)
    assert (raw["boxes"] >= 0).all() and (raw["boxes"] <= 1).all()
    assert (raw["ctrl_points"] >= 0).all() and (raw["ctrl_points"] <= 1).all()
    # cxcywh consistent with ctrl point extremes (top/bottom edges)
    for i in range(n):
        cx, cy, w, h = raw["boxes"][i]
        pts = raw["ctrl_points"][i]
        assert pts[:, 0].min() == pytest.approx(cx - w / 2, abs=1e-5)
        assert pts[:, 0].max() == pytest.approx(cx + w / 2, abs=1e-5)
        assert pts[:, 1].min() == pytest.approx(cy - h / 2, abs=1e-5)
        assert pts[:, 1].max() == pytest.approx(cy + h / 2, abs=1e-5)
        # text decodes back to the word (truncated to max_text_len)
        word = recs[0]["instances"][i]["word"]
        assert charset.decode(raw["texts"][i]) == word[:12]


def test_pad_targets_consumes_scene_raw():
    from dit4sr_tpu.config import testr_tiny
    from dit4sr_tpu.models.testr.detector import pad_targets

    cfg = testr_tiny()
    recs = make_scene_records(2, size=64, seed=2)
    raw = [
        instances_to_ocr_raw(r["instances"], 64, cfg.num_ctrl_points,
                             cfg.max_text_len)
        for r in recs
    ]
    t = pad_targets(raw, cfg)
    assert t.valid.shape == (2, cfg.max_instances)
    # 3 words per scene but max_instances=4: first 3 valid
    assert t.valid[:, :3].all() and not t.valid[:, 3:].any()


def test_edit_distance_and_snap():
    assert edit_distance("OPEN", "OPEN") == 0
    assert edit_distance("OPFN", "OPEN") == 1
    assert edit_distance("kitten", "sitting") == 3
    assert snap_word("OPFN", WORDS) == "OPEN"
    assert snap_word("0PEN", WORDS) == "OPEN"
    assert snap_word("zzzzzz", WORDS) is None
    assert snap_word("x", WORDS) is None          # below min_len
    # case-insensitive match returns canonical casing
    assert snap_word("hotel", WORDS) == "Hotel"
    assert snap_words(["OPFN", "OPEN", "qq"], WORDS) == ["OPEN"]


def test_word_hash_encoder_compositional():
    import jax.numpy as jnp

    from dit4sr_tpu.text.encoders import WordHashTextEncoder

    enc = WordHashTextEncoder(seq_len=16, joint_dim=32, pooled_dim=8,
                              tokens_per_word=4)
    a, pa = enc(['"OPEN", "SALE".'])
    b, pb = enc(['The image features the texts "OPEN" that appear clearly.'])
    n, pn = enc([""])
    # the OPEN rows are identical wherever the word appears
    assert jnp.allclose(a[0, :4], b[0, :4])
    # SALE occupies the next slot group and differs from OPEN
    assert not jnp.allclose(a[0, 4:8], a[0, :4])
    # null prompt -> all-zero embeddings (stable learned-null)
    assert jnp.all(n == 0) and jnp.all(pn == 0)
    # unused slots zero
    assert jnp.all(a[0, 8:] == 0)
