"""Native JPEG decode+resize pipeline (native/imgio.cpp via imgio.py).

The decode path must match the cv2 path it replaces in
data/satext.py:_read_image (cv2.imread -> RGB [0,1] -> cv2.resize
INTER_LINEAR): libjpeg IDCT output can differ from opencv's by a few
code-values, so image comparisons use a small uint8-scale tolerance.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def native_lib():
    r = subprocess.run(
        [sys.executable, "-m", "dit4sr_tpu.native.build"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    from dit4sr_tpu.native import imgio

    imgio._LIB = None  # force re-dlopen of the fresh .so
    assert imgio.imgio_available()
    return imgio


def _write_jpeg(path, h, w, seed=0, quality=95):
    rng = np.random.default_rng(seed)
    # smooth content so JPEG loss stays small and decoders agree closely
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            127 + 100 * np.sin(xx / 17 + seed) * np.cos(yy / 23),
            127 + 100 * np.cos(xx / 31) * np.sin(yy / 13 + seed),
            127 + 100 * np.sin((xx + yy) / 41),
        ],
        axis=-1,
    )
    img = np.clip(img + rng.normal(0, 3, (h, w, 3)), 0, 255).astype(np.uint8)
    ok = cv2.imwrite(path, img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return img


def _cv2_reference(path, out_hw):
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    if img.shape[:2] != out_hw:
        img = cv2.resize(img, (out_hw[1], out_hw[0]))
    return img


def test_probe(native_lib, tmp_path):
    p = str(tmp_path / "a.jpg")
    _write_jpeg(p, 123, 77)
    assert native_lib.probe_image(p) == (77, 123)
    assert native_lib.probe_image(str(tmp_path / "missing.jpg")) is None


@pytest.mark.parametrize("src_hw,out_hw", [
    ((512, 512), (512, 512)),   # no resize
    ((640, 480), (512, 512)),   # upscale one axis, downscale the other
    ((300, 700), (512, 512)),   # strong anisotropic resize
    ((512, 512), (128, 128)),   # downscale
])
def test_decode_matches_cv2(native_lib, tmp_path, src_hw, out_hw):
    p = str(tmp_path / f"img_{src_hw[0]}x{src_hw[1]}.jpg")
    _write_jpeg(p, *src_hw, seed=src_hw[0])
    got = native_lib.decode_image(p, out_hw)
    assert got is not None and got.shape == (*out_hw, 3)
    want = _cv2_reference(p, out_hw)
    # decoder IDCT differences are a couple of code-values at most
    assert np.abs(got - want).max() < 6.0 / 255.0
    assert np.abs(got - want).mean() < 1.0 / 255.0


def test_decode_failures_return_none(native_lib, tmp_path):
    assert native_lib.decode_image(str(tmp_path / "nope.jpg"), (64, 64)) is None
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8\xff" + b"garbage" * 100)
    assert native_lib.decode_image(str(bad), (64, 64)) is None
    png = tmp_path / "actually.png"
    cv2.imwrite(str(png), np.zeros((8, 8, 3), np.uint8))
    assert native_lib.decode_image(str(png), (64, 64)) is None


def test_loader_pipeline_order_and_errors(native_lib, tmp_path):
    paths, wants = [], []
    for i in range(7):
        p = str(tmp_path / f"seq_{i}.jpg")
        _write_jpeg(p, 96 + 8 * i, 80, seed=i)
        paths.append(p)
        wants.append(_cv2_reference(p, (64, 64)))
    paths.insert(3, str(tmp_path / "missing.jpg"))  # error mid-stream
    wants.insert(3, None)

    with native_lib.ImageLoader((64, 64), threads=2, capacity=3) as ld:
        results = []
        submitted = 0
        for k in range(len(paths)):
            while submitted < len(paths) and ld._pending < 3:
                ld.submit(paths[submitted])
                submitted += 1
            results.append(ld.next())
    for (img, rc), want in zip(results, wants):
        if want is None:
            assert img is None and rc != 0
        else:
            assert rc == 0
            assert np.abs(img - want).max() < 6.0 / 255.0


def test_dataset_uses_native_path(native_lib, tmp_path, monkeypatch):
    """SATextDataset._read_image and the pipelined iter_batches must produce
    the same batches as the synchronous cv2 path."""
    from dit4sr_tpu.data.satext import SATextDataset, make_synthetic_records

    records = make_synthetic_records(6, image_size=96)
    # move half the records to real JPEG files (mixed file/memory epoch)
    for i, rec in enumerate(records):
        if i % 2 == 0:
            p = str(tmp_path / f"rec_{i}.jpg")
            cv2.imwrite(
                p,
                (rec.pop("image")[..., ::-1] * 255).astype(np.uint8),
                [cv2.IMWRITE_JPEG_QUALITY, 98],
            )
            rec["img_path"] = p

    def batches(decode_ahead):
        ds = SATextDataset(
            [dict(r) for r in records], crop_size=96, seed=7,
            null_text_ratio=0.0,
        )
        return list(
            ds.iter_batches(
                batch_size=2, shuffle=True, epochs=1, decode_ahead=decode_ahead
            )
        )

    fast = batches(decode_ahead=4)
    slow = batches(decode_ahead=0)
    assert len(fast) == len(slow) == 3
    for bf, bs in zip(fast, slow):
        assert bf["img_id"] == bs["img_id"]
        assert np.abs(bf["gt"] - bs["gt"]).max() < 6.0 / 255.0
        np.testing.assert_allclose(bf["kernel1"], bs["kernel1"])


def test_exif_oriented_jpeg_falls_back_to_cv2(native_lib, tmp_path):
    """cv2.imread auto-applies EXIF orientation; the native decoder does not,
    so it must refuse oriented files (rc -4) and let callers fall back."""
    plain = str(tmp_path / "plain.jpg")
    _write_jpeg(plain, 40, 64, seed=3)
    raw = open(plain, "rb").read()

    # APP1 Exif segment with Orientation=6 (rotate 90 CW), little-endian TIFF
    tiff = (
        b"II" + b"\x2a\x00" + b"\x08\x00\x00\x00"          # header, IFD @ 8
        + b"\x01\x00"                                        # 1 entry
        + b"\x12\x01" + b"\x03\x00" + b"\x01\x00\x00\x00"   # tag 0x0112 SHORT x1
        + b"\x06\x00" + b"\x00\x00"                          # value 6
        + b"\x00\x00\x00\x00"                                # next IFD
    )
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    oriented = str(tmp_path / "oriented.jpg")
    open(oriented, "wb").write(raw[:2] + app1 + raw[2:])

    # un-oriented file still decodes natively; oriented one is refused
    assert native_lib.decode_image(plain, (32, 32)) is not None
    assert native_lib.decode_image(oriented, (32, 32)) is None

    # cv2 applies the rotation: the fallback path must deliver it
    ref = cv2.imread(oriented, cv2.IMREAD_COLOR)
    assert ref.shape[:2] == (64, 40)  # 40x64 rotated 90

    from dit4sr_tpu.data.satext import SATextDataset

    ds = SATextDataset(
        [{"img_path": oriented, "text": ["hi"],
          "boxes": np.zeros((1, 4), np.float32),
          "polygons": np.zeros((1, 16, 2), np.float32)}],
        crop_size=32,
    )
    got = ds._read_image(oriented)
    want = cv2.resize(
        cv2.cvtColor(ref, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0,
        (32, 32),
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
