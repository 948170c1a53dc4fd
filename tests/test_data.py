"""Data-layer tests: kernels, filter2d (torch oracle), DiffJPEG (libjpeg
oracle via cv2), noise ops, full degradation pipeline, charset, dataset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dit4sr_tpu.data import charset
from dit4sr_tpu.data.degradation import (
    DegradationParams,
    add_gaussian_noise,
    add_poisson_noise,
    filter2d,
    realesrgan_degradation,
    sample_params,
    usm_sharp,
)
from dit4sr_tpu.data.diffjpeg import jpeg_compress
from dit4sr_tpu.data.kernels import (
    bivariate_gaussian,
    circular_lowpass_kernel,
    sample_degradation_kernels,
)


def test_kernel_synthesis_normalized():
    rng = np.random.default_rng(0)
    for _ in range(20):
        k1, k2, sinc = sample_degradation_kernels(rng)
        assert k1.shape == k2.shape == sinc.shape == (21, 21)
        np.testing.assert_allclose(k1.sum(), 1.0, atol=1e-5)
        np.testing.assert_allclose(k2.sum(), 1.0, atol=1e-5)
        np.testing.assert_allclose(sinc.sum(), 1.0, atol=1e-4)


def test_gaussian_kernel_matches_cv2():
    import cv2

    k = bivariate_gaussian(21, 1.8, 1.8, 0.0, isotropic=True)
    g1 = cv2.getGaussianKernel(21, 1.8)
    ref = (g1 @ g1.T)
    np.testing.assert_allclose(k, ref, atol=1e-6)


def test_filter2d_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    B, H, W, C, k = 2, 16, 16, 3, 5
    img = rng.uniform(size=(B, H, W, C)).astype(np.float32)
    kern = rng.uniform(size=(B, k, k)).astype(np.float32)
    kern /= kern.sum(axis=(1, 2), keepdims=True)

    got = np.asarray(filter2d(jnp.asarray(img), jnp.asarray(kern)))

    # reference torch formulation (basicsr img_process_util.py:7-31)
    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    tk = torch.from_numpy(kern)
    t = F.pad(t, (k // 2,) * 4, mode="reflect")
    ph, pw = t.shape[-2:]
    t = t.reshape(1, B * C, ph, pw)
    tk2 = tk.view(B, 1, k, k).repeat(1, C, 1, 1).view(B * C, 1, k, k)
    ref = F.conv2d(t, tk2, groups=B * C).view(B, C, H, W).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_jpeg_matches_libjpeg():
    """Our DCT round-trip should land close to real libjpeg output."""
    import cv2

    rng = np.random.default_rng(0)
    # smooth-ish natural image: random low-freq pattern
    small = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    img = cv2.resize(small, (64, 64), interpolation=cv2.INTER_CUBIC).clip(0, 1)

    for q in (30, 60, 90):
        ok, enc = cv2.imencode(
            ".jpg", (img[..., ::-1] * 255).astype(np.uint8),
            [cv2.IMWRITE_JPEG_QUALITY, q],
        )
        ref = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1].astype(np.float32) / 255

        got = np.asarray(
            jpeg_compress(jnp.asarray(img[None]), jnp.asarray([float(q)]))
        )[0]
        mae_ref = np.abs(got - ref).mean()
        assert mae_ref < 0.02, f"q={q}: MAE vs libjpeg {mae_ref:.4f}"
        # and the compression must actually change the image at low quality
        if q == 30:
            assert np.abs(got - img).mean() > 1e-3


def test_noise_ops():
    rng = np.random.default_rng(0)
    # keep pixels away from [0,1] edges so clipping can't desync channels
    img = jnp.asarray(0.3 + 0.4 * rng.uniform(size=(2, 16, 16, 3)), jnp.float32)
    sigma = jnp.asarray([10.0, 20.0])
    gray = jnp.asarray([True, False])
    out = add_gaussian_noise(jax.random.PRNGKey(0), img, sigma, gray)
    assert out.shape == img.shape
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    # gray noise: per-pixel channel deltas identical
    delta = np.asarray(out - img)
    assert np.allclose(delta[0, :, :, 0], delta[0, :, :, 1], atol=1e-6)
    assert not np.allclose(delta[1, :, :, 0], delta[1, :, :, 1], atol=1e-6)

    pout = add_poisson_noise(
        jax.random.PRNGKey(1), img, jnp.asarray([1.0, 2.0]), gray
    )
    assert pout.shape == img.shape
    assert float(jnp.abs(pout - img).max()) > 0


def test_usm_sharpens_edges():
    img = np.zeros((1, 64, 64, 3), np.float32)
    img[:, :, 32:] = 1.0
    out = np.asarray(usm_sharp(jnp.asarray(img) * 0.8 + 0.1))
    assert out.shape == img.shape
    assert np.isfinite(out).all()


def test_full_degradation_pipeline():
    rng = np.random.default_rng(0)
    B, H = 2, 64
    gt = rng.uniform(size=(B, H, H, 3)).astype(np.float32)
    ks = [sample_degradation_kernels(rng) for _ in range(B)]
    kernels = tuple(np.stack([k[i] for k in ks]) for i in range(3))
    params = sample_params(rng, B, kernels)

    fn = jax.jit(lambda k, g, p: realesrgan_degradation(k, g, p))
    gt_out, lq = fn(jax.random.PRNGKey(0), jnp.asarray(gt), params)
    assert gt_out.shape == gt.shape
    assert lq.shape == gt.shape  # resized back to GT size
    assert float(lq.min()) >= 0 and float(lq.max()) <= 1
    # degradation must actually degrade
    assert float(jnp.abs(lq - gt_out).mean()) > 0.005


def test_charset_roundtrip():
    assert len(charset.CTLABELS) == 95
    for word in ["Hello", "a b-c!", "~"]:
        enc = charset.encode(word)
        assert len(enc) == 25
        assert charset.decode(enc) == word
    assert not charset.is_valid_word("café")
    assert not charset.is_valid_word("x" * 26)


def test_satext_loader(tmp_path):
    import cv2
    import json

    from dit4sr_tpu.config import testr_tiny as make_cfg
    from dit4sr_tpu.data.satext import SATextDataset, load_samtext_annotations

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    anns = {}
    rng = np.random.default_rng(0)
    for i in range(3):
        img_id = f"img{i:03d}"
        cv2.imwrite(
            str(img_dir / f"{img_id}.jpg"),
            (rng.uniform(size=(512, 512, 3)) * 255).astype(np.uint8),
        )
        anns[img_id] = {
            "0": {
                "text_instances": [
                    {
                        "text": "STOP",
                        "bbox": [100, 100, 200, 150],
                        "polygon": [[100 + 6 * j, 100 + (j % 2) * 50] for j in range(16)],
                    },
                    {"text": "café", "bbox": [0, 0, 10, 10],
                     "polygon": [[0, 0]] * 16},  # filtered (non-ascii)
                ]
            }
        }
    ann_path = tmp_path / "dataset.json"
    ann_path.write_text(json.dumps(anns))

    records = load_samtext_annotations(str(ann_path), str(img_dir))
    assert len(records) == 3
    assert records[0]["text"] == ["STOP"]
    assert records[0]["bbox"].shape == (1, 4)
    assert records[0]["poly"].shape == (1, 16, 2)

    cfg = make_cfg(num_ctrl_points=16, max_text_len=25)
    ds = SATextDataset(records, null_text_ratio=0.0)
    batch = ds.collate([ds[0], ds[1]], cfg)
    assert batch["gt"].shape == (2, 512, 512, 3)
    assert batch["kernel1"].shape == (2, 21, 21)
    assert batch["ocr_targets"].valid.shape == (2, cfg.max_instances)
    assert bool(batch["ocr_targets"].valid[0, 0])
    assert "STOP" in batch["prompt"][0]
