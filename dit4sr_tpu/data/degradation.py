"""Real-ESRGAN two-stage degradation pipeline on device (JAX).

Rebuild of the reference's GPU-side degradation (dataloaders/utils.py:
339-509 + basicsr noise/USM ops) as one jitted function. Host code samples
the per-batch randomness into a `DegradationParams` pytree (mirroring the
reference, which draws Python RNG on host every step); the device program is
then fully static.

TPU adaptations (documented divergences from the CUDA reference):
  * random-scale resizes run over a quantized scale ladder via `lax.switch`
    (XLA needs static shapes); each branch resamples through the static
    intermediate size and returns at a canonical resolution, so the
    information loss of down-up resampling is preserved while noise/JPEG
    apply at the canonical size rather than the random intermediate one;
  * 'area' resize mode maps to linear+antialias (exact for integer factors);
  * Poisson noise uses vals=256 (the reference rounds to 8-bit first, making
    unique-value counts ~256 for natural images; basicsr degradations.py
    computes 2^ceil(log2(unique))).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.data.diffjpeg import jpeg_compress
from dit4sr_tpu.data.kernels import gaussian_blur_kernel

RESIZE1_SCALES: Tuple[float, ...] = (0.15, 0.3, 0.5, 0.7, 0.85, 1.0, 1.15, 1.3, 1.5)
RESIZE2_SCALES: Tuple[float, ...] = (0.3, 0.5, 0.7, 0.85, 1.0, 1.1, 1.2)


class DegradationParams(NamedTuple):
    """Host-sampled randomness for one batch (see `sample_params`)."""

    kernel1: jnp.ndarray        # (B, 21, 21)
    kernel2: jnp.ndarray        # (B, 21, 21)
    sinc_kernel: jnp.ndarray    # (B, 21, 21)
    resize1_idx: jnp.ndarray    # () int32 into RESIZE1_SCALES
    resize1_mode: jnp.ndarray   # () int32: 0 area, 1 bilinear, 2 bicubic
    use_gaussian1: jnp.ndarray  # () bool
    noise_sigma1: jnp.ndarray   # (B,) in [1, 30]
    poisson_scale1: jnp.ndarray  # (B,)
    gray_noise1: jnp.ndarray    # (B,) bool
    jpeg_q1: jnp.ndarray        # (B,) in [30, 95]
    use_blur2: jnp.ndarray      # () bool
    resize2_idx: jnp.ndarray    # () int32 into RESIZE2_SCALES
    resize2_mode: jnp.ndarray   # () int32
    use_gaussian2: jnp.ndarray  # () bool
    noise_sigma2: jnp.ndarray   # (B,)
    poisson_scale2: jnp.ndarray  # (B,)
    gray_noise2: jnp.ndarray    # (B,) bool
    jpeg_q2: jnp.ndarray        # (B,)
    final_mode: jnp.ndarray     # () int32 resize-back mode
    jpeg_first: jnp.ndarray     # () bool: order of [jpeg] vs [resize+sinc]


def sample_params(rng: np.random.Generator, batch: int, kernels) -> DegradationParams:
    """Draw the reference's degradation randomness
    (dataloaders/utils.py:343-365,382-491). `kernels` = (k1, k2, sinc) each
    (B, 21, 21) from data.kernels.sample_degradation_kernels."""

    def updown(probs, lo, hi, ladder):
        t = rng.choice(3, p=probs)  # 0 up, 1 down, 2 keep
        if t == 0:
            s = rng.uniform(1.0, hi)
        elif t == 1:
            s = rng.uniform(lo, 1.0)
        else:
            s = 1.0
        return int(np.argmin(np.abs(np.asarray(ladder) - s)))

    k1, k2, sinc = kernels
    return DegradationParams(
        kernel1=jnp.asarray(k1),
        kernel2=jnp.asarray(k2),
        sinc_kernel=jnp.asarray(sinc),
        resize1_idx=jnp.int32(updown([0.2, 0.7, 0.1], 0.15, 1.5, RESIZE1_SCALES)),
        resize1_mode=jnp.int32(rng.integers(0, 3)),
        use_gaussian1=jnp.bool_(rng.uniform() < 0.5),
        noise_sigma1=jnp.asarray(rng.uniform(1, 30, batch), jnp.float32),
        poisson_scale1=jnp.asarray(rng.uniform(0.05, 3.0, batch), jnp.float32),
        gray_noise1=jnp.asarray(rng.uniform(size=batch) < 0.4),
        jpeg_q1=jnp.asarray(rng.uniform(30, 95, batch), jnp.float32),
        use_blur2=jnp.bool_(rng.uniform() < 0.8),
        resize2_idx=jnp.int32(updown([0.3, 0.4, 0.3], 0.3, 1.2, RESIZE2_SCALES)),
        resize2_mode=jnp.int32(rng.integers(0, 3)),
        use_gaussian2=jnp.bool_(rng.uniform() < 0.5),
        noise_sigma2=jnp.asarray(rng.uniform(1, 25, batch), jnp.float32),
        poisson_scale2=jnp.asarray(rng.uniform(0.05, 2.5, batch), jnp.float32),
        gray_noise2=jnp.asarray(rng.uniform(size=batch) < 0.4),
        jpeg_q2=jnp.asarray(rng.uniform(30, 95, batch), jnp.float32),
        final_mode=jnp.int32(rng.integers(0, 3)),
        jpeg_first=jnp.bool_(rng.uniform() < 0.5),
    )


def mild_params(rng: np.random.Generator, batch: int, kernels=None, *,
                blur_sigma: float = 0.0, noise_sigma: float = 2.0,
                jpeg_q: float = 95.0, noise_sigma2: float = 1.0,
                jpeg_q2: float = 95.0) -> DegradationParams:
    """A deterministic MILD draw for the self-contained quality probe
    (scripts/quality_probe.py): no second blur, fixed JPEG quality and
    gaussian noise — on top of the intrinsic x4 down-up of stage 2
    (`realesrgan_degradation` lands at H/sf). Small models can learn to
    invert this in minutes, giving an end-to-end quality signal without
    weight assets. Same (rng, batch, kernels) positional signature as
    `sample_params` so Trainer.fit can take either; the keyword knobs
    (per-stage gaussian blur sigma / noise sigma / JPEG quality — bind
    with functools.partial) set the degradation strength. The defaults
    (delta kernel, sigma 2 noise, q95) leave the LQ within ~0.2 dB of a
    small VAE's reconstruction ceiling, which makes a PSNR-vs-LQ gate
    unwinnable — the probe binds stronger values. Stage-2 noise is the
    effective lever on 256px text scenes (stage-1 noise is averaged away
    by the final down-up resample): noise_sigma2=15 alone drops LQ from
    30.7 to 26.7 dB."""
    del rng, kernels
    if blur_sigma > 0:
        k1 = gaussian_blur_kernel(21, blur_sigma)
    else:
        k1 = np.zeros((21, 21), np.float32)
        k1[10, 10] = 1.0
    delta = np.zeros((21, 21), np.float32)
    delta[10, 10] = 1.0
    k = jnp.broadcast_to(jnp.asarray(delta), (batch, 21, 21))

    def full(v):
        return jnp.full((batch,), v, jnp.float32)

    return DegradationParams(
        kernel1=jnp.broadcast_to(jnp.asarray(k1), (batch, 21, 21)),
        kernel2=k,
        sinc_kernel=k,
        resize1_idx=jnp.int32(RESIZE1_SCALES.index(1.0)),
        resize1_mode=jnp.int32(2),
        use_gaussian1=jnp.bool_(True),
        noise_sigma1=full(noise_sigma),
        poisson_scale1=full(0.05),
        gray_noise1=jnp.zeros((batch,), bool),
        jpeg_q1=full(jpeg_q),
        use_blur2=jnp.bool_(False),
        resize2_idx=jnp.int32(RESIZE2_SCALES.index(1.0)),
        resize2_mode=jnp.int32(2),
        use_gaussian2=jnp.bool_(True),
        noise_sigma2=full(noise_sigma2),
        poisson_scale2=full(0.05),
        gray_noise2=jnp.zeros((batch,), bool),
        jpeg_q2=full(jpeg_q2),
        final_mode=jnp.int32(2),
        jpeg_first=jnp.bool_(False),
    )


# ---------------------------------------------------------------------------
# primitive ops
# ---------------------------------------------------------------------------


def filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Per-sample 2D filtering with reflect padding (basicsr
    img_process_util.py:7-31). img NHWC, kernel (B, k, k)."""
    b, h, w, c = img.shape
    k = kernel.shape[-1]
    p = k // 2
    x = jnp.pad(img, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    # fold batch into channels for a single grouped conv
    x = x.transpose(1, 2, 0, 3).reshape(1, h + 2 * p, w + 2 * p, b * c)
    kern = kernel.transpose(1, 2, 0)[:, :, :, None]            # (k, k, B, 1)
    kern = jnp.tile(kern, (1, 1, 1, c)).reshape(k, k, 1, b * c)
    out = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
    )
    return out.reshape(h, w, b, c).transpose(2, 0, 1, 3)


_USM_KERNEL = gaussian_blur_kernel(51)


def usm_sharp(img: jnp.ndarray, weight: float = 0.5, threshold: float = 10.0):
    """USM sharpening (basicsr img_process_util.py:34-83). img NHWC [0,1]."""
    b = img.shape[0]
    kern = jnp.broadcast_to(jnp.asarray(_USM_KERNEL), (b, 51, 51))
    blur = filter2d(img, kern)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2d(mask, kern)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img


def _resize(img: jnp.ndarray, size: Tuple[int, int], mode: jnp.ndarray):
    """Mode-switched resize: 0 area(~linear+aa), 1 bilinear, 2 bicubic."""
    b, _, _, c = img.shape
    shape = (b, size[0], size[1], c)
    return jax.lax.switch(
        mode,
        [
            lambda x: jax.image.resize(x, shape, "linear", antialias=True),
            lambda x: jax.image.resize(x, shape, "linear", antialias=False),
            lambda x: jax.image.resize(x, shape, "cubic", antialias=False),
        ],
        img,
    )


def _ladder_resample(img, scale_ladder, idx, mode, out_hw):
    """Resample through ladder[idx]'s static intermediate size, landing at
    out_hw. The down-up information loss of the reference's random-scale
    resize is preserved; shapes stay static per branch."""
    h, w = img.shape[1], img.shape[2]

    def branch(s):
        ih, iw = max(8, int(round(h * s))), max(8, int(round(w * s)))

        def run(x):
            y = _resize(x, (ih, iw), mode)
            if (ih, iw) == tuple(out_hw):
                return y
            return _resize(y, tuple(out_hw), mode)

        return run

    return jax.lax.switch(idx, [branch(s) for s in scale_ladder], img)


def _rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.einsum("bhwc,c->bhw", img, w)[..., None]


def add_gaussian_noise(key, img, sigma, gray):
    """random_add_gaussian_noise_pt (basicsr degradations.py): per-sample
    sigma/255, per-sample gray/color choice, clip to [0,1]."""
    b, h, w, c = img.shape
    k1, k2 = jax.random.split(key)
    s = (sigma / 255.0)[:, None, None, None]
    rgb_noise = jax.random.normal(k1, img.shape, img.dtype) * s
    gray_noise = jax.random.normal(k2, (b, h, w, 1), img.dtype) * s
    noise = jnp.where(gray[:, None, None, None], gray_noise, rgb_noise)
    return jnp.clip(img + noise, 0.0, 1.0)


def add_poisson_noise(key, img, scale, gray, vals: float = 256.0):
    """random_add_poisson_noise_pt with vals=256 (see module docstring)."""
    b = img.shape[0]
    k1, k2 = jax.random.split(key)
    img8 = jnp.clip(jnp.round(img * 255.0), 0, 255) / 255.0
    rgb = jax.random.poisson(k1, img8 * vals).astype(img.dtype) / vals - img8
    g8 = jnp.clip(jnp.round(_rgb_to_gray(img) * 255.0), 0, 255) / 255.0
    gn = jax.random.poisson(k2, g8 * vals).astype(img.dtype) / vals - g8
    noise = jnp.where(gray[:, None, None, None], gn, rgb)
    out = img + noise * scale[:, None, None, None]
    return jnp.clip(out, 0.0, 1.0)


def _noise_stage(key, img, use_gaussian, sigma, pscale, gray):
    return jax.lax.cond(
        use_gaussian,
        lambda x: add_gaussian_noise(key, x, sigma, gray),
        lambda x: add_poisson_noise(key, x, pscale, gray),
        img,
    )


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------


def realesrgan_degradation(
    key: jax.Array,
    gt: jnp.ndarray,               # (B, H, W, 3) in [0,1], NHWC
    params: DegradationParams,
    sf: int = 4,
    use_usm: bool = True,
    resize_lq: bool = True,
):
    """Returns (gt_usm, lq). lq is bicubic-resized back to GT size when
    resize_lq (dataloaders/utils.py:502)."""
    h, w = gt.shape[1], gt.shape[2]
    k1, k2, k3 = jax.random.split(key, 3)

    gt_out = usm_sharp(gt) if use_usm else gt

    # ---- stage 1 (at full resolution canvas) ----
    out = filter2d(gt_out, params.kernel1)
    out = _ladder_resample(
        out, RESIZE1_SCALES, params.resize1_idx, params.resize1_mode, (h, w)
    )
    out = _noise_stage(
        k1, out, params.use_gaussian1, params.noise_sigma1,
        params.poisson_scale1, params.gray_noise1,
    )
    out = jpeg_compress(jnp.clip(out, 0.0, 1.0), params.jpeg_q1)

    # ---- stage 2 (lands at H/sf canvas) ----
    out = jax.lax.cond(
        params.use_blur2, lambda x: filter2d(x, params.kernel2), lambda x: x, out
    )
    out = _ladder_resample(
        out, RESIZE2_SCALES, params.resize2_idx, params.resize2_mode,
        (h // sf, w // sf),
    )
    out = _noise_stage(
        k2, out, params.use_gaussian2, params.noise_sigma2,
        params.poisson_scale2, params.gray_noise2,
    )

    # random order of [sinc] vs [jpeg] at the final low-res canvas
    def sinc_then_jpeg(x):
        x = filter2d(x, params.sinc_kernel)
        return jpeg_compress(jnp.clip(x, 0.0, 1.0), params.jpeg_q2)

    def jpeg_then_sinc(x):
        x = jpeg_compress(jnp.clip(x, 0.0, 1.0), params.jpeg_q2)
        return filter2d(x, params.sinc_kernel)

    out = jax.lax.cond(params.jpeg_first, jpeg_then_sinc, sinc_then_jpeg, out)
    lq = jnp.clip(out, 0.0, 1.0)

    if resize_lq:
        lq = jnp.clip(
            jax.image.resize(lq, gt.shape, "cubic", antialias=False), 0.0, 1.0
        )
    return jnp.clip(gt_out, 0.0, 1.0), lq
