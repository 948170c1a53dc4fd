"""NIQE + LPIPS metric tests."""

import numpy as np
import pytest

from dit4sr_tpu.eval.niqe import estimate_aggd, niqe, niqe_available


def _natural(seed=0, size=192):
    import cv2

    rng = np.random.default_rng(seed)
    small = rng.uniform(size=(12, 12, 3)).astype(np.float32)
    return cv2.resize(small, (size, size), interpolation=cv2.INTER_CUBIC).clip(0, 1)


def test_aggd_recovers_gaussian():
    """For standard-normal data the AGGD alpha must be ~2 and symmetric."""
    rng = np.random.default_rng(0)
    alpha, bl, br = estimate_aggd(rng.normal(size=100_000))
    assert 1.8 < alpha < 2.2
    assert abs(bl - br) < 0.05


@pytest.mark.skipif(not niqe_available(), reason="pristine params not present")
def test_niqe_prefers_clean():
    rng = np.random.default_rng(1)
    nat = _natural()
    noisy = np.clip(nat + 0.3 * rng.normal(size=nat.shape), 0, 1).astype(np.float32)
    n_nat, n_noisy = niqe(nat), niqe(noisy)
    assert np.isfinite(n_nat) and np.isfinite(n_noisy)
    assert n_noisy > n_nat


def test_lpips_structure():
    import jax.numpy as jnp

    from dit4sr_tpu.eval.lpips import lpips_distance, random_lpips_params

    rng = np.random.default_rng(0)
    params = {k: jnp.asarray(v) for k, v in random_lpips_params(rng).items()}
    a = jnp.asarray(_natural(2, 64)[None])
    same = lpips_distance(params, a, a)
    np.testing.assert_allclose(np.asarray(same), 0.0, atol=1e-6)

    noisy = jnp.clip(a + 0.2 * jnp.asarray(rng.normal(size=a.shape), jnp.float32), 0, 1)
    noisier = jnp.clip(a + 0.5 * jnp.asarray(rng.normal(size=a.shape), jnp.float32), 0, 1)
    d1 = float(lpips_distance(params, a, noisy)[0])
    d2 = float(lpips_distance(params, a, noisier)[0])
    assert 0 < d1 < d2


def test_lpips_converter_layout():
    """Converter accepts the official lpips package key layout."""
    from dit4sr_tpu.eval.lpips import _ALEX, convert_lpips_torch

    rng = np.random.default_rng(0)
    sd = {}
    cin = 3
    slices = [(1, [0]), (2, [3]), (3, [6]), (4, [8]), (5, [10])]
    for (slice_i, idxs), (cout, k, _, _) in zip(slices, _ALEX):
        for idx in idxs:
            sd[f"net.slice{slice_i}.{idx}.weight"] = rng.normal(
                size=(cout, cin, k, k)
            ).astype(np.float32)
            sd[f"net.slice{slice_i}.{idx}.bias"] = np.zeros((cout,), np.float32)
        cin = cout
    for i, c in enumerate([64, 192, 384, 256, 256]):
        sd[f"lin{i}.model.1.weight"] = rng.uniform(size=(1, c, 1, 1)).astype(np.float32)

    params = convert_lpips_torch(sd)
    assert params["conv0_w"].shape == (11, 11, 3, 64)
    assert params["lin4_w"].shape == (256,)
    assert (params["lin0_w"] >= 0).all()
