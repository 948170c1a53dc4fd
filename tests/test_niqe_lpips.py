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


# ---------------------------------------------------------------------------
# parity vs the vendored basicsr NIQE (the reference's metric lineage)
# ---------------------------------------------------------------------------

_REF_BASICSR = "/root/reference/basicsr"


def _load_ref_niqe():
    """Load basicsr/metrics/niqe.py standalone as a numeric oracle (its
    package graph is stubbed; we validate against it, never import it into
    the framework)."""
    import importlib.util
    import sys
    import types

    def _mod(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        return m

    matlab = _mod("ref_matlab", f"{_REF_BASICSR}/utils/matlab_functions.py")
    color = _mod("ref_color", f"{_REF_BASICSR}/utils/color_util.py")

    pkg = types.ModuleType("basicsr")
    utils = types.ModuleType("basicsr.utils")
    utils.bgr2ycbcr = color.bgr2ycbcr
    mfun = types.ModuleType("basicsr.utils.matlab_functions")
    mfun.imresize = matlab.imresize
    reg = types.ModuleType("basicsr.utils.registry")

    class _Reg:
        def register(self, *a, **k):
            return lambda f: f

    reg.METRIC_REGISTRY = _Reg()
    metrics = types.ModuleType("basicsr.metrics")
    mods = {
        "basicsr": pkg,
        "basicsr.utils": utils,
        "basicsr.utils.matlab_functions": mfun,
        "basicsr.utils.registry": reg,
        "basicsr.metrics": metrics,
    }
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        sys.modules["basicsr.metrics.metric_util"] = _mod(
            "basicsr.metrics.metric_util", f"{_REF_BASICSR}/metrics/metric_util.py"
        )
        return _mod("ref_niqe", f"{_REF_BASICSR}/metrics/niqe.py"), matlab
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.mark.skipif(
    not niqe_available(), reason="reference basicsr checkout not present"
)
def test_matlab_imresize_parity():
    from dit4sr_tpu.eval.niqe import matlab_imresize

    _, matlab = _load_ref_niqe()
    img = np.random.default_rng(0).uniform(size=(96, 80)).astype(np.float64)
    mine = matlab_imresize(img, 0.5)
    theirs = matlab.imresize(img, 0.5, antialiasing=True)
    if hasattr(theirs, "numpy"):
        theirs = theirs.numpy()
    np.testing.assert_allclose(mine, theirs, atol=1e-6)


@pytest.mark.skipif(
    not niqe_available(), reason="reference basicsr checkout not present"
)
@pytest.mark.slow
def test_niqe_parity_vs_basicsr():
    """Value parity with the vendored basicsr calculate_niqe (which itself
    matches MATLAB R2021a to 1e-4; basicsr/metrics/niqe.py:150-156). basicsr
    uses ALL 96x96 blocks (no sharpness threshold) — so do we."""
    ref, _ = _load_ref_niqe()
    import cv2

    for seed in (1, 2):
        small = np.random.default_rng(seed).uniform(size=(16, 16, 3)).astype(np.float32)
        nat = cv2.resize(small, (288, 288), interpolation=cv2.INTER_CUBIC).clip(0, 1)
        v_ref = ref.calculate_niqe(
            (nat[..., ::-1] * 255.0).astype(np.float32),
            crop_border=0, input_order="HWC", convert_to="y",
        )
        v_mine = niqe(nat)
        assert abs(v_ref - v_mine) < 0.02, (v_ref, v_mine)
