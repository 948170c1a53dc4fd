"""Gate the committed serving-quality artifact (round-2 review, weak #1).

scripts/serving_quality_sweep.py measures the image-quality cost of every
approximate serving mode on the OCR probe's LEARNED checkpoint (real TPU);
its metrics.json is committed under artifacts/serving_quality/. These tests
pin that artifact so a regression in any serving mode (a quantization bug, a
cache-span change, a distill recipe break) shows up as a failing bound the
next time the sweep is re-run and committed.

The bounds are deliberately stated in dB deltas vs the sweep's own exact
pipeline on the same images — they transfer across probe retrains, unlike
absolute PSNR.
"""

import json
import os

import pytest

ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "serving_quality", "metrics.json",
)

# Loud-skip policy (round-3 review, weak #3: these gates were green-by-
# skipping for a full round). Default: skip when the artifact is absent —
# but with DIT4SR_REQUIRE_GATE_ARTIFACTS=1 (set by the end-of-round check,
# tools/check_gate_artifacts.py) a missing artifact is a FAILURE.
if os.environ.get("DIT4SR_REQUIRE_GATE_ARTIFACTS") and not os.path.exists(ART):
    pytest.fail(
        "DIT4SR_REQUIRE_GATE_ARTIFACTS=1 but artifacts/serving_quality/"
        "metrics.json is missing — run scripts/serving_quality_sweep.py on "
        "TPU and commit the artifact", pytrace=False,
    )
pytestmark = pytest.mark.skipif(
    not os.path.exists(ART),
    reason="serving-quality artifact not committed (run "
           "scripts/serving_quality_sweep.py on TPU)",
)


@pytest.fixture(scope="module")
def rows():
    with open(ART) as f:
        data = json.load(f)
    assert not data["config"]["smoke"], "committed artifact must be a real run"
    return {r["mode"]: r for r in data["rows"]}


def test_all_modes_present(rows):
    assert {"exact", "bf16", "w8a8", "cache2", "cache3", "w8a8_cache2",
            "w8a8_cache3", "steps7", "steps4"} <= set(rows)


def test_lossless_modes_stay_close_to_exact(rows):
    """bf16 is a dtype change, not an algorithmic approximation: it must
    track the exact output closely and cost (almost) nothing vs GT."""
    exact = rows["exact"]
    assert rows["bf16"]["psnr"] > exact["psnr"] - 0.3
    assert rows["bf16"]["crop_psnr"] > exact["crop_psnr"] - 0.3


def test_approximate_modes_bounded_degradation(rows):
    """The headline claim: the fast serving stack is usable. Every
    approximate mode stays within 1.0 dB full-image / 1.5 dB text-crop of
    exact on the learned model."""
    exact = rows["exact"]
    for mode in ("w8a8", "cache2", "cache3", "w8a8_cache2", "w8a8_cache3"):
        r = rows[mode]
        assert r["psnr"] > exact["psnr"] - 1.0, (mode, r["psnr"], exact["psnr"])
        assert r["crop_psnr"] > exact["crop_psnr"] - 1.5, mode
        assert r["ssim"] > exact["ssim"] - 0.04, mode


def test_distilled_beats_naive_step_cut(rows):
    """Distillation must earn its training cost ON ITS OWN OBJECTIVE:
    teacher fidelity. At matched step counts the student must reproduce the
    full-step teacher's output MORE faithfully (psnr_vs_exact) than naive
    schedule truncation does. GT-PSNR is deliberately only loosely bounded:
    at probe scale fewer steps can accidentally RAISE GT-PSNR (less
    hallucination, closer to the mean), so a successful student that
    matches its lower-GT-PSNR teacher moves AWAY from the naive row on that
    axis — r5 measured distill7 at +2.0 dB teacher fidelity over steps7
    while sitting 0.5 dB below it vs GT."""
    dist_rows = sorted(m for m in rows if m.startswith("distill"))
    if not dist_rows:
        with open(ART) as f:
            cfg = json.load(f)["config"]
        if not cfg.get("distilled", True):
            pytest.skip("sweep artifact was produced with --no_distill")
        raise AssertionError("sweep artifact has no distilled rows")
    # naive rows keyed by their actual step count (the 'steps4' row runs
    # max(14//4,1)=3 steps — match on steps, not on the label suffix)
    naive_by_steps = {rows[m]["steps"]: rows[m]
                      for m in rows if m.startswith("steps")}
    exact = rows["exact"]
    for dist in dist_rows:
        d = rows[dist]
        naive = naive_by_steps.get(d["steps"])
        if naive is None:
            continue
        assert d["psnr_vs_exact"] > naive["psnr_vs_exact"] + 0.5, (
            dist, d["psnr_vs_exact"], naive["psnr_vs_exact"])
        assert d["psnr"] > exact["psnr"] - 1.0, (dist, d["psnr"])
