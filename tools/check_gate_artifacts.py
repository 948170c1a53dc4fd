"""End-of-round gate-artifact check (round-3 review, weak #2/#3).

Two failure classes this guards against, both of which happened in round 3:
  1. gate tests that silently skip because their artifact was never produced
     (tests/test_serving_quality.py skipped green for a full round);
  2. TPU evidence stranded in the work tree — the round-3 OCR probe FAILED
     and the failing metrics.json sat untracked while the round closed.

Usage: python tools/check_gate_artifacts.py   # exit 0 = clean, 1 = problems
Run before the end-of-round commit; also wired as the
DIT4SR_REQUIRE_GATE_ARTIFACTS=1 escalation in the gate tests themselves.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (artifact, producing command, gating consumer)
GATES = [
    (
        "artifacts/quality_probe_ocr/metrics.json",
        "python scripts/quality_probe_ocr.py",
        "probe PASS gate (text-aware loop demonstrated learning)",
    ),
    (
        "artifacts/serving_quality/metrics.json",
        "python scripts/serving_quality_sweep.py",
        "tests/test_serving_quality.py dB-delta bounds",
    ),
    (
        "artifacts/quality_probe/metrics.json",
        "python scripts/quality_probe.py",
        "stage-1 probe PASS gate",
    ),
    (
        "artifacts/tiled_vae_validation.json",
        "python tools/validate_tiled_vae.py",
        "gn_sync tiled-VAE seam validation",
    ),
]

problems = []

for art, cmd, consumer in GATES:
    path = os.path.join(REPO, art)
    if not os.path.exists(path):
        problems.append(f"MISSING {art} — produce with `{cmd}` ({consumer})")
        continue
    try:
        with open(path) as f:
            data = json.load(f)
    except Exception as e:
        problems.append(f"UNREADABLE {art}: {e}")
        continue
    cfg = data.get("config", {})
    if cfg.get("smoke"):
        problems.append(f"SMOKE-ONLY {art} — rerun `{cmd}` without --smoke")

# stranded evidence: any untracked or modified file under artifacts/
st = subprocess.run(
    ["git", "status", "--porcelain", "--", "artifacts"],
    cwd=REPO, capture_output=True, text=True,
)
dirty = [l for l in st.stdout.splitlines() if l.strip()]
if dirty:
    problems.append(
        "UNCOMMITTED artifacts (round-3 stranded-evidence hazard):\n  "
        + "\n  ".join(dirty)
    )

if problems:
    print("gate-artifact check FAILED:")
    for p in problems:
        print(f"- {p}")
    sys.exit(1)
print(f"gate-artifact check ok: {len(GATES)} artifacts present, none smoke, "
      "none stranded")
