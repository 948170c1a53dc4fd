"""Offline TSM vote/threshold calibration from saved spotter logs.

scripts/quality_probe_ocr.py dumps the guided sampler's per-step raw
spotter outputs (scores/recs/keep) as NPZ (`calib_spot_log.npz` from the
held-IN calibration pass, `eval_spot_log.npz` from the held-out eval pass).
This tool replays those logs through the voting logic for a grid of
(keep threshold, vote_frac, vote_topk, vote weighting) WITHOUT touching the
TPU, picks the best configuration on the calib scenes, and reports what
that locked configuration scores on the eval log.

Caveat (documented, accepted): the replay is open-loop — in the live
sampler the belief rewrites the prompt, which changes later features and
reads. The tuner is for PICKING hyperparameters on held-in data; the
committed gate number must come from a real `--eval_only` run with the
chosen values baked in.

Usage: python tools/tune_tsm_vote.py [--probe_dir artifacts/quality_probe_ocr]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts"))


def replay_vote(scores, recs, gt_words_list, vocab, th, vote_frac, topk,
                weight):
    """scores (S,B,K), recs (S,B,K,Nw) -> mean word F1 of the final belief.
    weight: 'count' (1/step) or 'score' (max query score for the word)."""
    from quality_probe_ocr import word_prf
    from dit4sr_tpu.data import charset
    from dit4sr_tpu.text.dictionary import snap_words

    S, B, K = scores.shape
    f1s, beliefs = [], []
    for b in range(B):
        counts, weights, order = {}, {}, {}
        for s in range(S):
            kept = np.nonzero(scores[s, b] >= th)[0]
            step_words = {}
            for k in kept:
                w = charset.decode(recs[s, b, k])
                if not w:
                    continue
                snapped = snap_words([w], vocab)
                if not snapped:
                    continue
                sw = snapped[0]
                wgt = 1.0 if weight == "count" else float(scores[s, b, k])
                step_words[sw] = max(step_words.get(sw, 0.0), wgt)
            for sw, wgt in step_words.items():
                counts[sw] = counts.get(sw, 0) + 1
                weights[sw] = weights.get(sw, 0.0) + wgt
                order.setdefault(sw, len(order))
        # count-based admission (a word must recur), weight-based ranking
        # (with 'score', confident reads outrank equally-frequent noise)
        need = max(1.0, vote_frac * S)
        belief = [w for w, _ in sorted(weights.items(),
                                       key=lambda kv: (-kv[1], order[kv[0]]))
                  if counts[w] >= need]
        if topk is not None:
            belief = belief[:topk]
        beliefs.append(belief)
        f1s.append(word_prf(belief, gt_words_list[b])[2])
    return float(np.mean(f1s)), beliefs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe_dir", default="artifacts/quality_probe_ocr")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--calib_scenes", type=int, default=16)
    ap.add_argument("--n_eval", type=int, default=16)
    ap.add_argument("--out", default="artifacts/tsm_vote_tuning.json")
    args = ap.parse_args()

    from dit4sr_tpu.data.textscenes import WORDS, make_scene_records

    # prefix-deterministic: make_scene_records draws records sequentially
    # from one default_rng(seed), so the first N match the probe's sets
    calib = make_scene_records(args.calib_scenes, size=args.image_size,
                               seed=1, min_scale=2.0, max_scale=4.5)
    evals = make_scene_records(args.n_eval, size=args.image_size,
                               seed=2, min_scale=2.0, max_scale=4.5)
    gw_calib = [sorted(set(r["text"])) for r in calib]
    gw_eval = [sorted(set(r["text"])) for r in evals]

    logs = {}
    for tag in ("calib", "eval"):
        path = os.path.join(args.probe_dir, f"{tag}_spot_log.npz")
        if not os.path.exists(path):
            raise SystemExit(f"{path} missing — run quality_probe_ocr.py "
                             f"--eval_only first (r5+ dumps the logs)")
        logs[tag] = np.load(path)

    grid = list(itertools.product(
        (0.05, 0.1, 0.15, 0.2, 0.25, 0.3),        # keep threshold
        (0.15, 0.25, 0.35, 0.5, 0.65),            # vote_frac
        (3, 4, 5, None),                          # vote_topk
        ("count", "score"),                       # weighting
    ))
    rows = []
    for th, vf, tk, wt in grid:
        f1_c, _ = replay_vote(logs["calib"]["scores"], logs["calib"]["recs"],
                              gw_calib, WORDS, th, vf, tk, wt)
        rows.append({"th": th, "vote_frac": vf, "topk": tk, "weight": wt,
                     "calib_f1": f1_c})
    rows.sort(key=lambda r: -r["calib_f1"])
    best = rows[0]
    f1_e, beliefs = replay_vote(
        logs["eval"]["scores"], logs["eval"]["recs"], gw_eval, WORDS,
        best["th"], best["vote_frac"], best["topk"], best["weight"])
    best["eval_f1_openloop"] = f1_e
    print(f"[tune] best on calib: {best}")
    for b, gw in zip(beliefs, gw_eval):
        print(f"  gt={gw} belief={b}")
    with open(args.out, "w") as f:
        json.dump({"best": best, "top20": rows[:20]}, f, indent=1)
    print(f"[tune] wrote {args.out}")


if __name__ == "__main__":
    main()
