"""LLM-judge OCR accuracy over saved per-step prediction logs
(llm_eval_tair.py equivalent).

Input: a directory of per-image JSON files with
{"gt_words": [...], "steps": [[words at step 0], [words at step 1], ...]}
(the OCR-guided sampler's `return_ocr_log` output serialized per image).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log_dir", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--llm_path", default=None,
        help="local HF causal-LM checkpoint; default rule-based judge",
    )
    args = ap.parse_args()

    from dit4sr_tpu.eval.llm_judge import OCRJudge, rule_based_judge

    llm = rule_based_judge
    if args.llm_path:
        from transformers import AutoModelForCausalLM, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.llm_path)
        model = AutoModelForCausalLM.from_pretrained(args.llm_path)

        def llm(prompt):  # noqa: F811
            ids = tok(prompt, return_tensors="pt")
            out = model.generate(**ids, max_new_tokens=256)
            return tok.decode(out[0][ids["input_ids"].shape[1]:], skip_special_tokens=True)

    judge = OCRJudge(llm=llm)
    per_step_totals: dict = {}
    n_images = 0
    for path in sorted(glob(os.path.join(args.log_dir, "*.json"))):
        with open(path) as f:
            rec = json.load(f)
        traj = judge.score_trajectory(rec["gt_words"], rec["steps"])
        n_images += 1
        for step, scores in enumerate(traj):
            agg = per_step_totals.setdefault(step, {"correct": 0.0, "partial": 0.0, "incorrect": 0.0})
            for k in agg:
                agg[k] += scores[k]

    table = {
        step: {k: v / max(1, n_images) for k, v in agg.items()}
        for step, agg in per_step_totals.items()
    }
    out = json.dumps(table, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
