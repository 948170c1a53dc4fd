"""Precompute LQ-image captions with a VLM (read_lq_vlm_{llava,qwen}.py
equivalent): one caption .txt per image id."""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--model_path", default=None, help="local HF VLM checkpoint")
    ap.add_argument("--batch_size", type=int, default=4)
    args = ap.parse_args()

    import cv2
    import numpy as np

    from dit4sr_tpu.text.vlm import CaptionAgent

    agent = CaptionAgent(model_path=args.model_path)
    os.makedirs(args.out_dir, exist_ok=True)
    paths = sorted(glob(os.path.join(args.img_dir, "*.jpg")))
    for i in range(0, len(paths), args.batch_size):
        chunk = paths[i : i + args.batch_size]
        imgs = [
            cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32) / 255
            for p in chunk
        ]
        for p, caption in zip(chunk, agent.caption(imgs)):
            img_id = os.path.splitext(os.path.basename(p))[0]
            with open(os.path.join(args.out_dir, f"{img_id}.txt"), "w") as f:
                f.write(caption + "\n")
    print(f"wrote {len(paths)} captions to {args.out_dir}")


if __name__ == "__main__":
    main()
