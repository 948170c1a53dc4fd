"""Tiled-VAE seam validation with TRAINED weights at production tile sizes.

Closes the round-2 gap "seam quality is validated with real weights at
production tile sizes — which never happened": using the quality probe's
trained /4 VAE (artifacts/quality_probe_ocr/vae.pkl), decode a real encoded
latent of a large text scene three ways —

  * untiled (the reference answer; global mid-block attention included),
  * tiled, independent per-tile GroupNorm stats (the reference's vaehook
    fast path),
  * tiled with cross-tile GN statistic aggregation (gn_sync=True, the
    utils/vaehook.py:458-534 GroupNormParam equivalent),

at the production latent tile size (64 latent units — what a /8 SD3 VAE
uses for 512 px tiles). Reports full-image PSNR vs the untiled decode plus
a seam-band metric (mean/max abs error inside 8 px bands centred on every
tile boundary — where blending artifacts live), and writes
artifacts/tiled_vae_validation.json.

Usage: python tools/validate_tiled_vae.py [--size 512] [--tile 64]
       [--vae artifacts/quality_probe_ocr/vae.pkl] [--cpu]
"""
import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

parser = argparse.ArgumentParser()
parser.add_argument("--vae", default="artifacts/quality_probe_ocr/vae.pkl")
parser.add_argument("--size", type=int, default=512, help="image px (untiled reference)")
parser.add_argument("--tile", type=int, default=64, help="latent tile (64 = production)")
parser.add_argument("--overlap", type=int, default=16)
parser.add_argument("--out", default="artifacts/tiled_vae_validation.json")
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import VAEConfig
from dit4sr_tpu.data.textscenes import make_scene_records
from dit4sr_tpu.eval.metrics import psnr
from dit4sr_tpu.models.vae import AutoencoderKL
from dit4sr_tpu.utils.tiling import tiled_vae_decode, tiled_vae_encode

with open(args.vae, "rb") as f:
    saved = pickle.load(f)
vae_cfg = VAEConfig(
    latent_channels=8, block_out_channels=(64, 128, 128), layers_per_block=1,
    norm_num_groups=16, sample_size=args.size, dtype=jnp.float32,
    scaling_factor=saved["scaling"], shift_factor=saved["shift"],
)
vae = AutoencoderKL(vae_cfg)
params = saved["params"]
f = 2 ** (len(vae_cfg.block_out_channels) - 1)      # /4 spatial factor
lat = args.size // f

print(f"[tiled-vae] scene {args.size}px -> latent {lat}x{lat}, "
      f"tile {args.tile} (+{args.overlap} overlap)")
rec = make_scene_records(1, size=args.size, seed=77, min_scale=2.0, max_scale=6.0)[0]
img = jnp.asarray(rec["image"][None])

# a REAL latent (tiled+synced encode; the test is about decode parity)
z = tiled_vae_encode(vae, params, img, vae_cfg, tile=args.tile * f,
                     overlap=args.overlap * f, gn_sync=True)
print(f"[tiled-vae] latent ready {z.shape}; decoding untiled reference...")
ref = np.asarray(tiled_vae_decode(vae, params, z, vae_cfg, tile=lat, overlap=0))
plain = np.asarray(tiled_vae_decode(vae, params, z, vae_cfg,
                                    tile=args.tile, overlap=args.overlap))
synced = np.asarray(tiled_vae_decode(vae, params, z, vae_cfg, tile=args.tile,
                                     overlap=args.overlap, gn_sync=True))

# seam bands: 8px around every interior tile boundary (stride = tile-overlap)
stride_px = (args.tile - args.overlap) * f
band = np.zeros(args.size, bool)
for edge in range(stride_px, args.size, stride_px):
    band[max(0, edge - 4): edge + 4] = True
mask = np.zeros((args.size, args.size), bool)
mask[band, :] = True
mask[:, band] = True


def report(x):
    d = np.abs(x - ref)
    return {
        "psnr_vs_untiled": float(psnr(jnp.asarray(x), jnp.asarray(ref))[0]),
        "max_abs": float(d.max()),
        "seam_mean_abs": float(d[0][mask].mean()),
        "seam_max_abs": float(d[0][mask].max()),
        "interior_mean_abs": float(d[0][~mask].mean()),
    }


result = {
    "config": {"size": args.size, "tile": args.tile, "overlap": args.overlap,
               "vae": args.vae, "latent": lat},
    "recon_psnr_untiled_vs_gt": float(psnr(jnp.asarray(ref), img)[0]),
    "plain": report(plain),
    "gn_sync": report(synced),
}
result["pass"] = bool(
    result["gn_sync"]["psnr_vs_untiled"] > result["plain"]["psnr_vs_untiled"]
    and result["gn_sync"]["psnr_vs_untiled"] >= 35.0
)
os.makedirs(os.path.dirname(args.out), exist_ok=True)
with open(args.out, "w") as fo:
    json.dump(result, fo, indent=1)
print(json.dumps(result, indent=1))
print(f"[tiled-vae] {'PASS' if result['pass'] else 'FAIL'} -> {args.out}")
